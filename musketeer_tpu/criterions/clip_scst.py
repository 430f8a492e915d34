"""CLIP-SCST: policy gradient for image generation with CLIP reward.

ref: criterions/clip_scst_loss.py:1-277 — sample code sequences, decode with
the frozen VQGAN, score text↔image similarity with frozen CLIP, leave-one-out
baseline, policy-gradient step. The jitted policy-gradient core is shared
with :mod:`musketeer_tpu.criterions.scst` (scst_loss).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .scst import scst_loss  # same PG loss core


def clip_rewards(
    images_uint8: np.ndarray,  # [B*K, H, W, 3]
    captions: List[str],  # [B]
    K: int,
    clip_params,
    clip_cfg,
) -> np.ndarray:
    """ti_sim reward per sampled image, leave-one-out baseline → [B, K]."""
    from ..models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, encode_image, encode_text
    from ..tasks.clip_tokenizer import tokenize

    B = len(captions)
    res = clip_cfg.image_resolution
    imgs = jax.image.resize(
        jnp.asarray(images_uint8, jnp.float32) / 255.0,
        (B * K, res, res, 3), method="bilinear",
    )
    imgs = (imgs - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    toks = jnp.asarray(tokenize(captions, clip_cfg.context_length))
    ie = encode_image(clip_params, clip_cfg, imgs).reshape(B, K, -1)
    te = encode_text(clip_params, clip_cfg, toks)[:, None]
    ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    rewards = np.asarray(jnp.sum(ie * te, axis=-1), np.float32)  # [B, K]
    if K > 1:
        total = rewards.sum(axis=1, keepdims=True)
        baseline = (total - rewards) / (K - 1)
    else:
        baseline = np.zeros_like(rewards)
    return rewards - baseline


def clip_scst_train_step(
    state,
    vocab,
    image_gen_task,  # tasks.image_gen.ImageGenTask with clip+vqgan params
    grad_step_fn,  # from scst.make_scst_fns-style closure over code decode
    batch: Dict,
    model_cfg,
    rng: jax.Array,
):
    """One CLIP-SCST update on an image-gen batch."""
    src = jnp.asarray(batch["src_tokens"])
    codes, _ = image_gen_task.generate_codes(state.params, model_cfg, src, rng=rng)
    B, K, gh, gw = codes.shape
    imgs = image_gen_task.decode_images(codes.reshape(B * K, gh, gw))
    assert imgs is not None, "CLIP-SCST needs VQGAN weights"
    caps = [e["caption"] for e in batch["extras"]]
    adv = clip_rewards(
        imgs, caps, K, image_gen_task.clip_params, image_gen_task.clip_cfg
    )

    v = vocab
    n = gh * gw
    toks = np.asarray(codes.reshape(B, K, n)) + v.code_start
    T = n + 1
    prev = np.full((B, K, T), v.pad, np.int32)
    tgt = np.full((B, K, T), v.pad, np.int32)
    prev[:, :, 0] = v.bos
    prev[:, :, 1:] = toks
    tgt[:, :, :n] = toks
    tgt[:, :, n] = v.eos
    state, metrics = grad_step_fn(
        state, src, None, None, jnp.asarray(prev), jnp.asarray(tgt), jnp.asarray(adv)
    )
    metrics["mean_clip_reward"] = float(adv.mean())
    return state, metrics
