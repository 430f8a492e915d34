"""SCST (self-critical sequence training) with CIDEr-D reward.

ref: criterions/scst_loss.py:22-223. Structure on TPU:
  1. jitted sampling generation (K chains/image, generation/beam_search
     sampling mode) — the reference runs full beam-sample inside the train
     step too (scst_loss.py:139-164),
  2. host-side CIDEr-D rewards vs references, per-image leave-one-out mean
     baseline (scst_loss.py:165-180),
  3. jitted policy-gradient step: loss = -Σ lprob(sampled) · advantage
     (scst_loss.py:22-33), teacher-forcing the sampled sequences.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig, ModelConfig
from ..generation import beam_search
from ..models import ofa
from ..utils.cider import CiderD


def scst_loss(
    logits: jnp.ndarray,  # [N, T, V] teacher-forced over sampled seqs
    targets: jnp.ndarray,  # [N, T] the sampled tokens (incl. eos)
    advantages: jnp.ndarray,  # [N] reward - baseline
    pad_id: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-Σ lprob(token) * advantage over non-pad positions → (loss, ntokens)."""
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    keep = targets != pad_id
    per_seq = jnp.sum(jnp.where(keep, tok_lp, 0.0), axis=-1)
    ntokens = jnp.sum(keep)
    loss = -jnp.sum(per_seq * advantages)
    return loss, ntokens


def compute_rewards(
    hyps: List[List[str]],  # [B][K] sampled caption strings
    refs: List[List[str]],  # [B] reference strings per image
    scorer: Optional[CiderD] = None,
) -> np.ndarray:
    """CIDEr-D per hypo minus per-image leave-one-out mean baseline → [B, K]."""
    scorer = scorer or CiderD()
    gts, res = {}, {}
    for b, (hs, rs) in enumerate(zip(hyps, refs)):
        for k, h in enumerate(hs):
            key = f"{b}_{k}"
            gts[key] = rs
            res[key] = h
    _, per = scorer.compute_score(gts, res)
    B, K = len(hyps), len(hyps[0])
    rewards = np.asarray(
        [[per[f"{b}_{k}"] for k in range(K)] for b in range(B)], np.float32
    )
    if K > 1:
        total = rewards.sum(axis=1, keepdims=True)
        baseline = (total - rewards) / (K - 1)  # leave-one-out (ref :172-177)
    else:
        baseline = np.zeros_like(rewards)
    return rewards - baseline


def make_scst_fns(
    model_cfg: ModelConfig, gen_cfg: GenerationConfig, optim_tx,
    gen_code: bool = False,
):
    """Build (sample_fn, grad_step_fn) jitted pieces for the SCST loop.

    gen_code=True switches the teacher-forced decode to image positions
    (CLIP-SCST path, criterions/clip_scst.py)."""
    assert gen_cfg.sampling, "SCST generator must sample"

    @jax.jit
    def sample_fn(params, src_tokens, patch_images, patch_masks, rng):
        enc = ofa.encode(params, model_cfg, src_tokens, patch_images, patch_masks)
        max_len = int(gen_cfg.max_len_a * src_tokens.shape[1] + gen_cfg.max_len_b)
        toks, scores = beam_search(
            params, model_cfg, gen_cfg, enc, max_len=max_len, rng=rng,
            code_masks_value=gen_code,
        )
        return toks, scores

    @jax.jit
    def grad_step_fn(state, src_tokens, patch_images, patch_masks,
                     prev_out, targets, advantages):
        def loss_fn(params):
            B, K, T = prev_out.shape
            enc = ofa.encode(params, model_cfg, src_tokens, patch_images, patch_masks)
            from ..generation.beam_search import tile_encoder_out

            enc_t = tile_encoder_out(enc, K)
            code_masks = jnp.ones((B * K,), bool) if gen_code else None
            logits = ofa.decode(
                params, model_cfg, prev_out.reshape(B * K, T), enc_t,
                code_masks=code_masks, deterministic=True,
            )
            loss, ntok = scst_loss(
                logits, targets.reshape(B * K, T),
                advantages.reshape(B * K), model_cfg.pad,
            )
            return loss / jnp.maximum(ntok, 1), ntok

        (loss, ntok), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax

        updates, new_opt = optim_tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state._replace(
            step=state.step + 1, params=new_params, opt_state=new_opt
        ), {"scst_loss": loss, "ntokens": ntok}

    return sample_fn, grad_step_fn


def scst_train_step(
    state,
    vocab,
    sample_fn,
    grad_step_fn,
    batch: Dict,  # collated caption batch (scst split: refs kept in extras)
    rng: jax.Array,
    max_len: int,
):
    """One full SCST update: sample → reward → policy-gradient step."""
    src = jnp.asarray(batch["src_tokens"])
    imgs = jnp.asarray(batch["patch_images"], jnp.float32)
    masks = jnp.asarray(batch["patch_masks"])
    toks, _ = sample_fn(state.params, src, imgs, masks, rng)
    toks_np = np.asarray(toks)  # [B, K, T]
    B, K, T = toks_np.shape

    hyps = [
        [
            vocab.decode_ids(
                [int(t) for t in toks_np[b, k] if t not in (vocab.pad, vocab.eos)]
            )
            for k in range(K)
        ]
        for b in range(B)
    ]
    refs = [
        [r.strip() for r in e["caption_refs"].split("&&")] for e in batch["extras"]
    ]
    adv = compute_rewards(hyps, refs)

    # teacher-forcing arrays from the sampled tokens
    prev = np.full((B, K, T), vocab.pad, np.int32)
    tgt = np.full((B, K, T), vocab.pad, np.int32)
    for b in range(B):
        for k in range(K):
            seq = [int(t) for t in toks_np[b, k] if t != vocab.pad]
            prev[b, k, 0] = vocab.bos
            prev[b, k, 1 : len(seq)] = seq[:-1]
            tgt[b, k, : len(seq)] = seq
    state, metrics = grad_step_fn(
        state, src, imgs, masks,
        jnp.asarray(prev), jnp.asarray(tgt), jnp.asarray(adv),
    )
    metrics["mean_reward"] = float(adv.mean())
    return state, metrics
