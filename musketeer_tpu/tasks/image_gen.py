"""Text-to-image generation task (ref: tasks/mm_tasks/image_gen.py:137-371).

Pipeline: TEP/base prompt → constrained code-token generation (gen_code mode,
vocab band = <code_k> region, decoder image positions) → VQGAN decode_code →
CLIP text-image ranking → best-of-N images.

CLIP and VQGAN weights are user-supplied (zero-egress image); without them the
task still generates/evaluates code sequences (token-level metrics only).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig
from ..data import task_data as D
from ..generation import beam_search
from ..models import ofa
from .base import Task, iter_batches


class ImageGenTask(Task):
    name = "image_gen"

    def __init__(
        self, *a,
        clip_params=None, clip_cfg=None,
        vqgan_params=None, vqgan_cfg=None,
        sampling_times: int = 1,
        code_image_size: int = 256,
        **kw,
    ):
        super().__init__(*a, **kw)
        self.clip_params, self.clip_cfg = clip_params, clip_cfg
        self.vqgan_params, self.vqgan_cfg = vqgan_params, vqgan_cfg
        self.sampling_times = sampling_times
        self.code_image_size = code_image_size

    def builder(self, split: str = "train"):
        return D.ImageGenBuilder(
            self.vocab, description=self.description, split=split, **self.kw
        )

    def generation_config(self) -> GenerationConfig:
        v = self.vocab
        grid = self.code_image_size // 16  # 16x16 codes per 256² image (f=16)
        n_codes = grid * grid
        return GenerationConfig(
            # sampling_times > 1 (SCST / best-of-K ranking) controls the
            # number of sampled chains; plain eval keeps beam 5
            beam_size=self.sampling_times if self.sampling_times > 1 else 5,
            max_len_b=n_codes,
            min_len=n_codes,
            gen_code=True,
            constraint_range=(v.code_start, v.code_start + v.code_dict_size),
            sampling=self.sampling_times > 1,
        )

    def generate_codes(self, params, model_cfg, src_tokens, rng=None):
        """→ code indices [B, K, grid, grid] (vocab ids shifted to 0-base)."""
        gen_cfg = self.generation_config()
        v = self.vocab
        grid = self.code_image_size // 16
        n = grid * grid

        enc = ofa.encode(params, model_cfg, src_tokens)
        toks, scores = beam_search(
            params, model_cfg, gen_cfg, enc, max_len=n,
            code_masks_value=True, rng=rng,
        )
        codes = jnp.clip(toks[:, :, :n] - v.code_start, 0, v.code_dict_size - 1)
        B, K = codes.shape[:2]
        return codes.reshape(B, K, grid, grid), scores

    def decode_images(self, codes: jnp.ndarray) -> Optional[np.ndarray]:
        """[N, grid, grid] codes → uint8 images, if VQGAN weights present."""
        if self.vqgan_params is None:
            return None
        from ..models.vqgan import codes_to_images_uint8

        return np.asarray(
            codes_to_images_uint8(self.vqgan_params, self.vqgan_cfg, codes)
        )

    def clip_rank(self, images_uint8: np.ndarray, captions: List[str]) -> np.ndarray:
        """CLIP ti_sim of each image vs its caption (ref: image_gen.py:262-291)."""
        if self.clip_params is None:
            return np.zeros((len(images_uint8),), np.float32)
        from ..models.clip import (
            CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, clip_scores, encode_image, encode_text,
        )
        from .clip_tokenizer import tokenize as clip_tokenize

        res = self.clip_cfg.image_resolution
        imgs = jax.image.resize(
            jnp.asarray(images_uint8, jnp.float32) / 255.0,
            (len(images_uint8), res, res, 3), method="bilinear",
        )
        imgs = (imgs - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        toks = jnp.asarray(clip_tokenize(captions, self.clip_cfg.context_length))
        ie = encode_image(self.clip_params, self.clip_cfg, imgs)
        te = encode_text(self.clip_params, self.clip_cfg, toks)
        ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
        te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
        return np.asarray(jnp.sum(ie * te, axis=-1))

    def evaluate(
        self, params, model_cfg, dataset, batch_size=2, limit=None,
        dump_dir: Optional[str] = None, rng=None,
    ) -> Dict[str, float]:
        v = self.vocab
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        sims: List[float] = []
        token_acc: List[float] = []
        n = 0
        for batch in iter_batches(
            dataset, self.builder("valid"), batch_size, v.pad, limit=limit, drop_last=True
        ):
            src = jnp.asarray(batch["src_tokens"])
            codes, scores = self.generate_codes(params, model_cfg, src, rng=rng)
            best = np.asarray(codes[:, 0])  # [B, grid, grid]
            # token-level accuracy vs reference codes (always computable)
            tgt = np.asarray(batch["target"])[:, : best.shape[1] * best.shape[2]]
            tgt_codes = np.clip(tgt - v.code_start, 0, v.code_dict_size - 1)
            acc = (best.reshape(len(best), -1) == tgt_codes).mean(axis=1)
            token_acc.extend(acc.tolist())
            imgs = self.decode_images(jnp.asarray(best))
            if imgs is not None:
                caps = [e["caption"] for e in batch["extras"]]
                sims.extend(self.clip_rank(imgs, caps).tolist())
                if dump_dir:
                    from PIL import Image

                    os.makedirs(dump_dir, exist_ok=True)
                    for i, uid in enumerate(batch["id"]):
                        Image.fromarray(imgs[i]).save(
                            os.path.join(dump_dir, f"{uid}.png")
                        )
            n += len(best)
        out = {"code_token_acc": float(np.mean(token_acc)) if token_acc else 0.0, "n": n}
        if sims:
            out["ti_sim"] = float(np.mean(sims))
        return out
