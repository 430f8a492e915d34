"""Detection task (ref: tasks/cv_tasks/detection_task.py:1-197).

Multi-object generation: decode alternating [4×<bin>, label-tokens] groups,
de-bin to boxes. The reference's build_shared_model is a no-op passthrough
(:149-150) and its valid path only reports loss; we additionally provide a
box-decode helper for qualitative eval.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig
from ..data.detection import DetectionBuilder
from ..models import ofa
from ..utils.eval_utils import debin_boxes
from .base import Task, iter_batches


class DetectionTask(Task):
    name = "detection"

    def __init__(self, *a, max_image_size: int = 512, **kw):
        super().__init__(*a, **kw)
        self.max_image_size = max_image_size

    def builder(self, split: str = "train"):
        return DetectionBuilder(
            self.vocab, description=self.description, split=split,
            max_image_size=self.max_image_size, **self.kw
        )

    def generation_config(self) -> GenerationConfig:
        return GenerationConfig(beam_size=5, max_len_b=60, min_len=5)

    def parse_boxes(
        self, tokens: np.ndarray, w_ratio: float, h_ratio: float
    ) -> List[Tuple[np.ndarray, str]]:
        """Token sequence → [(box_xyxy, label_text)] groups."""
        v = self.vocab
        toks = [int(t) for t in tokens if t not in (v.pad, v.eos)]
        out = []
        i = 0
        while i + 4 <= len(toks):
            quad = toks[i : i + 4]
            if not all(v.bin_start <= t < v.bin_start + v.num_bins for t in quad):
                i += 1
                continue
            i += 4
            label_toks = []
            while i < len(toks) and not (
                v.bin_start <= toks[i] < v.bin_start + v.num_bins
            ):
                label_toks.append(toks[i])
                i += 1
            box = debin_boxes(
                np.asarray([quad]), v.bin_start, v.num_bins, self.max_image_size,
                np.asarray([w_ratio]), np.asarray([h_ratio]),
            )[0]
            out.append((box, v.decode_ids(label_toks)))
        return out

    def evaluate(self, params, model_cfg, dataset, batch_size=4, limit=None):
        """Teacher-forced loss as the validation signal (matching the
        reference's detection valid path) + decoded box count sanity."""
        from ..criterions import label_smoothed_ce

        v = self.vocab
        total_loss, total_tok, n = 0.0, 0.0, 0

        @jax.jit
        def loss_fn(params, src, imgs, masks, prev, tgt):
            logits = ofa.forward(params, model_cfg, src, prev, imgs, masks)
            out = label_smoothed_ce(
                logits, tgt, epsilon=0.1, pad_id=model_cfg.pad,
                vocab_size=model_cfg.vocab_size,
            )
            return out.loss, out.ntokens

        for batch in iter_batches(
            dataset, self.builder("valid"), batch_size, v.pad, limit=limit, drop_last=True
        ):
            loss, ntok = loss_fn(
                params,
                jnp.asarray(batch["src_tokens"]),
                jnp.asarray(batch["patch_images"], jnp.float32),
                jnp.asarray(batch["patch_masks"]),
                jnp.asarray(batch["prev_output_tokens"]),
                jnp.asarray(batch["target"]),
            )
            total_loss += float(loss)
            total_tok += float(ntok)
            n += batch["nsentences"]
        return {"loss": total_loss / max(1.0, total_tok), "n": n}
