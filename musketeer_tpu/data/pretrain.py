"""OFA pretraining mixture builders (ref: data/pretrain_data/unify_dataset.py).

The reference's UnifyDataset mixes 4 example types: image-text pairs, pure
text with BART-style span infilling, pure-image code prediction, and grounded
detection (ref :110-637; masking :488-594). Musketeer itself never pretrains
(the dataset is only imported by detection_task.py:12), so this module covers
the capability surface: whole-word span masking with Poisson span lengths and
the image-text pair builder.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .task_data import BuilderBase, Example
from .transforms import decode_base64_image, patch_resize


class TextInfillingBuilder(BuilderBase):
    """Pure-text span infilling (BART-style whole-word masking).

    Source = text with whole-word spans replaced by <mask>; target = original.
    Span lengths ~ Poisson(lambda); total masked fraction ≈ mask_ratio
    (ref: unify_dataset.py:488-594).
    """

    task = "text_infilling"

    def __init__(self, *a, mask_ratio: float = 0.3, poisson_lambda: float = 3.0,
                 seed: int = 0, **kw):
        super().__init__(*a, **kw)
        self.mask_ratio = mask_ratio
        self.poisson_lambda = poisson_lambda
        self.rng = np.random.RandomState(seed)

    def _mask_words(self, words: List[str]) -> List[str]:
        n = len(words)
        n_mask = max(1, int(round(n * self.mask_ratio)))
        masked = words[:]
        budget = n_mask
        guard = 0
        while budget > 0 and guard < 100:
            guard += 1
            span = max(1, int(self.rng.poisson(self.poisson_lambda)))
            span = min(span, budget)
            start = int(self.rng.randint(0, n))
            if masked[start] == "<mask>":
                continue
            for i in range(start, min(start + span, n)):
                if masked[i] != "<mask>":
                    masked[i] = "<mask>"
                    budget -= 1
        # collapse adjacent masks into one token (span infilling)
        out: List[str] = []
        for w in masked:
            if w == "<mask>" and out and out[-1] == "<mask>":
                continue
            out.append(w)
        return out

    def __call__(self, row: Sequence[str]) -> Example:
        text = row[0].strip().lower()
        words = text.split()
        if len(words) > self.max_tgt_length:
            words = words[: self.max_tgt_length]
            text = " ".join(words)
        masked_words = self._mask_words(words)
        # encode word-by-word so <mask> maps to the dictionary symbol
        src_ids: List[int] = []
        for w in masked_words:
            if w == "<mask>":
                src_ids.append(self.vocab.mask_index)
            else:
                src_ids.extend(self.enc(f" {w}"))
        src_prompt = self.enc(' what is the complete text of " ')
        src_suffix = self.enc(' "?')
        src = self.wrap_src(
            np.concatenate([src_prompt, np.asarray(src_ids, np.int32), src_suffix])
        )
        tgt = self.enc(f" {text}")
        target, prev = self.seq2seq_targets(tgt)
        return Example(
            id=text[:24], src_ids=src, target_ids=target, prev_ids=prev,
        )


class ImageTextPairBuilder(BuilderBase):
    """Image-text pair pretraining example (caption-style)."""

    task = "image_text_pair"

    def __call__(self, row: Sequence[str]) -> Example:
        uniq_id, image_b64, caption = row[0], row[1], row[2]
        patch = patch_resize(
            decode_base64_image(image_b64), self.patch_image_size, self.imagenet_stats
        )
        src = self.wrap_src(self.enc(" what does the image describe?"))
        tgt = self.enc(f" {caption.strip()}", length=self.max_tgt_length)
        target, prev = self.seq2seq_targets(tgt)
        return Example(
            id=uniq_id, src_ids=src, target_ids=target, prev_ids=prev,
            patch_image=patch, patch_mask=True,
        )
