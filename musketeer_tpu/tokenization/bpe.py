"""GPT-2 byte-level BPE encoder.

Standard byte-level BPE as used by GPT-2 / fairseq's ``GPT2BPE`` wrapper, which
the reference builds in OFATask.build_bpe (ref: tasks/ofa_task.py:164-182).
Assets (encoder.json / vocab.bpe) are the upstream OpenAI GPT-2 vocabulary
shipped with the reference at utils/BPE/.

Output ids here are *GPT-2 ids*; the framework dictionary
(:mod:`musketeer_tpu.tokenization.dictionary`) maps their string form to
model vocab ids, mirroring fairseq's two-stage encode.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Tuple

import regex as re

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets", "bpe")

# Contractions / word / number / punctuation split pattern from GPT-2.
_PAT = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Map bytes 0..255 to printable unicode chars (GPT-2's reversible scheme)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class GPT2BPE:
    """Byte-level BPE codec over the GPT-2 vocabulary."""

    def __init__(self, encoder_json: str | None = None, vocab_bpe: str | None = None):
        encoder_json = encoder_json or os.path.join(_ASSET_DIR, "encoder.json")
        vocab_bpe = vocab_bpe or os.path.join(_ASSET_DIR, "vocab.bpe")
        with open(encoder_json, "r", encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(vocab_bpe, "r", encoding="utf-8") as f:
            merges = f.read().split("\n")[1:-1]
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache: Dict[str, str] = {}

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word: Tuple[str, ...] = tuple(token)
        pairs = _get_pairs(word) if len(word) > 1 else set()
        if not pairs:
            return token
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Text → list of GPT-2 ids."""
        ids: List[int] = []
        for token in re.findall(_PAT, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def decode(self, ids: List[int]) -> str:
        """List of GPT-2 ids → text."""
        text = "".join(self.decoder[i] for i in ids)
        return bytearray(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace"
        )

    def is_beginning_of_word(self, token_str: str) -> bool:
        if token_str in ("<s>", "<pad>", "</s>", "<unk>", "<mask>"):
            return True
        try:
            decoded = self.decode([int(token_str)])
        except ValueError:
            return True
        return decoded.startswith(" ") or decoded.startswith("\n")
