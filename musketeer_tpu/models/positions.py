"""Relative-position bucket tables for the OFA unified transformer.

Numpy reimplementations of the reference's bucket constructions
(ref: models/ofa/unify_transformer.py:53-81) plus the decoder's image
position index buffer (ref: unify_transformer.py:1211-1216). These are
static model constants — computed once at model build, closed over by the
jitted forward (XLA constant-folds the gathers' index operands).
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=None)
def make_token_bucket_position(bucket_size: int, max_position: int = 1024) -> np.ndarray:
    """[max_position, max_position] int32 bucket ids for 1D text rel-pos.

    Near-field (|Δ|<mid) positions get exact buckets; far field is
    log-spaced. Matches unify_transformer.py:53-63 bit-for-bit.
    """
    context_pos = np.arange(max_position, dtype=np.int64)[:, None]
    memory_pos = np.arange(max_position, dtype=np.int64)[None, :]
    relative_pos = context_pos - memory_pos
    sign = np.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = np.where(
        (relative_pos < mid) & (relative_pos > -mid), mid - 1, np.abs(relative_pos)
    )
    log_pos = (
        np.ceil(
            np.log(abs_pos / mid) / math.log((max_position - 1) / mid) * (mid - 1)
        )
        + mid
    )
    log_pos = log_pos.astype(np.int64)
    bucket_pos = np.where(abs_pos <= mid, relative_pos, log_pos * sign)
    return (bucket_pos + bucket_size - 1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def make_image_bucket_position(bucket_size: int, num_relative_distance: int) -> np.ndarray:
    """[bucket²+1, bucket²+1] int32 bucket ids for 2D image rel-pos.

    Index 0 is the (unused-by-encoder) cls slot with 3 dedicated buckets.
    Matches unify_transformer.py:66-81.
    """
    coords_h = np.arange(bucket_size)
    coords_w = np.arange(bucket_size)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # 2,H,W
    coords_flatten = coords.reshape(2, -1)  # 2, H*W
    relative = coords_flatten[:, :, None] - coords_flatten[:, None, :]  # 2,N,N
    relative = relative.transpose(1, 2, 0).astype(np.int64)  # N,N,2
    relative[:, :, 0] += bucket_size - 1
    relative[:, :, 1] += bucket_size - 1
    relative[:, :, 0] *= 2 * bucket_size - 1
    n = bucket_size * bucket_size + 1
    table = np.zeros((n, n), dtype=np.int64)
    table[1:, 1:] = relative.sum(-1)
    table[0, 0:] = num_relative_distance - 3
    table[0:, 0] = num_relative_distance - 2
    table[0, 0] = num_relative_distance - 1
    return table.astype(np.int32)


def encoder_image_position_ids(h: int, w: int, image_bucket_size: int) -> np.ndarray:
    """[h*w] position ids into embed_image_positions for an h×w patch grid.

    ref: unify_transformer.py:665-668 — row-major grid offset by +1
    (0 is reserved for the cls bucket slot).
    """
    idx = (
        np.arange(w, dtype=np.int32)[None, :]
        + np.arange(h, dtype=np.int32)[:, None] * image_bucket_size
        + 1
    )
    return idx.reshape(-1)


@functools.lru_cache(maxsize=None)
def decoder_image_position_idx(
    code_image_size: int, image_bucket_size: int, max_target_positions: int = 1024
) -> np.ndarray:
    """Decoder target-side image position ids (ref: unify_transformer.py:1211-1216).

    [0] (bos) + window_size² grid ids + padding with id 1024 out to 1026 total.
    """
    window = code_image_size // 8
    grid = (
        np.arange(window, dtype=np.int64)[None, :].repeat(window, 0)
        + np.arange(window, dtype=np.int64)[:, None] * image_bucket_size
        + 1
    )
    idx = np.concatenate([[0], grid.reshape(-1), [1024] * 769])
    return idx.astype(np.int32)
