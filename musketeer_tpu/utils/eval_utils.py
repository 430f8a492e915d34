"""Per-task evaluation primitives.

TPU-native counterparts of the reference's eval dispatch helpers
(ref: utils/eval_utils.py:129-460). Numeric pieces (de-binning, IoU, allcand
scoring) are jittable; string-level scoring (CIDEr, accuracy maps) is host-side.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..generation import tile_encoder_out
from ..models import ofa


# ---------------------------------------------------------------------------
# refcoco / grounding (ref: utils/eval_utils.py:220-253)
# ---------------------------------------------------------------------------

def debin_boxes(
    bin_tokens: np.ndarray,  # [B, 4] vocab ids of <bin_k> tokens
    bin_start: int,
    num_bins: int,
    max_image_size: int,
    w_ratios: np.ndarray,  # [B]
    h_ratios: np.ndarray,  # [B]
) -> np.ndarray:
    """<bin> tokens → original-image pixel boxes [B, 4]."""
    bins = bin_tokens.astype(np.float64) - bin_start
    coords = bins / (num_bins - 1) * max_image_size
    coords[:, 0::2] /= w_ratios[:, None]
    coords[:, 1::2] /= h_ratios[:, None]
    return coords


def box_iou_accuracy(hyps: np.ndarray, refs: np.ndarray, thresh: float = 0.5) -> np.ndarray:
    """Acc@thresh per box pair (ref: _calculate_ap_score)."""
    lt = np.maximum(hyps[:, :2], refs[:, :2])
    rb = np.minimum(hyps[:, 2:], refs[:, 2:])
    wh = rb - lt
    inter = wh[:, 0] * wh[:, 1]
    a1 = (hyps[:, 2] - hyps[:, 0]) * (hyps[:, 3] - hyps[:, 1])
    a2 = (refs[:, 2] - refs[:, 0]) * (refs[:, 3] - refs[:, 1])
    iou = inter / (a1 + a2 - inter + 1e-6)
    return ((iou >= thresh) & (wh[:, 0] > 0) & (wh[:, 1] > 0)).astype(np.float32)


# ---------------------------------------------------------------------------
# allcand candidate scoring (ref: tasks/mm_tasks/vqa_gen.py:244-310,
# snli_ve.py:165-228, image_classify.py:104-265)
# ---------------------------------------------------------------------------

def score_candidates(
    params,
    cfg: ModelConfig,
    encoder_out: ofa.EncoderOut,  # [B, ...]
    cand_prev: jnp.ndarray,  # [B, C, T] decoder inputs (prompt + candidate)
    cand_target: jnp.ndarray,  # [B, C, T] targets, pad except candidate span
    cand_masks: Optional[jnp.ndarray] = None,  # [B, C, T, V] constraint masks
) -> jnp.ndarray:
    """Teacher-forced log-prob score of every candidate → [B, C].

    The reference's "allcand" closed-vocabulary scoring: encode once, tile the
    encoder output over candidates, one batched decoder pass, sum constrained
    lprobs over the candidate span. Mean-per-token scoring (the reference
    divides by span length via masked mean — vqa_gen.py:304-309 uses sum; the
    final argmax is over sums) — we return sums.
    """
    B, C, T = cand_prev.shape
    enc_tiled = tile_encoder_out(encoder_out, C)
    prev = cand_prev.reshape(B * C, T)
    logits = ofa.decode(params, cfg, prev, enc_tiled)  # [B*C, T, V]
    logits = logits.astype(jnp.float32)
    if cand_masks is not None:
        logits = jnp.where(cand_masks.reshape(B * C, T, -1), logits, -1e9)
    lprobs = jax.nn.log_softmax(logits, axis=-1)
    tgt = cand_target.reshape(B * C, T)
    tok_lp = jnp.take_along_axis(lprobs, tgt[..., None], axis=-1)[..., 0]
    keep = tgt != cfg.pad
    scores = jnp.sum(jnp.where(keep, tok_lp, 0.0), axis=-1)
    return scores.reshape(B, C)


def build_candidate_arrays(
    vocab,
    answers: List[str],
    prompt_prev: np.ndarray,  # [Tp] decoder prompt (e.g. src[:-1]) for ONE sample
    pad_to: Optional[int] = None,
    trie=None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Host-side construction of (prev [C,T], target [C,T], masks [C,T,V])."""
    encs = [vocab.encode_text(" " + a.strip()) for a in answers]
    Tp = len(prompt_prev)
    T = pad_to or (Tp + max(len(e) for e in encs) + 1)
    C = len(answers)
    prev = np.full((C, T), vocab.pad, np.int32)
    target = np.full((C, T), vocab.pad, np.int32)
    masks = None
    if trie is not None:
        masks = np.zeros((C, T, vocab.padded_size), bool)
    for c, e in enumerate(encs):
        seq = np.concatenate([prompt_prev, e]).astype(np.int32)
        prev[c, : len(seq)] = seq[:T]
        tgt = np.concatenate([seq[1:], [vocab.eos]]).astype(np.int32)
        tgt[: Tp - 1] = vocab.pad  # supervise only the answer span
        target[c, : len(tgt)] = tgt[:T]
        if trie is not None:
            import jax.numpy as _jnp

            node = np.asarray([0], np.int32)
            for i in range(Tp - 1, min(len(tgt), T)):
                masks[c, i] = np.asarray(
                    trie.allowed_mask(_jnp.asarray(node), vocab.padded_size)
                )[0]
                node = np.asarray(
                    trie.transition(_jnp.asarray(node), _jnp.asarray([tgt[i]], _jnp.int32))
                )
    return prev, target, masks


# ---------------------------------------------------------------------------
# result aggregation across hosts (ref: eval_utils.py:433-460 all_gather_object)
# ---------------------------------------------------------------------------

def merge_results(local_results: List[dict]) -> List[dict]:
    """Gather per-host result lists. Single-controller JAX: with one process
    this is the identity; multi-host uses process_allgather."""
    if jax.process_count() == 1:
        return local_results
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local_results)
    out: List[dict] = []
    for part in gathered:
        out.extend(part)
    return out
