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


def box_iou(hyps: np.ndarray, refs: np.ndarray) -> np.ndarray:
    """Per-pair IoU between xyxy boxes; 0 where there is no overlap."""
    lt = np.maximum(hyps[:, :2], refs[:, :2])
    rb = np.minimum(hyps[:, 2:], refs[:, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    a1 = (hyps[:, 2] - hyps[:, 0]) * (hyps[:, 3] - hyps[:, 1])
    a2 = (refs[:, 2] - refs[:, 0]) * (refs[:, 3] - refs[:, 1])
    return (inter / (a1 + a2 - inter + 1e-6)).astype(np.float32)


def box_iou_accuracy(hyps: np.ndarray, refs: np.ndarray, thresh: float = 0.5) -> np.ndarray:
    """Acc@thresh per box pair (ref: _calculate_ap_score)."""
    return (box_iou(hyps, refs) >= thresh).astype(np.float32)


def pairwise_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix [Na, Nb] between xyxy box sets."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    ab = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / (aa[:, None] + ab[None, :] - inter + 1e-6)


def match_detections(
    pred_boxes: np.ndarray,  # [Np, 4] xyxy
    pred_labels: List[str],
    gt_boxes: np.ndarray,  # [Ng, 4] xyxy
    gt_labels: List[str],
    thresh: float = 0.5,
) -> Tuple[int, int, int]:
    """Greedy IoU matching with label agreement → (tp, n_pred, n_gt).

    The reference's detection task never evaluates (its dataset __getitem__
    falls through without a return, ref detection_dataset.py:418-420); this
    is the minimal honest metric for the fixed-quirk trainable task: each
    prediction may claim at most one ground-truth box of the same label with
    IoU ≥ thresh, matched greedily in decode order.
    """
    iou = pairwise_iou(np.asarray(pred_boxes, np.float64).reshape(-1, 4),
                       np.asarray(gt_boxes, np.float64).reshape(-1, 4))
    used = np.zeros(len(gt_labels), bool)
    tp = 0
    for i, pl in enumerate(pred_labels):
        cand = [
            j for j in range(len(gt_labels))
            if not used[j] and gt_labels[j] == pl and iou[i, j] >= thresh
        ]
        if cand:
            j = max(cand, key=lambda j: iou[i, j])
            used[j] = True
            tp += 1
    return tp, len(pred_labels), len(gt_labels)


# ---------------------------------------------------------------------------
# allcand candidate scoring (ref: tasks/mm_tasks/vqa_gen.py:244-310,
# snli_ve.py:165-228, image_classify.py:104-265)
# ---------------------------------------------------------------------------

def _score_chunk(params, cfg, enc_tiled, prev, target, masks):
    B_C, T = prev.shape
    logits = ofa.decode(params, cfg, prev, enc_tiled).astype(jnp.float32)
    if masks is not None:
        logits = jnp.where(masks, logits, -1e9)
    lprobs = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
    keep = target != cfg.pad
    return jnp.sum(jnp.where(keep, tok_lp, 0.0), axis=-1)


def score_candidates(
    params,
    cfg: ModelConfig,
    encoder_out: ofa.EncoderOut,  # [B, ...]
    cand_prev: jnp.ndarray,  # [B, C, T] decoder inputs (prompt + candidate)
    cand_target: jnp.ndarray,  # [B, C, T] targets, pad except candidate span
    cand_masks: Optional[jnp.ndarray] = None,  # [B, C, T, V] constraint masks
    chunk_size: Optional[int] = None,  # candidates scored per decoder pass
) -> jnp.ndarray:
    """Teacher-forced log-prob score of every candidate → [B, C].

    The reference's "allcand" closed-vocabulary scoring: encode once, tile the
    encoder output over candidates, batched decoder passes, sum constrained
    lprobs over the candidate span (ref: vqa_gen.py:244-310 with
    valid_batch_size=20 chunks). ``chunk_size`` bounds the [B·chunk, T, V]
    logits materialization for large answer sets (3129 VQA answers).
    """
    B, C, T = cand_prev.shape
    if chunk_size is None or chunk_size >= C:
        enc_tiled = tile_encoder_out(encoder_out, C)
        masks = cand_masks.reshape(B * C, T, -1) if cand_masks is not None else None
        scores = _score_chunk(
            params, cfg, enc_tiled, cand_prev.reshape(B * C, T),
            cand_target.reshape(B * C, T), masks,
        )
        return scores.reshape(B, C)

    # pad C to a chunk multiple; padded candidates get -inf
    n_chunks = -(-C // chunk_size)
    Cp = n_chunks * chunk_size
    padn = Cp - C
    prev = jnp.pad(cand_prev, ((0, 0), (0, padn), (0, 0)), constant_values=cfg.pad)
    target = jnp.pad(cand_target, ((0, 0), (0, padn), (0, 0)), constant_values=cfg.pad)
    masks = (
        jnp.pad(cand_masks, ((0, 0), (0, padn), (0, 0), (0, 0)), constant_values=True)
        if cand_masks is not None
        else None
    )
    # pinned: lax.map closes over the tiled encoder state, and XLA's
    # constant-sinking would otherwise re-tile it inside every chunk
    # iteration (same pathology as the beam-search decode loop)
    enc_tiled = jax.lax.optimization_barrier(
        tile_encoder_out(encoder_out, chunk_size)
    )

    # [n_chunks, B*chunk, T]
    def to_chunks(a):
        return (
            a.reshape(B, n_chunks, chunk_size, *a.shape[2:])
            .swapaxes(0, 1)
            .reshape(n_chunks, B * chunk_size, *a.shape[2:])
        )

    prev_c, target_c = to_chunks(prev), to_chunks(target)
    if masks is not None:
        masks_c = to_chunks(masks)
        xs = (prev_c, target_c, masks_c)
        body = lambda x: _score_chunk(params, cfg, enc_tiled, x[0], x[1], x[2])
    else:
        xs = (prev_c, target_c)
        body = lambda x: _score_chunk(params, cfg, enc_tiled, x[0], x[1], None)
    scores = jax.lax.map(body, xs)  # [n_chunks, B*chunk]
    scores = (
        scores.reshape(n_chunks, B, chunk_size).swapaxes(0, 1).reshape(B, Cp)
    )
    return jnp.where(jnp.arange(C)[None, :] < C, scores[:, :C], -jnp.inf)


def score_candidates_span(
    params,
    cfg: ModelConfig,
    encoder_out: ofa.EncoderOut,  # [B, ...]
    cand_prev: jnp.ndarray,  # [B, C, T] prompt + candidate decoder inputs
    ans_pos: jnp.ndarray,  # [B, Tc] target positions of the answer span
    ans_target: jnp.ndarray,  # [C, Tc] answer tokens + eos, pad-padded
    ans_masks: Optional[jnp.ndarray] = None,  # [C, Tc, V] constraint masks
    trie=None,  # DenseTrie: build masks ON DEVICE from ans_nodes
    ans_nodes: Optional[jnp.ndarray] = None,  # [C, Tc] trie cursors
) -> jnp.ndarray:
    """Memory-bounded allcand scoring: logits are sliced to the answer span
    before masking/softmax, so the [*, T, V] full-sequence lprobs (the
    reference's repeat_interleave blowup, vqa_gen.py:286-295) never
    materialize. Masks depend only on (candidate, span position) — one
    [C, Tc, V] table shared across the batch; with ``trie``+``ans_nodes``
    that table is gathered on device inside the jitted program (a transient
    [C, Tc, V] bool, freed after the where) instead of being materialized
    and cached on the host (the reference-scale VQA set costs ~1 GB host RAM
    that way). → scores [B, C].
    """
    B, C, T = cand_prev.shape
    Tc = ans_pos.shape[1]
    enc_tiled = tile_encoder_out(encoder_out, C)
    feats = ofa.decode(
        params, cfg, cand_prev.reshape(B * C, T), enc_tiled, features_only=True
    )  # [B*C, T, d]
    span_idx = jnp.repeat(ans_pos, C, axis=0)  # [B*C, Tc]
    feats_span = jnp.take_along_axis(feats, span_idx[..., None], axis=1)
    logits = ofa.output_layer(params, cfg, feats_span).astype(jnp.float32)
    logits = logits.reshape(B, C, Tc, -1)
    if trie is not None and ans_nodes is not None:
        V = logits.shape[-1]
        ans_masks = trie.allowed_mask(ans_nodes.reshape(-1), V).reshape(
            C, Tc, V
        )
    if ans_masks is not None:
        logits = jnp.where(ans_masks[None], logits, -1e9)
    lprobs = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(
        lprobs, jnp.broadcast_to(ans_target[None, :, :, None], (B, C, Tc, 1)), axis=-1
    )[..., 0]
    keep = ans_target != cfg.pad
    return jnp.sum(jnp.where(keep[None], tok_lp, 0.0), axis=-1)


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
            # host-side numpy trie walk (per-candidate device dispatches
            # here dominated batch-build time; see DenseTrie.allowed_mask_np)
            node = 0
            for i in range(Tp - 1, min(len(tgt), T)):
                masks[c, i] = trie.allowed_mask_np(node)
                node = trie.transition_np(node, int(tgt[i]))
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
