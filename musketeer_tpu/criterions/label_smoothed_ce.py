"""Label-smoothed cross-entropy with OFA's extensions, jit-native.

Reimplements ref: criterions/label_smoothed_cross_entropy.py:56-202 with
static shapes (mask arithmetic instead of dynamic filtering):

- per-position ``constraint_masks`` restrict both the normalization support
  (logits masked to -inf pre-softmax) and the smoothing support (eps spread
  over the allowed set only) — ref :81-99, 229-236,
- ``constraint_range`` band variant ([0..3] + [start, end)) — ref :92-96,
- ``conf`` per-sample weighting multiplies lprobs — ref :229,
- drop-worst-k positions after N updates (position-level top-k over the
  flattened batch, exactly like the reference's topk over non-pad positions;
  with R-Drop, selection is on the first copy and mirrored) — ref :100-111,
- R-Drop symmetric KL between the two batch copies — ref :74-78, 116-124.

The multi-task recursion (ref :175-202) normalizing each task's loss by its
own token count lives in :mod:`musketeer_tpu.criterions.multitask`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


class CELossOut(NamedTuple):
    loss: jnp.ndarray  # scalar (sum over kept positions, + rdrop term)
    nll_loss: jnp.ndarray  # scalar
    ntokens: jnp.ndarray  # scalar int — kept positions (= sample_size)


def label_smoothed_ce(
    logits: jnp.ndarray,  # [B, T, V] raw logits
    targets: jnp.ndarray,  # [B, T] int32
    epsilon: float,
    pad_id: int = 1,
    constraint_masks: Optional[jnp.ndarray] = None,  # [B, T, V] bool
    constraint_range: Optional[tuple] = None,  # (start, end)
    conf: Optional[jnp.ndarray] = None,  # [B] per-sample weight
    drop_worst_ratio: float = 0.0,
    drop_worst_active: Optional[jnp.ndarray] = None,  # bool scalar (update>after)
    drop_best_ratio: float = 0.0,
    drop_best_active: Optional[jnp.ndarray] = None,  # bool scalar (update>after)
    use_rdrop: bool = False,
    reg_alpha: float = 1.0,
    ignore_eos: bool = False,
    eos_id: int = 2,
    vocab_size: Optional[int] = None,  # real vocab (< V when layout-padded)
    encouraging_log_end: Optional[float] = None,  # enables encouraging loss
) -> CELossOut:
    B, T, V = logits.shape
    Vr = vocab_size if vocab_size is not None else V
    logits = logits.astype(jnp.float32)

    if constraint_masks is not None:
        logits = jnp.where(constraint_masks, logits, NEG_INF)
    if constraint_range is not None:
        cs, ce = constraint_range
        band = jnp.arange(V)
        allowed = (band < 4) | ((band >= cs) & (band < ce))
        logits = jnp.where(allowed[None, None, :], logits, NEG_INF)

    lprobs = jax.nn.log_softmax(logits, axis=-1)
    if conf is not None:
        lprobs = lprobs * conf[:, None, None]

    lp = lprobs.reshape(-1, V)
    tgt = targets.reshape(-1)
    keep = tgt != pad_id
    if ignore_eos:
        keep = keep & (tgt != eos_id)

    nll = -jnp.take_along_axis(lp, tgt[:, None], axis=1)[:, 0]
    if constraint_masks is not None:
        cm = constraint_masks.reshape(-1, V)
        smooth = -jnp.sum(jnp.where(cm, lp, 0.0), axis=-1)
        eps_i = epsilon / (jnp.sum(cm, axis=-1).astype(jnp.float32) - 1 + 1e-6)
    elif constraint_range is not None:
        cs, ce = constraint_range
        band = jnp.arange(V)
        allowed = (band < 4) | ((band >= cs) & (band < ce))
        smooth = -jnp.sum(jnp.where(allowed[None, :], lp, 0.0), axis=-1)
        n_allowed = 4 + (ce - cs)
        eps_i = epsilon / (n_allowed - 1 + 1e-6)
    else:
        # smoothing support = the real vocab only; layout-padding columns hold
        # NEG_INF logits and would dominate the sum
        real = jnp.arange(V) < Vr
        smooth = -jnp.sum(jnp.where(real[None, :], lp, 0.0), axis=-1)
        eps_i = epsilon / (Vr - 1)

    loss_per_pos = (1.0 - epsilon - eps_i) * nll + eps_i * smooth

    # ---- drop-worst (position level, ref :100-111)
    weights = keep.astype(jnp.float32)
    if drop_worst_ratio > 0.0:
        active = (
            drop_worst_active
            if drop_worst_active is not None
            else jnp.asarray(True)
        )
        if use_rdrop:
            # batch is [x; x] duplicated along B; select on first copy, mirror
            half = (B // 2) * T
            l1 = jnp.where(keep[:half], loss_per_pos[:half], jnp.inf)
            n1 = jnp.sum(keep[:half])
            k1 = jnp.floor(n1 * (1.0 - drop_worst_ratio)).astype(jnp.int32)
            order = jnp.argsort(l1)
            rank = jnp.zeros_like(order).at[order].set(jnp.arange(half))
            kept1 = (rank < k1) & keep[:half]
            kept = jnp.concatenate([kept1, kept1])
        else:
            l1 = jnp.where(keep, loss_per_pos, jnp.inf)
            n = jnp.sum(keep)
            k = jnp.floor(n * (1.0 - drop_worst_ratio)).astype(jnp.int32)
            order = jnp.argsort(l1)
            rank = jnp.zeros_like(order).at[order].set(jnp.arange(B * T))
            kept = (rank < k) & keep
        weights = jnp.where(active, kept.astype(jnp.float32), weights)

    # ---- drop-best (keeps the LARGEST-loss fraction, applied after
    # drop-worst; ref: label_smoothed_encouraging_loss.py:129-132). Static
    # shapes under jit: rank-mask weighting instead of topk-gather.
    if drop_best_ratio > 0.0:
        active_b = (
            drop_best_active
            if drop_best_active is not None
            else jnp.asarray(True)
        )
        cur = weights > 0
        lb = jnp.where(cur, loss_per_pos, -jnp.inf)
        nb = jnp.sum(cur)
        kb = jnp.floor(nb * (1.0 - drop_best_ratio)).astype(jnp.int32)
        order_b = jnp.argsort(-lb)  # descending: hardest positions first
        rank_b = jnp.zeros_like(order_b).at[order_b].set(jnp.arange(B * T))
        kept_b = (rank_b < kb) & cur
        weights = jnp.where(active_b, kept_b.astype(jnp.float32), weights)

    ntokens = jnp.sum(weights).astype(jnp.float32)
    loss = jnp.sum(loss_per_pos * weights)
    nll_loss = jnp.sum(nll * weights)

    if encouraging_log_end is not None:
        # encouraging-loss bonus: log(1-p), linearized above log_end
        # (ref: criterions/label_smoothed_encouraging_loss.py:297-314)
        le = encouraging_log_end
        probs = jnp.exp(lp)
        bonus = jnp.log(jnp.clip(1.0 - probs, 1e-5, None))
        if le != 1.0:
            y_le = jnp.log(1.0 - le)
            bonus_lin = (probs - le) / (le - 1.0) + y_le
            bonus = jnp.where(probs > le, bonus_lin, bonus)
        # c_loss = F.nll_loss(-bonus, target) = bonus[target] — a NEGATIVE
        # confidence bonus (log(1-p_t) < 0) that rewards confident targets.
        tgt_bonus = jnp.take_along_axis(bonus, tgt[:, None], axis=1)[:, 0]
        c_nll = jnp.sum(tgt_bonus * weights)
        # smoothing over the real-vocab support
        real = jnp.arange(V) < Vr
        c_smooth = jnp.sum(
            jnp.sum(jnp.where(real[None, :], bonus, 0.0), axis=-1) * weights
        )
        loss = loss + c_nll * (1.0 - epsilon) + (epsilon / Vr) * c_smooth

    if use_rdrop:
        halfB = B // 2
        p = lprobs[:halfB].reshape(-1, V)
        q = lprobs[halfB:].reshape(-1, V)
        if constraint_range is not None:
            cs, ce = constraint_range
            band = jnp.arange(V)
            sel = (band < 4) | ((band >= cs) & (band < ce))
            p = jnp.where(sel[None, :], p, NEG_INF)
            q = jnp.where(sel[None, :], q, NEG_INF)
        w2 = weights.reshape(B, T)[:halfB].reshape(-1)
        # symmetric KL: (KL(q‖p) + KL(p‖q)) / 2 summed over kept positions
        ep, eq = jnp.exp(p), jnp.exp(q)
        kl = 0.5 * (jnp.sum(eq * (q - p), -1) + jnp.sum(ep * (p - q), -1))
        loss = loss + reg_alpha * jnp.sum(kl * w2)

    return CELossOut(loss=loss, nll_loss=nll_loss, ntokens=ntokens)
