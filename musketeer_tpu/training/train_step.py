"""The jitted multi-task training step.

Replaces the reference's Trainer.train_step (ref: trainer.py:734-1039) —
grad-accum loop, all-reduce, clip, optimizer step — with ONE XLA program:
``lax.scan`` over microbatches accumulates grads on device, GSPMD inserts the
gradient reductions over the mesh, optax applies clip+adam. No host↔device
round trips inside the step.

Multi-task semantics follow the reference's criterion recursion
(ref: criterions/label_smoothed_cross_entropy.py:175-202): each task's
summed loss is normalized by its own kept-token count and the normalized
losses are added (sample_size=1).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import CriterionConfig, ModelConfig, OptimConfig
from ..criterions.label_smoothed_ce import label_smoothed_ce
from ..models import ofa
from .train_state import TrainState, ema_update, make_optimizer


class TaskBatch(NamedTuple):
    """One task's (micro)batch. Arrays may carry a leading accum axis."""

    src_tokens: jnp.ndarray  # [..., B, Ts]
    prev_output_tokens: jnp.ndarray  # [..., B, Tt]
    target: jnp.ndarray  # [..., B, Tt]
    patch_images: Optional[jnp.ndarray] = None  # [..., B, H, W, 3]
    patch_masks: Optional[jnp.ndarray] = None  # [..., B]
    constraint_masks: Optional[jnp.ndarray] = None  # [..., B, Tt, V]
    conf: Optional[jnp.ndarray] = None  # [..., B]
    code_masks: Optional[jnp.ndarray] = None  # [..., B]
    # training-time patch subsampling order (host-sampled; ref sample_patch_num)
    sample_patch_order: Optional[jnp.ndarray] = None  # [..., B, P]


def task_loss(
    params,
    model_cfg: ModelConfig,
    crit_cfg: CriterionConfig,
    batch: TaskBatch,
    rng: Optional[jax.Array],
    update_num: jnp.ndarray,
    train: bool = True,
):
    """One task's (loss_sum, nll_sum, ntokens)."""
    if crit_cfg.use_rdrop and train:
        dup = lambda a: None if a is None else jnp.concatenate([a, a], axis=0)
        batch = TaskBatch(*[dup(a) for a in batch])
    logits = ofa.forward(
        params,
        model_cfg,
        batch.src_tokens,
        batch.prev_output_tokens,
        patch_images=batch.patch_images,
        patch_masks=batch.patch_masks,
        code_masks=batch.code_masks,
        sample_patch_order=batch.sample_patch_order,
        rngs=rng,
        deterministic=not train,
        train_bn=False,  # frozen BN stats (ref FrozenBatchNorm eval-parity path)
    )
    out = label_smoothed_ce(
        logits,
        batch.target,
        epsilon=crit_cfg.label_smoothing,
        pad_id=model_cfg.pad,
        constraint_masks=batch.constraint_masks,
        constraint_range=(
            (crit_cfg.constraint_start, crit_cfg.constraint_end)
            if crit_cfg.constraint_start is not None
            else None
        ),
        conf=batch.conf,
        drop_worst_ratio=crit_cfg.drop_worst_ratio if train else 0.0,
        drop_worst_active=update_num > crit_cfg.drop_worst_after,
        drop_best_ratio=crit_cfg.drop_best_ratio if train else 0.0,
        drop_best_active=update_num > crit_cfg.drop_best_after,
        use_rdrop=crit_cfg.use_rdrop and train,
        reg_alpha=crit_cfg.reg_alpha,
        vocab_size=model_cfg.vocab_size,
        encouraging_log_end=crit_cfg.encouraging_log_end,
    )
    return out


def multitask_loss(
    params,
    model_cfg: ModelConfig,
    crit_cfg: CriterionConfig,
    batches: Dict[str, TaskBatch],
    rng: Optional[jax.Array],
    update_num: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Σ_task loss_t / ntokens_t (ref criterion recursion semantics)."""
    total = 0.0
    metrics: Dict[str, jnp.ndarray] = {}
    for i, (name, batch) in enumerate(sorted(batches.items())):
        trng = None if rng is None else jax.random.fold_in(rng, i)
        out = task_loss(params, model_cfg, crit_cfg, batch, trng, update_num)
        norm = out.loss / jnp.maximum(out.ntokens, 1.0)
        total = total + norm
        metrics[f"loss/{name}"] = norm
        metrics[f"nll/{name}"] = out.nll_loss / jnp.maximum(out.ntokens, 1.0)
    metrics["loss/total"] = total
    return total, metrics


def make_train_step(
    model_cfg: ModelConfig,
    crit_cfg: CriterionConfig,
    optim_cfg: OptimConfig,
    ema_decay: float = 0.0,
    donate: bool = True,
):
    """Build the jitted train step.

    The returned fn: (state, batches, rng) → (state, metrics), where every
    array in `batches` has a leading accum axis A (A=1 for no accumulation).
    """
    tx = make_optimizer(optim_cfg)

    def loss_fn(params, micro, rng, update_num):
        return multitask_loss(params, model_cfg, crit_cfg, micro, rng, update_num)

    def step(state: TrainState, batches: Dict[str, TaskBatch], rng: jax.Array):
        A = jax.tree.leaves(batches)[0].shape[0]

        def micro_step(acc, xs):
            grads_acc, loss_acc = acc
            micro, a = xs
            mrng = jax.random.fold_in(rng, a)
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, micro, mrng, state.step
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), metrics

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum), metrics = jax.lax.scan(
            micro_step,
            (zero_grads, 0.0),
            (batches, jnp.arange(A)),
        )
        grads = jax.tree.map(lambda g: g / A, grads)

        gnorm = optax.global_norm(grads)
        # skip the update on non-finite gradients — the TPU-native stand-in
        # for the reference's NaN detector / AMP overflow batch-retry
        # (ref: trainer.py:899-923, fairseq.nan_detector)
        finite = jnp.isfinite(gnorm)
        safe_grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def keep_if_skipped(new, old):
            return jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)

        new_params = keep_if_skipped(new_params, state.params)
        new_opt = keep_if_skipped(new_opt, state.opt_state)
        new_ema = (
            ema_update(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        new_state = TrainState(
            step=state.step + finite.astype(jnp.int32),
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        out_metrics = {k: v[-1] for k, v in metrics.items()}
        out_metrics["loss"] = loss_sum / A
        out_metrics["gnorm"] = gnorm
        out_metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return new_state, out_metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
