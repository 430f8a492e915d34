"""Training state + optimizer construction.

Collapses the reference's Trainer optimizer plumbing (ref: trainer.py:293-369:
FP16Optimizer/AMP/loss-scaling/ZeRO wiring) to: bf16 compute + fp32 master
params + optax adam — no loss scaling needed on TPU bf16 (SURVEY.md §2.7).
Optimizer state inherits parameter shardings, so fsdp>1 gives ZeRO for free.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import OptimConfig
from .lr_schedule import polynomial_decay_schedule


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32 (num_updates)
    params: Any  # fp32 master params
    opt_state: Any
    ema_params: Optional[Any]  # fp32 EMA shadow (ref: trainer EMA step)


def _freeze_mask_fn(prefixes):
    """params -> bool pytree, True at leaves whose dotted path starts with
    any of `prefixes`. Used for frozen subtrees (ref requires_grad=False:
    unify_transformer.py:380-384 freeze_{encoder,decoder}_embedding)."""

    def mask(params):
        def leaf_mask(path, _):
            dotted = ".".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            return any(
                dotted == p or dotted.startswith(p + ".") for p in prefixes
            )

        return jax.tree_util.tree_map_with_path(leaf_mask, params)

    return mask


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    schedule = polynomial_decay_schedule(cfg)
    chain = []
    if cfg.freeze_params:
        # zero frozen-subtree grads BEFORE the global-norm clip so frozen
        # params neither move nor contribute to the clip norm — the exact
        # effect of requires_grad=False in the reference (the param never
        # appears in the optimizer's param group)
        chain.append(
            optax.masked(optax.set_to_zero(), _freeze_mask_fn(cfg.freeze_params))
        )
    if cfg.clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )
    )
    if cfg.freeze_params:
        # ...and zero the final update too: adamw's decoupled weight decay
        # adds -lr*wd*p even where the grad (hence m,v) is zero
        chain.append(
            optax.masked(optax.set_to_zero(), _freeze_mask_fn(cfg.freeze_params))
        )
    return optax.chain(*chain)


def init_train_state(
    params: Any, optim_cfg: OptimConfig, ema_decay: float = 0.0
) -> TrainState:
    tx = make_optimizer(optim_cfg)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(step=jnp.int32(0), params=params, opt_state=opt_state, ema_params=ema)


def ema_update(ema_params, params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
