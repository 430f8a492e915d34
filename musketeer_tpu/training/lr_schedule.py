"""LR schedules. The reference uses fairseq's polynomial_decay with warmup
(run_scripts/musketeer/train_musketeer.sh:148-150: --lr-scheduler=polynomial_decay)."""

from __future__ import annotations

import optax

from ..config import OptimConfig


def polynomial_decay_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Linear warmup 0→lr over warmup_updates, then polynomial decay to end_lr
    at total_updates (power 1.0 = linear, fairseq default)."""

    warmup = optax.linear_schedule(0.0, cfg.lr, max(1, cfg.warmup_updates))
    decay = optax.polynomial_schedule(
        init_value=cfg.lr,
        end_value=cfg.end_lr,
        power=cfg.power,
        transition_steps=max(1, cfg.total_updates - cfg.warmup_updates),
    )
    return optax.join_schedules([warmup, decay], [cfg.warmup_updates])
