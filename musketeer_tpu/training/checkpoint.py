"""Checkpoint save/load: orbax for training state, .pt interop for the
reference ecosystem.

Replaces the reference's checkpoint_utils (ref: utils/checkpoint_utils.py:
35-190 best-k/interval policy, trainer.py:388-432 state dict) with:
- orbax/tensorstore sharded array checkpoints (multi-host safe, async-capable),
- the same save policy surface: epoch / interval-updates / best-metric-k,
- fairseq ``.pt`` export/import through convert/ for drop-in interop.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from .train_state import TrainState


def _ckpt_dir(save_dir: str, name: str) -> str:
    return os.path.join(save_dir, name)


_async_ckptr = None


def _get_async_ckptr():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.StandardCheckpointer()
    return _async_ckptr


def wait_for_saves():
    """Block until all in-flight async checkpoint writes land."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    save_dir: str,
    state: TrainState,
    name: str = "checkpoint_last",
    extra: Optional[Dict[str, Any]] = None,
    async_save: bool = False,
):
    """Write a checkpoint (orbax StandardCheckpointer).

    ``async_save=True`` returns once device arrays are snapshotted and the
    write continues in a background thread (the reference's ioPath async
    writes, ref: train.py:84-92, checkpoint_utils.py:517-526); call
    :func:`wait_for_saves` before reading it back or exiting.
    """
    import orbax.checkpoint as ocp

    os.makedirs(save_dir, exist_ok=True)
    path = os.path.abspath(_ckpt_dir(save_dir, name))
    tree = dict(
        step=np.asarray(state.step),
        params=state.params,
        opt_state=state.opt_state,
        ema_params=state.ema_params,
    )
    if async_save:
        ckptr = _get_async_ckptr()
        ckptr.wait_until_finished()  # serialize with any previous save
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, tree)
    else:
        if os.path.exists(path):
            shutil.rmtree(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, tree)
    if extra is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)


def load_checkpoint(
    save_dir: str, template: TrainState, name: str = "checkpoint_last"
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the template's structure/shardings."""
    import orbax.checkpoint as ocp

    wait_for_saves()  # same-process async writes must land first
    path = os.path.abspath(_ckpt_dir(save_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        # the saved tree may or may not carry an EMA shadow; adapt the
        # template so eval-without---use-ema of an EMA checkpoint (and vice
        # versa) restores instead of failing on a structure mismatch
        try:
            saved_has_ema = bool(ckptr.metadata(path).item_metadata["ema_params"])
        except Exception:
            saved_has_ema = template.ema_params is not None
        ema_target = template.ema_params
        if saved_has_ema and ema_target is None:
            ema_target = template.params  # same structure as params
        elif not saved_has_ema:
            ema_target = None
        target = dict(
            step=np.asarray(template.step),
            params=template.params,
            opt_state=template.opt_state,
            ema_params=ema_target,
        )
        restored = ckptr.restore(path, target)
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    state = TrainState(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=restored["ema_params"],
    )
    return state, meta


@dataclass
class CheckpointManager:
    """Save policy: last + epoch/interval + best-k by metric
    (ref: utils/checkpoint_utils.py:35-190)."""

    save_dir: str
    best_checkpoint_metric: str = "score"
    maximize_best_checkpoint_metric: bool = True
    keep_best_checkpoints: int = -1
    save_interval_updates: int = 0
    async_save: bool = False  # background writes (wait_for_saves to flush)

    def __post_init__(self):
        self._best: List[Tuple[float, str]] = []
        # running best metric, tracked UNCONDITIONALLY (the reference keeps
        # save_checkpoint.best regardless of keep_best_checkpoints,
        # ref: utils/checkpoint_utils.py:42-83)
        self._best_val: Optional[float] = None

    def restore_policy(self, meta: Dict[str, Any]):
        """Re-seed the best-metric tracker from a resumed checkpoint's meta."""
        bv = meta.get("best_val")
        if bv is not None:
            self._best_val = float(bv)

    def step(
        self,
        state: TrainState,
        epoch: int,
        num_updates: int,
        val_metric: Optional[float] = None,
        end_of_epoch: bool = False,
        steps_in_epoch: int = 0,
    ) -> List[str]:
        """Decide + perform saves. Returns names written."""
        written = []
        sign = 1.0 if self.maximize_best_checkpoint_metric else -1.0
        is_best = val_metric is not None and (
            self._best_val is None or sign * val_metric >= sign * self._best_val
        )
        if is_best:
            self._best_val = float(val_metric)
        extra = {
            "epoch": epoch,
            "num_updates": num_updates,
            "val_metric": val_metric,
            "end_of_epoch": end_of_epoch,
            "steps_in_epoch": steps_in_epoch,
            "best_val": self._best_val,
        }
        if end_of_epoch:
            save_checkpoint(self.save_dir, state, f"checkpoint{epoch}", extra, self.async_save)
            written.append(f"checkpoint{epoch}")
        if (
            self.save_interval_updates > 0
            and not end_of_epoch
            and num_updates > 0
            and num_updates % self.save_interval_updates == 0
        ):
            # ref requires a genuine mid-epoch update boundary
            # (checkpoint_utils.py:74-78)
            name = f"checkpoint_{epoch}_{num_updates}"
            save_checkpoint(self.save_dir, state, name, extra, self.async_save)
            written.append(name)
        if val_metric is not None:
            if is_best:
                save_checkpoint(self.save_dir, state, "checkpoint_best", extra, self.async_save)
                written.append("checkpoint_best")
            if self.keep_best_checkpoints > 0:
                name = f"checkpoint.best_{self.best_checkpoint_metric}_{val_metric:.4f}"
                save_checkpoint(self.save_dir, state, name, extra, self.async_save)
                written.append(name)
                self._best.append((val_metric, name))
                self._best.sort(key=lambda t: -sign * t[0])
                if self.async_save and self._best[self.keep_best_checkpoints :]:
                    wait_for_saves()  # never rmtree an in-flight write
                for _, old in self._best[self.keep_best_checkpoints :]:
                    p = _ckpt_dir(self.save_dir, old)
                    if os.path.exists(p):
                        shutil.rmtree(p, ignore_errors=True)
                    if os.path.exists(p + ".meta.json"):
                        os.remove(p + ".meta.json")
                self._best = self._best[: self.keep_best_checkpoints]
        save_checkpoint(self.save_dir, state, "checkpoint_last", extra, self.async_save)
        written.append("checkpoint_last")
        return written


def export_pt(params, model_cfg, path: str):
    """Params → fairseq-named torch .pt (consumable by the reference stack)."""
    import torch

    from ..convert import export_state_dict

    torch.save({"model": export_state_dict(params, model_cfg)}, path)


def import_pt(path: str, model_cfg=None):
    """Reference .pt → (params, cfg)."""
    from ..convert import load_checkpoint as _load

    return _load(path, model_cfg)
