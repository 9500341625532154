"""Checkpoint save/restore with shape-tolerant partial loading.

Replaces the reference's rank-0 ``torch.save({model, optimizer, lr_scheduler,
epoch, args})`` + partial ``load_state_dict`` override
(mainExplain_gat.py:371-384,290-310; pipeline_model_gat.py:823-836) with an
orbax-backed checkpoint of {params, batch_stats, opt_state, step, epoch}.
Partial restore keeps any saved leaf whose path+shape matches the current
model and logs the rest — same semantics as the reference's tolerant loader.
"""
from __future__ import annotations

import logging
import pathlib
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from graphvqa_tpu.train.train_state import TrainState


def save_checkpoint(path, state: TrainState, keep: int = 3) -> None:
    path = pathlib.Path(path).absolute()
    with ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)) as mgr:
        mgr.save(
            int(state.epoch),
            args=ocp.args.StandardSave({
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step,
                "epoch": state.epoch,
            }),
        )


def _partial_merge(current: Any, saved: Any, prefix: str = "") -> Any:
    """Keep saved leaves whose structure+shape match; log mismatches."""
    if isinstance(current, dict) and isinstance(saved, dict):
        out = {}
        for k, v in current.items():
            if k in saved:
                out[k] = _partial_merge(v, saved[k], f"{prefix}/{k}")
            else:
                logging.info("checkpoint: missing key %s/%s — keeping init",
                             prefix, k)
                out[k] = v
        return out
    cur_arr = np.asarray(current) if not hasattr(current, "shape") else current
    if hasattr(saved, "shape") and tuple(saved.shape) == tuple(cur_arr.shape):
        return saved
    logging.info("checkpoint: shape mismatch at %s (%s vs %s) — keeping init",
                 prefix, getattr(saved, "shape", None),
                 getattr(cur_arr, "shape", None))
    return current


def restore_checkpoint(
    path, state: TrainState, step: Optional[int] = None, strict: bool = False,
) -> Tuple[TrainState, int]:
    """Restore into ``state``; returns (state, start_epoch)."""
    path = pathlib.Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": state.epoch,
        }
        restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    if strict:
        merged = restored
    else:
        merged = {
            "params": _partial_merge(state.params, restored["params"]),
            "batch_stats": _partial_merge(state.batch_stats,
                                          restored["batch_stats"]),
            "opt_state": restored["opt_state"],
            "step": restored["step"],
            "epoch": restored["epoch"],
        }
    new_state = state.replace(
        params=merged["params"],
        batch_stats=merged["batch_stats"],
        opt_state=merged["opt_state"],
        step=merged["step"],
        epoch=merged["epoch"],
    )
    start_epoch = int(merged["epoch"]) + 1  # mainExplain_gat.py:300-301
    return new_state, start_epoch
