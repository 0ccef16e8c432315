"""Orbax checkpointing of the TrainState (reference: trainer.py:245-260 —
single-file torch.save of model + 4 optimizer states + iter.txt; here one
Orbax pytree checkpoint per save, a ``latest`` pointer, and the same epoch/
iteration counters persisted alongside).

The reference does NOT checkpoint LR schedulers (SURVEY.md §5); we don't need
to — schedules are pure functions of the step count, which is saved.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp
from flax import core

from c2m_tpu.train.state import TrainState


def _plain(tree):
    """Orbax wants plain dicts; flax may hand us FrozenDicts."""
    return core.unfreeze(tree) if isinstance(tree, core.FrozenDict) else tree


def _mgr(job_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.join(os.path.abspath(job_dir), "checkpoints"),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True))


def save_checkpoint(job_dir: str, state: TrainState, epoch: int,
                    epoch_iter: int = 0) -> None:
    mgr = _mgr(job_dir)
    payload = {
        "params": _plain(state.params),
        "opt_state": state.opt_state,
        "batch_stats": _plain(state.batch_stats),
        "spectral": _plain(state.spectral),
        "step": state.step,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    with open(os.path.join(job_dir, "iter.txt"), "w") as f:
        f.write(f"{epoch},{epoch_iter}")


def load_checkpoint(job_dir: str, state: TrainState,
                    epoch: Optional[int] = None) -> Tuple[TrainState, int, int]:
    """Restore into ``state``'s structure; returns (state, start_epoch, iter)."""
    mgr = _mgr(job_dir)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        return state, 1, 0
    template = {
        "params": _plain(state.params),
        "opt_state": state.opt_state,
        "batch_stats": _plain(state.batch_stats),
        "spectral": _plain(state.spectral),
        "step": state.step,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    state = state.replace(params=restored["params"],
                          opt_state=restored["opt_state"],
                          batch_stats=restored["batch_stats"],
                          spectral=restored["spectral"],
                          step=restored["step"])
    try:
        with open(os.path.join(job_dir, "iter.txt")) as f:
            start_epoch, epoch_iter = map(int, f.read().split(","))
    except FileNotFoundError:
        start_epoch, epoch_iter = step, 0
    return state, start_epoch, epoch_iter
