"""Rematerialization policies for the segment-wise train-step remat.

The reference never rematerializes (torch keeps every activation;
/root/reference/src/trainer.py backward over the full graph) — remat is a
TPU-side memory/time trade this framework adds so the big operating points
fit a 16 GB chip (train_params.remat, models/c2m.py maybe_remat).

``train_params.remat_policy`` picks what the checkpointed segments SAVE:

- ``""`` (default): save only segment boundaries — full recompute in the
  backward pass (jax.checkpoint's default; the minimum-memory setting that
  the 512x1024 config needs).
- ``"convs"``: save every conv / dot_general output inside the segment and
  recompute only the cheap glue (norms, activations, pads, resizes). The
  backward pass then re-executes no convolution: with the conv outputs
  resident, autodiff needs only the (already-saved) inputs/outputs of each
  conv to form its transposed-conv gradients. Costs activation memory
  between "" and no-remat — for operating points with HBM headroom
  (256x512 b3: remat peak 9.24 GB of 15.75, tools/mem_train.py) this buys
  back most of remat's recompute time.
- ``"convs:<MB>"`` (e.g. ``"convs:64"``): like ``"convs"`` but saves only
  conv / dot outputs whose LOGICAL size is <= the given number of
  megabytes; bigger ones (the full-res thin-channel tensors that carry a
  4.3x (8,128)-tile padding tax on this architecture — see the OOM dumps
  in STATUS.md) are recomputed. The middle ground when plain "convs"
  exceeds HBM at an operating point.
"""

from __future__ import annotations

from typing import Callable, FrozenSet, Optional

_SAVEABLE = ("conv_general_dilated", "dot_general")

# the train step's checkpointable segments (models/c2m.py setup +
# train/model.py discriminators). The scan-frames tail body is NOT listed:
# its remat is load-bearing for the memory win and stays unconditional.
SEGMENTS = ("appearance", "sparse_feature", "motion_bg", "motion_fg",
            "dense_bw", "dense_fw", "generator", "discs")


def parse_segments(spec: str) -> FrozenSet[str]:
    """``train_params.remat_segments``: "all" or a comma list of SEGMENTS.

    Segments NOT listed are never wrapped in nn.remat — their activations
    are saved like the reference's torch autograd would (the memory cost
    returns). Use to confine recompute to the memory-dominant segments at
    operating points with HBM headroom.
    """
    if spec.strip() == "all":
        return frozenset(SEGMENTS)
    names = frozenset(s.strip() for s in spec.split(",") if s.strip())
    unknown = names - frozenset(SEGMENTS)
    if unknown:
        raise ValueError(f"unknown remat_segments {sorted(unknown)} "
                         f"(expected 'all' or a comma list of {SEGMENTS})")
    return names


def _out_bytes(prim, *args, **params) -> int:
    """Logical output size of a primitive application, from input avals.

    The checkpoint policy callback receives the equation's input ABSTRACT
    values (jax/_src/ad_checkpoint.py: ``dots_with_no_batch_dims_saveable``
    reads ``args[0].shape``), so the output aval is one abstract_eval away.
    Conservative on failure: report "huge" so the value is recomputed.
    """
    try:
        out, _ = prim.abstract_eval(*args, **params)
        if isinstance(out, (list, tuple)):
            return sum(int(o.size) * o.dtype.itemsize for o in out)
        return int(out.size) * out.dtype.itemsize
    except Exception:
        return 1 << 62


def make_policy(name: str) -> Optional[Callable]:
    """jax.checkpoint policy for ``train_params.remat_policy``."""
    if not name:
        return None
    if name == "convs":
        def convs_saveable(prim, *_, **__):
            return getattr(prim, "name", None) in _SAVEABLE
        return convs_saveable
    if name.startswith("convs:"):
        try:
            cap = float(name.split(":", 1)[1]) * 1e6
        except ValueError:
            raise ValueError(
                f"unknown remat_policy {name!r} (expected '', 'convs' or "
                f"'convs:<MB>' with a numeric megabyte cap)")
        def small_convs_saveable(prim, *args, **params):
            return (getattr(prim, "name", None) in _SAVEABLE
                    and _out_bytes(prim, *args, **params) <= cap)
        return small_convs_saveable
    raise ValueError(
        f"unknown remat_policy {name!r} (expected '', 'convs' or "
        f"'convs:<MB>')")
