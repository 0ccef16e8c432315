"""General-affine instance-mask warp as a gather-free MXU kernel.

The rasterizer warps every object mask by a (generally non-axis-aligned)
affine via zero-padded bilinear sampling (reference dense_motion.py:161-168).
The jnp path vmaps a 4-corner gather per (object, timestep) — at the test
operating point that is 480 serial XLA gathers of a [128, 256] mask, the
dominant cost of fresh-batch inference when ``use_gt_eval=False``.

This kernel evaluates the same sample exactly, with no gather:

    out[p] = sum_y hat(sy_p - y) * sum_x hat(sx_p - x) * M[y, x]

where (sx_p, sy_p) are the affine source coords of output pixel p and
hat(d) = max(0, 1 - |d|). The inner sum is a dot_general over the mask's
x-axis (MXU); the outer is a 128-lane VPU reduction. Out-of-image samples
get zero weight from the hat — exactly grid_sample's zeros padding.

Block structure: grid (B*N, T, H/ROWS); the mask block [H, W] is indexed by
(B*N) only, so Pallas keeps it resident in VMEM across the inner T and row
steps. Per step: build V [ROWS, W, W] and U [ROWS, W, H] hats from iotas
(VPU, never touch HBM), one batched matmul, one masked reduction.

Exact vs the vmapped-gather path (fp32): tests/test_pallas.py, and the
gather path itself is golden-tested vs torch grid_sample.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8


def _kernel(theta_ref, mask_ref, out_ref, *, h: int, w: int):
    rb = pl.program_id(2)
    tj = pl.program_id(1)
    # output pixel grid for this row block, normalized acf coords
    r = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, w), 0).astype(jnp.float32) + rb * _ROWS
    c = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, w), 1).astype(jnp.float32)
    bx = (2.0 * c + 1.0) / w - 1.0
    by = (2.0 * r + 1.0) / h - 1.0
    gx = (theta_ref[0, tj, 0] * bx + theta_ref[0, tj, 1] * by
          + theta_ref[0, tj, 2])
    gy = (theta_ref[0, tj, 3] * bx + theta_ref[0, tj, 4] * by
          + theta_ref[0, tj, 5])
    sx = ((gx + 1.0) * w - 1.0) * 0.5          # [ROWS, W]
    sy = ((gy + 1.0) * h - 1.0) * 0.5
    # V[r, c, x] = hat(sx[r, c] - x);  U[r, c, y] = hat(sy[r, c] - y)
    xs = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, w, w), 2).astype(jnp.float32)
    v = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - xs))
    ys = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, w, h), 2).astype(jnp.float32)
    u = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - ys))
    # T1[r, c, y] = sum_x V[r, c, x] * M[y, x]   (batched MXU matmul)
    t1 = jax.lax.dot_general(
        v, mask_ref[0],
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)    # [ROWS, W, H]
    out_ref[0, 0] = jnp.sum(u * t1, axis=2)     # [ROWS, W]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _call(thetas: jnp.ndarray, masks: jnp.ndarray, h: int, w: int
          ) -> jnp.ndarray:
    g, t = thetas.shape[:2]
    kernel = functools.partial(_kernel, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(g, t, h // _ROWS),
        in_specs=[
            pl.BlockSpec((1, t, 6), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _ROWS, w),
                               lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, t, h, w), jnp.float32),
    )(thetas, masks)


def warp_masks(obj_f: jnp.ndarray, thetas: jnp.ndarray) -> jnp.ndarray:
    """Warp object masks by per-timestep general affines.

    obj_f: [B, N, H, W] float {0,1} masks; thetas: [B, N, T, 6]
    (rows of the 2x3 matrix) -> warped [B, N, T, H, W], exactly
    ``grid_sample_normalized(mask, affine_grid(theta), padding='zeros')``.
    """
    b, n, h, w = obj_f.shape
    t = thetas.shape[2]
    assert h % _ROWS == 0, (
        f"maskwarp kernel requires h % {_ROWS} == 0, got {h} (the raster "
        "default-path guard routes unaligned shapes to the gather path)")
    th = thetas.reshape(b * n, t, 6).astype(jnp.float32)
    mk = obj_f.reshape(b * n, h, w).astype(jnp.float32)
    out = _call(th, mk, h, w)
    return out.reshape(b, n, t, h, w).astype(obj_f.dtype)
