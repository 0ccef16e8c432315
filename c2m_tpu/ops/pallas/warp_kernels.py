"""Pallas TPU warp kernels: fused bilinear resample (+ occlusion mask).

The op behind every decoder scale's skip-feature warp
(models/dense_motion.py feature resampling; reference math
src/utils/ops.py:187-202) and the warped loss.

Mosaic constraints measured on this v5e (see STATUS.md perf notes):
  - ``jnp.take_along_axis(..., axis=1)`` (lane gather) lowers ONLY when the
    lane dimension is exactly one 128-lane tile;
  - sublane gather and in-kernel ``dynamic_slice`` do not lower;
  - joint (row, col) dynamic gather does not exist.
An exact arbitrary-flow warp therefore decomposes as a one-hot row select
(static unroll over H) around within-tile lane gathers, summed over the
W/128 column tiles:

    out[y, x] = sum_r  (iy[y, x] == r) * row_r[ix[y, x]]

which is mathematically the joint gather (row choice via mask, column via
lane gather of that row). Bilinear = 4 such taps with hat weights, fused
with the occlusion multiply in one VMEM pass.

Scope: H <= 128, W % 128 == 0 (the C2M operating shapes); callers fall back
to the jnp path otherwise (ops/warp.py keeps XLA as the default — see the
recorded bench delta in STATUS.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# CPU CI runs the kernels through the Pallas interpreter (tests/conftest.py
# forces the CPU platform); on TPU this must stay off.
_INTERPRET = os.environ.get("C2M_PALLAS_INTERPRET", "") == "1"


def _gather2d(img, iy, ix, h, w):
    """Exact img[iy, ix] for one (h, w) channel slab, h <= 128, w % 128 == 0.

    img/iy/ix: [h, w]; indices already clamped to range.
    """
    n_tiles = w // LANE
    # row r is extracted with an iota mask + sublane reduction: in-kernel
    # dynamic_slice does not lower in this Mosaic version
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, LANE), 0)
    outs = []
    for d in range(n_tiles):                              # destination tiles
        iy_d = iy[:, d * LANE:(d + 1) * LANE]
        ix_d = ix[:, d * LANE:(d + 1) * LANE]
        acc = jnp.zeros((h, LANE), img.dtype)
        for t in range(n_tiles):                          # source column tiles
            tile = img[:, t * LANE:(t + 1) * LANE]        # [h, 128]
            in_tile = (ix_d >= t * LANE) & (ix_d < (t + 1) * LANE)
            ix_local = jnp.clip(ix_d - t * LANE, 0, LANE - 1)

            def body(r, acc, tile=tile, in_tile=in_tile, ix_local=ix_local,
                     iy_d=iy_d):
                row = jnp.sum(jnp.where(row_ids == r, tile, 0.0), axis=0,
                              keepdims=True)
                row = jnp.broadcast_to(row, (h, LANE))
                g = jnp.take_along_axis(row, ix_local, axis=1)
                return acc + jnp.where(in_tile & (iy_d == r), g, 0.0)

            acc = jax.lax.fori_loop(0, h, body, acc)
        outs.append(acc)
    return outs[0] if n_tiles == 1 else jnp.concatenate(outs, axis=1)


def _warp_kernel(image_ref, sx_ref, sy_ref, mask_ref, out_ref, *, h, w,
                 masked):
    """One (batch, channel) program: bilinear sample at (sy, sx) source
    pixel coords with border clamp, optionally * mask."""
    img = image_ref[0, :, :]
    sx = sx_ref[0, :, :]
    sy = sy_ref[0, :, :]

    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = (sx - x0f)[...]
    wy = (sy - y0f)[...]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)

    v00 = _gather2d(img, y0, x0, h, w)
    v10 = _gather2d(img, y0, x1, h, w)
    v01 = _gather2d(img, y1, x0, h, w)
    v11 = _gather2d(img, y1, x1, h, w)
    top = v00 * (1.0 - wx) + v10 * wx
    bot = v01 * (1.0 - wx) + v11 * wx
    res = top * (1.0 - wy) + bot * wy
    if masked:
        res = res * mask_ref[0, :, :]
    out_ref[0, :, :] = res


def supported_shape(image: jnp.ndarray) -> bool:
    b, h, w, c = image.shape
    return h <= LANE and w % LANE == 0


@functools.partial(jax.jit, static_argnames=("masked",))
def _resample_pallas(image: jnp.ndarray, flow: jnp.ndarray,
                     mask: jnp.ndarray, masked: bool) -> jnp.ndarray:
    b, h, w, c = image.shape
    # reference resample semantics (utils/ops.py:187-202): source coords
    # sx = (x + fx) * W/(W-1) - 0.5 (align_corners mix — see ops/warp.py)
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    wf = w / max(w - 1.0, 1e-6)
    hf = h / max(h - 1.0, 1e-6)
    sx = (xs[None, None, :] + flow[..., 0]) * wf - 0.5
    sy = (ys[None, :, None] + flow[..., 1]) * hf - 0.5

    img_cb = image.transpose(0, 3, 1, 2).reshape(b * c, h, w)
    sx_cb = jnp.repeat(sx.astype(jnp.float32), c, axis=0)
    sy_cb = jnp.repeat(sy.astype(jnp.float32), c, axis=0)
    mask_cb = (jnp.repeat(mask[..., 0], c, axis=0) if masked
               else jnp.zeros((b * c, h, w), jnp.float32))

    kernel = functools.partial(_warp_kernel, h=h, w=w, masked=masked)
    out = pl.pallas_call(
        kernel,
        grid=(b * c,),
        out_shape=jax.ShapeDtypeStruct((b * c, h, w), jnp.float32),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(img_cb.astype(jnp.float32), sx_cb, sy_cb, mask_cb)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(image.dtype)


def resample(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Pallas fused bilinear warp; same semantics as ops.warp.resample."""
    b, h, w, c = image.shape
    if not supported_shape(image):
        from c2m_tpu.ops.warp import _resample_jnp
        return _resample_jnp(image, flow)
    return _resample_pallas(image, flow,
                            jnp.zeros((b, h, w, 1), jnp.float32), False)


def resample_masked(image: jnp.ndarray, flow: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    """Fused resample(image, flow) * mask (the decoder's skip-feature warp)."""
    if not supported_shape(image):
        from c2m_tpu.ops.warp import _resample_jnp
        return _resample_jnp(image, flow) * mask
    return _resample_pallas(image, flow, mask.astype(jnp.float32), True)
