"""Forward-splat occlusion map as a gather/scatter-free MXU kernel.

The jnp path (``c2m_tpu.ops.splat.corresponding_map``) lowers to an XLA
scatter-add with 4·H·W duplicate indices per image — the classic
TPU-hostile op (serialized accumulation; measured 53 ms for 60 128x256
maps, 239 ms for 10 512x1024 maps — tools/bench_splat.py). This kernel
reformulates the bilinear splat exactly as a dense contraction:

    out[y, x] = sum_p  hat(sy_p - y) * hat(sx_p - x),   hat(d) = max(0, 1-|d|)

because each source point's bilinear corner weights ARE the hat products at
the (at most 4) integer grid points around it, and the reference zeroes
out-of-image corners (src/utils/ops.py:205-251) — which the hat evaluation
over the in-image grid reproduces automatically. Out-of-range points
contribute nothing, exactly like the reference's ``invalid`` masking.

Factored over a chunk of source points the contraction is a single matmul:

    U[h, p] = hat(sy_p - h)   (built on the VPU from an iota, never leaves
    V[w, p] = hat(sx_p - w)    VMEM)
    out    += U @ V^T          (MXU, f32 HIGHEST precision)

Measured on the v5e: 4.4 ms vs the 53 ms scatter at the raster's occlusion
shape, parity 1.8e-7 (tools/bench_splat.py). Larger maps band over output
rows so U/V/out stay inside VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _splat_kernel(sx_ref, sy_ref, out_ref, *, w: int, band: int,
                  chunk: int, n_chunks: int):
    hb = pl.program_id(1) * band

    def body(ci, acc):
        sx = sx_ref[0, pl.ds(ci, 1)]                      # [1, CP]
        sy = sy_ref[0, pl.ds(ci, 1)]                      # [1, CP]
        rows = (jax.lax.broadcasted_iota(jnp.int32, (band, chunk), 0)
                + hb).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (w, chunk), 0).astype(jnp.float32)
        u = jnp.maximum(0.0, 1.0 - jnp.abs(sy - rows))    # [BAND, CP]
        v = jnp.maximum(0.0, 1.0 - jnp.abs(sx - cols))    # [W, CP]
        return acc + jax.lax.dot_general(
            u, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # [BAND, W]

    out_ref[0] = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((band, w), jnp.float32))


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _splat_call(sx: jnp.ndarray, sy: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, p = sx.shape
    chunk = 2048 if w <= 512 else 1024
    band = min(h, 128)
    assert h % band == 0, (
        f"splat kernel banding needs h <= 128 or h % 128 == 0, got {h} "
        "(the occlusion_map guard routes other shapes to the scatter path)")
    n_chunks = p // chunk
    sx3 = sx.reshape(b, n_chunks, chunk)
    sy3 = sy.reshape(b, n_chunks, chunk)
    kernel = functools.partial(_splat_kernel, w=w, band=band, chunk=chunk,
                               n_chunks=n_chunks)
    return pl.pallas_call(
        kernel,
        grid=(b, h // band),
        in_specs=[pl.BlockSpec((1, n_chunks, chunk), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, n_chunks, chunk), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, band, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
    )(sx3, sy3)


def corresponding_map(coords: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ``splat.corresponding_map``: coords [B, H, W, 2] (x, y)
    un-normalized pixel targets -> accumulated bilinear mass [B, H, W, 1]."""
    b, h, w, _ = coords.shape
    p = h * w
    chunk = 2048 if w <= 512 else 1024
    sx = coords[..., 0].astype(jnp.float32).reshape(b, p)
    sy = coords[..., 1].astype(jnp.float32).reshape(b, p)
    pad = (-p) % chunk
    if pad:
        # points far outside the grid contribute zero mass
        sx = jnp.pad(sx, ((0, 0), (0, pad)), constant_values=-2.0)
        sy = jnp.pad(sy, ((0, 0), (0, pad)), constant_values=-2.0)
    # keep each call's output under ~8 MB: XLA likes to pin small custom-call
    # results in scoped VMEM, which OOMs at 512x1024 full-batch
    max_imgs = max(1, (8 << 20) // (h * w * 4))
    if b <= max_imgs:
        out = _splat_call(sx, sy, h, w)
    else:
        parts = [_splat_call(sx[i:i + max_imgs], sy[i:i + max_imgs], h, w)
                 for i in range(0, b, max_imgs)]
        out = jnp.concatenate(parts, axis=0)
    return out[..., None].astype(coords.dtype)
