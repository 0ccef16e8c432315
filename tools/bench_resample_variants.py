#!/usr/bin/env python
"""Micro-benchmark: XLA lowering variants of the flow-warp gather at the
decoder's hot shapes, slope protocol (STATUS.md round-2 notes).

The full-model profile points at `resample` (4-point bilinear gather) as the
dominant non-conv cost. XLA TPU gathers can lower very differently depending
on formulation; this measures the candidates before committing a redesign:

  copy      roofline: one elementwise pass over the same bytes
  vmap_take current production path (_resample_jnp: vmap over B of flat take)
  flat_take single global gather with batch folded into the index
  patch22   one lax.gather of 2x2xC patches per output pixel
  onehot    hat-function matmul: out = HatY[p,y] @ img @ HatX-style contraction
            blocked over row bands (D-bounded displacement)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K_SMALL, K_BIG, REPEATS = 2, 10, 3


def slope(make_fused, *args):
    fs, fb = make_fused(K_SMALL), make_fused(K_BIG)

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(jax.random.PRNGKey(seed), *args))
        return time.perf_counter() - t0

    timed(fs, 0)
    timed(fb, 0)
    ts = min(timed(fs, 1 + r) for r in range(REPEATS))
    tb = min(timed(fb, 100 + r) for r in range(REPEATS))
    return (tb - ts) / (K_BIG - K_SMALL) * 1e3


def fused_factory(op):
    def make(k):
        @jax.jit
        def fused(seed, image, flow):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                f = flow + jax.random.uniform(s, (), dtype=flow.dtype,
                                              maxval=1e-3)
                acc = acc + op(image, f).astype(jnp.float32).mean()
            return acc
        return fused
    return make


# ---------------------------------------------------------------------------
# variants
# ---------------------------------------------------------------------------

def src_coords(image, flow):
    b, h, w, _ = image.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    wf = w / (w - 1.0)
    hf = h / (h - 1.0)
    sx = (xs[None, None, :] + flow[..., 0]) * wf - 0.5
    sy = (ys[None, :, None] + flow[..., 1]) * hf - 0.5
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    return sx, sy


def v_copy(image, flow):
    return image * flow[..., :1]


def v_vmap_take(image, flow):
    from c2m_tpu.ops.warp import _resample_jnp
    return _resample_jnp(image, flow)


def v_flat_take(image, flow):
    b, h, w, c = image.shape
    sx, sy = src_coords(image, flow)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None].astype(image.dtype)
    wy = (sy - y0)[..., None].astype(image.dtype)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    flat = image.reshape(b * h * w, c)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]

    def g(yi, xi):
        idx = (base + yi * w + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(b, h, w, c)

    v00, v10 = g(y0i, x0i), g(y0i, x1i)
    v01, v11 = g(y1i, x0i), g(y1i, x1i)
    top = v00 * (1 - wx) + v10 * wx
    bot = v01 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def v_patch22(image, flow):
    b, h, w, c = image.shape
    sx, sy = src_coords(image, flow)
    x0i = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 2)
    y0i = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 2)
    # weights relative to the clipped corner (border semantics preserved:
    # sx is already clamped to [0, w-1], so wx lands in [0, 1])
    wx = (sx - x0i)[..., None].astype(image.dtype)
    wy = (sy - y0i)[..., None].astype(image.dtype)
    # one gather of [2, 2, C] patches at (y0, x0)
    starts = jnp.stack([y0i, x0i], axis=-1).reshape(b, h * w, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patches = jax.vmap(lambda img, st: jax.lax.gather(
        img, st, dn, slice_sizes=(2, 2, c), mode="clip"))(image, starts)
    patches = patches.reshape(b, h, w, 2, 2, c)
    # correct the clip-at-w-2: when x0 clipped down, wx adjusts implicitly
    top = patches[..., 0, 0, :] * (1 - wx) + patches[..., 0, 1, :] * wx
    bot = patches[..., 1, 0, :] * (1 - wx) + patches[..., 1, 1, :] * wx
    return top * (1 - wy) + bot * wy


def v_onehot(image, flow, band=32):
    """Hat-function contraction, blocked over output row bands.

    For an output row band [r, r+bh), source rows live in [r-D, r+bh+D)
    (D-bounded flow assumed; exact when |sy - y| < D). The y-contraction is
    a dense [bh*W, rows] x [rows, W*C] matmul (MXU); the x-contraction uses
    hat weights over a full row (exact, no x bound) as a batched reduce.
    """
    b, h, w, c = image.shape
    d = band // 2
    sx, sy = src_coords(image, flow)
    bh = 8
    nb = h // bh
    rows = bh + 2 * d

    pad = jnp.pad(image, ((0, 0), (d, d), (0, 0), (0, 0)))

    def band_out(bi):
        r0 = bi * bh
        slab = jax.lax.dynamic_slice(
            pad, (0, r0, 0, 0), (b, rows, w, c))          # [B, rows, W, C]
        sy_b = jax.lax.dynamic_slice(sy, (0, r0, 0), (b, bh, w))
        sx_b = jax.lax.dynamic_slice(sx, (0, r0, 0), (b, bh, w))
        # hat over y: [B, bh*W, rows]
        yy = (jnp.arange(rows, dtype=sy.dtype) + (r0 - d))[None, None, :]
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(
            sy_b.reshape(b, bh * w, 1) - yy)).astype(image.dtype)
        tmp = jnp.einsum("bpr,brwc->bpwc", haty,
                         slab, preferred_element_type=jnp.float32)
        # hat over x: [B, bh*W, W]
        xx = jnp.arange(w, dtype=sx.dtype)[None, None, :]
        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(
            sx_b.reshape(b, bh * w, 1) - xx)).astype(tmp.dtype)
        out = jnp.einsum("bpw,bpwc->bpc", hatx, tmp)
        return out.reshape(b, bh, w, c).astype(image.dtype)

    outs = jax.lax.map(band_out, jnp.arange(nb))          # [nb, B, bh, W, C]
    return jnp.moveaxis(outs, 0, 1).reshape(b, h, w, c)


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    print(f"device: {jax.devices()[0]}", flush=True)

    # the real call sites at batch 12 x T 5 (folded): decoder skip resample
    # [60,32,64,64] / [60,16,32,128], generator bottleneck warp [60,16,32,256],
    # full-res previews/warped-loss [60,128,256,3]; plus one stress shape.
    shapes = [((60, 32, 64, 64), jnp.bfloat16),
              ((60, 16, 32, 256), jnp.bfloat16),
              ((60, 128, 256, 3), jnp.float32),
              ((60, 128, 256, 64), jnp.bfloat16)]
    from c2m_tpu.ops.warp import _resample_onehot

    variants = [("copy", v_copy), ("vmap_take", v_vmap_take),
                ("flat_take", v_flat_take), ("patch22", v_patch22),
                ("onehot", v_onehot),
                ("onehot_exact", lambda i, f: _resample_onehot(i, f))]
    key = jax.random.PRNGKey(0)
    for shape, dtype in shapes:
        img = jax.random.normal(key, shape, dtype)
        flow = jax.random.normal(key, (*shape[:3], 2), jnp.float32) * 4.0
        print(f"shape {shape} {dtype.__name__}:", flush=True)
        for name, op in variants:
            try:
                t = slope(fused_factory(op), img, flow)
                gb = img.size * img.dtype.itemsize * 5 / 1e9
                print(f"  {name:10s} {t:8.2f} ms   ({gb / (t / 1e3):6.1f} GB/s eff)",
                      flush=True)
            except Exception as e:  # noqa
                print(f"  {name:10s} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
