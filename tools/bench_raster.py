#!/usr/bin/env python
"""Rasterizer micro-bench on the real TPU (slope protocol): the separable
MXU path (axis-aligned GT thetas, the reference's test-time setting) vs the
general-affine vmapped-gather path, at the batch-12 operating point."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K_SMALL, K_BIG, REPEATS = 2, 10, 3
B, N, T, H, W = 12, 8, 5, 128, 256
if "--big" in sys.argv:
    # the 512x1024 long-horizon general path: quadratic pallas kernel is
    # size-gated off; auto routes to the banded window kernel
    # (ops/pallas/maskwarp_banded.py) with the gather as its cond fallback
    B, N, T, H, W = 1, 24, 10, 512, 1024
    K_SMALL, K_BIG = 2, 6


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


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from c2m_tpu.ops.raster import generate_sparse_motion
    print(f"device: {jax.devices()[0]}", flush=True)

    key = jax.random.PRNGKey(0)
    inst = jnp.zeros((B, H, W, 1))
    for k in range(N):
        x1, y1 = 16 + 28 * k, 24 + 8 * (k % 3)
        inst = inst.at[:, y1:y1 + 20, x1:x1 + 24, 0].set(26000.0 + k + 1)
    inst_ids = jnp.broadcast_to(
        jnp.arange(1, N + 1, dtype=jnp.int32)[None] + 26000, (B, N))
    node_mask = jnp.ones((B, N), bool)
    thetas = jnp.zeros((B, N, T, 6))
    thetas = thetas.at[..., 0].set(1.0).at[..., 4].set(1.0)
    thetas = thetas.at[..., 2].set(
        jax.random.uniform(key, (B, N, T), minval=-0.05, maxval=0.05))
    big = "--big" in sys.argv
    shear = thetas.at[..., 1].set(
        jax.random.uniform(jax.random.fold_in(key, 1), (B, N, T),
                           minval=-0.02, maxval=0.02)).at[..., 3].set(
        jax.random.uniform(jax.random.fold_in(key, 2), (B, N, T),
                           minval=-0.02, maxval=0.02))

    def factory(axis_aligned, use_pallas):
        def make(k):
            @jax.jit
            def fused(seed, th):
                acc = 0.0
                for i in range(k):
                    s = jax.random.fold_in(seed, i)
                    ti = th.at[..., 2].add(
                        jax.random.uniform(s, (), maxval=1e-3))
                    out = generate_sparse_motion(inst, inst_ids, node_mask,
                                                 ti, compute_fw=True,
                                                 axis_aligned=axis_aligned,
                                                 use_pallas=use_pallas)
                    acc = acc + out["sparse_motion_bw"].mean() + \
                        out["sparse_occ_bw"].mean()
                return acc
            return fused
        return make

    if big:
        # the quadratic kernel (use_pallas=True) is intentionally absent:
        # O((H*W)^2) at this size. General runs use true shear terms.
        variants = [("separable(MXU)", True, None, thetas),
                    ("general(banded)", False, None, shear),
                    ("general(gather)", False, False, shear)]
    else:
        # auto (None) == the quadratic hat contraction at 128x256 (measured
        # faster than banded here: 38.2 vs 44.4 ms — per-tile window DMAs
        # dominate at small maps; use_pallas=True pins quad explicitly)
        variants = [("separable(MXU)", True, None, thetas),
                    ("general(quad)", False, True, shear),
                    ("general(gather)", False, False, shear)]
    for name, aa, up, th in variants:
        t = slope(factory(aa, up), th)
        print(f"  {name:16s} {t:8.2f} ms", flush=True)

    if not big:
        # the banded window kernel, benched directly (not the default route
        # at this size — kept measured so the negative stays honest)
        from c2m_tpu.ops.pallas import maskwarp_banded as mb

        def make_banded(k):
            @jax.jit
            def fused(seed, th):
                acc = 0.0
                for i in range(k):
                    s = jax.random.fold_in(seed, i)
                    ti = th.at[..., 2].add(
                        jax.random.uniform(s, (), maxval=1e-3))
                    obj = (inst[:, None, :, :, 0] ==
                           inst_ids[:, :, None, None].astype(inst.dtype))
                    yb, xb, _ = mb.plan_windows(
                        ti.reshape(B * N, T, 6).astype(jnp.float32), H, W)
                    acc = acc + mb.warp_masks(obj.astype(ti.dtype), ti,
                                              yb, xb).mean()
                return acc
            return fused

        t = slope(make_banded, shear)
        print(f"  {'kernel(banded)':16s} {t:8.2f} ms   "
              f"(direct; not the default route at this size)", flush=True)


if __name__ == "__main__":
    main()
