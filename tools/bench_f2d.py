#!/usr/bin/env python
"""Frames-to-depth (f2d) conv reformulation microbench.

The time-folded hot tensors [B*T, H, W, C<=32] pay a 4x lane-padding tax
and under-fill the MXU contraction (32 of 128 lanes). Space-to-depth fixes
both but needs phase-corrected boundary machinery and LOSES at 128x256
(tools/bench_s2d.py). f2d groups G folded frames into channels instead:

    [B*T, H, W, C] -> [B*T/G, H, W, G*C]

and runs ONE conv with a block-diagonal kernel [k, k, G*C, G*Co] (frame
independence = exact; structural zeros = G x FLOPs like s2d-single, but
padding stays a plain spatial pad and InstanceNorm stats are exact with no
reshape shim). This tool measures whether trading those FLOPs for lane
occupancy pays at the 128x256 and 512x1024 hot shapes.

  python tools/bench_f2d.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K_SMALL, K_BIG, REPEATS = 2, 12, 3


def slope(op, *args):
    def make(k):
        @jax.jit
        def fused(seed, *a):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                ai = [a[0] + jax.random.uniform(s, (), dtype=a[0].dtype,
                                                maxval=1e-3), *a[1:]]
                acc = acc + op(*ai).astype(jnp.float32).mean()
            return acc
        return fused

    fs, fb = make(K_SMALL), make(K_BIG)

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(jax.random.PRNGKey(seed), *args))
        return time.perf_counter() - t0

    timed(fs, 0)
    timed(fb, 0)
    ts = min(timed(fs, 1 + r) for r in range(REPEATS))
    tb = min(timed(fb, 100 + r) for r in range(REPEATS))
    return (tb - ts) / (K_BIG - K_SMALL) * 1e3


from c2m_tpu.nn.f2d import blockdiag_kernel, from_f2d, to_f2d  # noqa: E402


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from c2m_tpu.nn.layers import _pad_spatial
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    cases = [  # (BT, H, W, Cin, Cout, k, mode, G)
        (60, 128, 256, 32, 32, 3, "reflect", 4),
        (60, 128, 256, 32, 64, 3, "reflect", 4),
        (60, 128, 256, 64, 32, 3, "reflect", 2),
        (60, 128, 256, 96, 32, 3, "reflect", 4),   # decoder i=4 @128x256
        (60, 128, 256, 3, 32, 7, "reflect", 4),    # generator first
        (60, 128, 256, 32, 3, 7, "zeros", 4),      # generator final
        (10, 512, 1024, 32, 32, 3, "reflect", 2),
        (10, 512, 1024, 96, 32, 3, "reflect", 2),  # decoder i=4 up conv
        (10, 256, 512, 192, 64, 3, "reflect", 2),  # decoder i=3 up conv
    ]
    for bt, h, w_, cin, cout, k, mode, g in cases:
        x = jax.random.normal(key, (bt, h, w_, cin), dt)
        wk = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.1

        def plain(xi):
            xp = _pad_spatial(xi, [(k // 2,) * 2, (k // 2,) * 2],
                              mode if mode != "zeros" else "constant")
            return jax.lax.conv_general_dilated(
                xp, wk.astype(dt), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        xf = to_f2d(x, g)
        kk = blockdiag_kernel(wk.astype(dt), g)

        def f2d(si):
            sp = _pad_spatial(si, [(k // 2,) * 2, (k // 2,) * 2],
                              mode if mode != "zeros" else "constant")
            return jax.lax.conv_general_dilated(
                sp, kk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def f2d_grouped(si):
            sp = _pad_spatial(si, [(k // 2,) * 2, (k // 2,) * 2],
                              mode if mode != "zeros" else "constant")
            return jax.lax.conv_general_dilated(
                sp, jnp.concatenate([wk.astype(dt)] * g, axis=-1),
                (1, 1), "VALID", feature_group_count=g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def inclusive(xi):
            return from_f2d(f2d(to_f2d(xi, g)), g)

        t_plain = slope(plain, x)
        t_f2d = slope(f2d, xf)
        try:
            t_grp = slope(f2d_grouped, xf)
        except Exception:
            t_grp = float("nan")
        t_incl = slope(inclusive, x)
        print(f"  [{bt},{h},{w_},{cin}]->{cout} k{k} {mode:8s} G{g} "
              f"plain {t_plain:7.2f}   f2d {t_f2d:7.2f}   "
              f"grouped {t_grp:7.2f}   f2d+conv {t_incl:7.2f}   "
              f"(plain/f2d {t_plain / max(t_f2d, 1e-9):.2f}x, "
              f"incl {t_plain / max(t_incl, 1e-9):.2f}x)", flush=True)

    # chained: conv->relu x3 staying in one form
    for bt, h, w_, c, g in [(60, 128, 256, 32, 4), (10, 512, 1024, 32, 2)]:
        x = jax.random.normal(key, (bt, h, w_, c), dt)
        ws = [jax.random.normal(jax.random.fold_in(key, i),
                                (3, 3, c, c), jnp.float32) * 0.1
              for i in range(3)]

        def chain_plain(xi):
            y = xi
            for wi in ws:
                yp = _pad_spatial(y, [(1, 1), (1, 1)], "reflect")
                y = jax.nn.relu(jax.lax.conv_general_dilated(
                    yp, wi.astype(dt), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return y

        kks = [blockdiag_kernel(wi.astype(dt), g) for wi in ws]

        def chain_f2d(xi):
            y = to_f2d(xi, g)
            for kk in kks:
                yp = _pad_spatial(y, [(1, 1), (1, 1)], "reflect")
                y = jax.nn.relu(jax.lax.conv_general_dilated(
                    yp, kk, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return from_f2d(y, g)

        t_p = slope(chain_plain, x)
        t_f = slope(chain_f2d, x)
        print(f"  chain3 [{bt},{h},{w_},{c}] G{g} k3 reflect  "
              f"plain {t_p:7.2f}   f2d {t_f:7.2f}   "
              f"({t_p / max(t_f, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
