#!/usr/bin/env python
"""Does lane-filling space-to-depth pay on the real chip? Micro-bench of
the s2d conv reformulation vs the plain path at the inference hot shapes
(roofline: full-res C<=32 stages are HBM-bound with a 4x lane-padding
tax). Slope protocol (STATUS round-2 doctrine)."""

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


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from c2m_tpu.nn import s2d
    from c2m_tpu.nn.layers import _pad_spatial
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    cases = [  # (B, H, W, Cin, Cout, k, mode) — the decoder/generator tail
        (60, 128, 256, 32, 32, 3, "reflect"),
        (60, 128, 256, 32, 64, 3, "reflect"),   # fused heads block
        (60, 128, 256, 3, 32, 7, "reflect"),    # generator first
        (60, 128, 256, 32, 3, 7, "zeros"),      # generator final
        (10, 512, 1024, 32, 32, 3, "reflect"),  # long-horizon tail
    ]
    for b, h, w_, cin, cout, k, mode in cases:
        x = jax.random.normal(key, (b, h, w_, cin), dt)
        wk = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.1
        bias = jnp.zeros((cout,), jnp.float32)

        def plain(xi):
            xp = _pad_spatial(xi, [(k // 2,) * 2, (k // 2,) * 2],
                              mode if mode != "zeros" else "constant")
            return jax.lax.conv_general_dilated(
                xp, wk.astype(dt), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        s = s2d.to_s2d(x)

        def packed(si):
            return s2d.conv_s2d(si, wk, bias, k // 2, mode, dtype=dt)

        t_plain = slope(plain, x)
        t_s2d = slope(packed, s)
        print(f"  [{b},{h},{w_},{cin}]->{cout} k{k} {mode:8s} "
              f"plain {t_plain:7.2f} ms   s2d {t_s2d:7.2f} ms   "
              f"({t_plain / max(t_s2d, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
