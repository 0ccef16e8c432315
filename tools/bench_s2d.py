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
        (10, 512, 1024, 96, 32, 3, "reflect"),  # decoder pyr i=4 up conv
        (10, 256, 512, 192, 64, 3, "reflect"),  # decoder pyr i=3 up conv
        (10, 256, 512, 64, 128, 3, "reflect"),  # generator mid shapes
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

        def packed1(si):
            return s2d.conv_s2d_single(si, wk, bias, k // 2, mode, dtype=dt)

        def inclusive(xi):
            # the realistic single-conv wiring: conversion passes included
            return s2d.from_s2d(
                s2d.conv_s2d_single(s2d.to_s2d(xi), wk, bias, k // 2, mode,
                                    dtype=dt))

        t_plain = slope(plain, x)
        t_s2d = slope(packed, s)
        t_s2d1 = slope(packed1, s)
        t_incl = slope(inclusive, x)
        print(f"  [{b},{h},{w_},{cin}]->{cout} k{k} {mode:8s} "
              f"plain {t_plain:7.2f} ms   s2d {t_s2d:7.2f} ms   "
              f"s2d1 {t_s2d1:7.2f} ms   s2d1+conv {t_incl:7.2f} ms   "
              f"(plain/s2d1 {t_plain / max(t_s2d1, 1e-9):.2f}x, "
              f"incl {t_plain / max(t_incl, 1e-9):.2f}x)", flush=True)

    # chained realism: conv -> relu -> conv -> relu -> conv entirely in one
    # form vs the other (one to_s2d at entry, one from_s2d at exit) — the
    # wiring a real s2d tail segment would use
    for b, h, w_, c in [(60, 128, 256, 32), (10, 512, 1024, 32)]:
        x = jax.random.normal(key, (b, h, w_, c), dt)
        ws = [jax.random.normal(jax.random.fold_in(key, i),
                                (3, 3, c, c), jnp.float32) * 0.1
              for i in range(3)]
        bias = jnp.zeros((c,), jnp.float32)

        def chain_plain(xi):
            y = xi
            for wi in ws:
                yp = _pad_spatial(y, [(1, 1), (1, 1)], "reflect")
                y = jax.nn.relu(jax.lax.conv_general_dilated(
                    yp, wi.astype(dt), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return y

        def chain_s2d(xi):
            y = s2d.to_s2d(xi)
            for wi in ws:
                y = jax.nn.relu(
                    s2d.conv_s2d_single(y, wi, bias, 1, "reflect", dtype=dt))
            return s2d.from_s2d(y)

        t_p = slope(chain_plain, x)
        t_s = slope(chain_s2d, x)
        print(f"  chain3 [{b},{h},{w_},{c}] k3 reflect  "
              f"plain {t_p:7.2f} ms   s2d1 {t_s:7.2f} ms   "
              f"({t_p / max(t_s, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
