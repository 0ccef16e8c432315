#!/usr/bin/env python
"""Splat micro-bench on the real TPU: XLA scatter-add vs the Pallas MXU
hat-contraction kernel (slope protocol), at the raster's occlusion shapes."""

import os
import sys
import time

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


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from c2m_tpu.ops import splat
    print(f"device: {jax.devices()[0]}", flush=True)

    for shape in [(60, 128, 256, 2), (10, 512, 1024, 2)]:
        flow = jax.random.normal(jax.random.PRNGKey(0), shape) * 6.0

        def factory(use_pallas):
            def make(k):
                @jax.jit
                def fused(seed, f):
                    acc = 0.0
                    for i in range(k):
                        s = jax.random.fold_in(seed, i)
                        fi = f + jax.random.uniform(s, (), maxval=1e-3)
                        acc = acc + splat.occlusion_map(
                            fi, use_pallas=use_pallas).mean()
                    return acc
                return fused
            return make

        print(f"shape {shape}:", flush=True)
        for name, up in [("scatter", False), ("pallas", True)]:
            try:
                t = slope(factory(up), flow)
                print(f"  {name:8s} {t:8.2f} ms", flush=True)
            except Exception as e:  # noqa
                print(f"  {name:8s} FAILED: {type(e).__name__}: {e}",
                      flush=True)

        # parity on device
        a = splat.occlusion_map(flow[:2], use_pallas=False)
        b = splat.occlusion_map(flow[:2], use_pallas=True)
        print(f"  parity max err: {float(jnp.abs(a - b).max()):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
