#!/usr/bin/env python
"""Layer-level micro-bench (slope protocol): the decoder/generator's
building blocks at the 60-frame folded batch, to locate non-FLOPs time
(relayouts, pads, norms)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K_SMALL, K_BIG, REPEATS = 2, 10, 3


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
    from c2m_tpu.nn.layers import (BatchNorm, Conv, Conv3d, InstanceNorm,
                                   SameBlock3d, UpBlock2d)
    from c2m_tpu.ops.warp import resize_bilinear
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    def bench_module(name, mod, x, train=None):
        vs = mod.init(key, x) if train is None else mod.init(key, x, train)
        if train is None:
            fn = lambda xi: mod.apply(vs, xi)                     # noqa: E731
        else:
            fn = lambda xi: mod.apply(vs, xi, train)              # noqa: E731
        print(f"  {name:34s} {slope(fn, x):8.2f} ms", flush=True)

    bf = jnp.bfloat16
    # decoder final stages operate at [12,5,...] (3D) / [60,...] (2D folded)
    x3_full = jax.random.normal(key, (12, 5, 128, 256, 34), bf)
    x3_half = jax.random.normal(key, (12, 5, 64, 128, 66), bf)
    x2_half = jax.random.normal(key, (60, 64, 128, 34), bf)
    x2_full = jax.random.normal(key, (60, 128, 256, 32), bf)

    bench_module("SameBlock3d 34ch @128x256 (x60)",
                 SameBlock3d(32, 3, 1, 1, dtype=bf), x3_full, False)
    bench_module("SameBlock3d 66ch @64x128 (x60)",
                 SameBlock3d(64, 3, 1, 1, dtype=bf), x3_half, False)
    bench_module("Conv3d only 34ch @128x256",
                 Conv3d(32, 3, 1, 1, dtype=bf), x3_full)
    bench_module("UpBlock2d 34->32 @64->128",
                 UpBlock2d(32, 3, 1, 1, dtype=bf), x2_half, False)
    bench_module("Conv 3x3 reflect 32ch @128x256",
                 Conv(32, 3, 1, 1, "reflect", dtype=bf), x2_full)
    bench_module("Conv 3x3 zeros 32ch @128x256",
                 Conv(32, 3, 1, 1, "zeros", dtype=bf), x2_full)
    bench_module("InstanceNorm @128x256x32",
                 InstanceNorm(), x2_full)
    bench_module("BatchNorm(eval) @128x256x32",
                 BatchNorm(), x2_full, False)

    print(f"  {'resize2x 64->128 (shift path)':34s} "
          f"{slope(lambda x: resize_bilinear(x, (128, 256)), x2_half):8.2f} ms",
          flush=True)

    # 7x7 generator stem at full res
    bench_module("Conv 7x7 reflect 3->32 @128x256",
                 Conv(32, 7, 1, 3, "reflect", dtype=bf),
                 jax.random.normal(key, (60, 128, 256, 3), bf))


if __name__ == "__main__":
    main()
