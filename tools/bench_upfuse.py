#!/usr/bin/env python
"""Fused upsample+conv (nn/s2d.fused_up_conv) vs the plain UpBlock chain
(resize_bilinear + reflect pad + conv) vs the old s2d path
(upsample2x_to_s2d + conv_s2d_single), at the decoder's hot up-stage shapes.

Slope protocol (STATUS round-2 notes): value-fetch, fresh input per
iteration, K=2 vs K=8 fused loops.

  python tools/bench_upfuse.py [--big]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_SMALL, K_BIG, REPEATS = 2, 8, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="512x1024 long-horizon shapes (10-frame batch)")
    args = ap.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from c2m_tpu.nn import s2d
    from c2m_tpu.ops.warp import resize_bilinear

    print(f"device: {jax.devices()[0]}", flush=True)

    if args.big:
        # long-horizon decoder pyramid (bench_dec_scales round-3 table):
        # i=3 conv @256x512 c192->64 (UpBlock input [10,128,256,192]);
        # i=4 conv @512x1024 c96->32 (input [10,256,512,96])
        cases = [((10, 128, 256, 192), 64),
                 ((10, 256, 512, 96), 32)]
    else:
        # 128x256 batch-12 decoder up stages (time-folded batch 60)
        cases = [((60, 32, 64, 192), 64),
                 ((60, 64, 128, 96), 32),
                 ((60, 16, 32, 384), 128)]

    dt = jnp.bfloat16

    def timed(fn, *arrs):
        def make(k):
            @jax.jit
            def fused(seed, *a):
                acc = jnp.zeros((), jnp.float32)
                for i in range(k):
                    s = jax.random.fold_in(seed, i)
                    eps = jax.random.uniform(s, (), dtype=dt, maxval=1e-3)
                    out = fn(*[x + eps for x in a])
                    acc = acc + out.mean().astype(jnp.float32)
                return acc
            return fused
        fs, fb = make(K_SMALL), make(K_BIG)

        def run(f, seed):
            t0 = time.perf_counter()
            float(f(jax.random.PRNGKey(seed), *arrs))
            return time.perf_counter() - t0

        run(fs, 0); run(fb, 0)
        ts = min(run(fs, 1 + r) for r in range(REPEATS))
        tb = min(run(fb, 100 + r) for r in range(REPEATS))
        return (tb - ts) / (K_BIG - K_SMALL) * 1e3

    for shape, co in cases:
        b, h, w, c = shape
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, dt)
        wk = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, c, co), jnp.float32) * 0.1)
        bias = jax.random.normal(jax.random.fold_in(key, 2), (co,),
                                 jnp.float32) * 0.1

        def plain(x, wk=wk, bias=bias):
            up = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                                 align_corners=False)
            up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")
            return jax.lax.conv_general_dilated(
                up, wk.astype(dt), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + \
                bias.astype(dt)

        def old_s2d(x, wk=wk, bias=bias):
            return s2d.conv_s2d_single(s2d.upsample2x_to_s2d(x), wk, bias,
                                       1, "reflect", dtype=dt)

        def fused(x, wk=wk, bias=bias):
            return s2d.fused_up_conv(x, wk, bias, "reflect", dtype=dt)

        def fused_plain(x, wk=wk, bias=bias):
            # for consumers that need the plain layout: fused conv + relayout
            return s2d.from_s2d(s2d.fused_up_conv(x, wk, bias, "reflect",
                                                  dtype=dt))

        t_plain = timed(plain, x)
        t_old = timed(old_s2d, x)
        t_fused = timed(fused, x)
        t_fp = timed(fused_plain, x)
        print(f"[{b},{h},{w},{c}]->{co} (out {2*h}x{2*w}): "
              f"plain {t_plain:7.2f} ms | s2d-old {t_old:7.2f} ms | "
              f"fused {t_fused:7.2f} ms ({t_plain / t_fused:4.2f}x) | "
              f"fused+from_s2d {t_fp:7.2f} ms ({t_plain / t_fp:4.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
