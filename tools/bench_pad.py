#!/usr/bin/env python
"""Measure the cost of the explicit reflect-pad materialization ahead of the
hot 3x3 convs (STATUS round-3: XLA counts 42.6 GB/inference vs the 18.9 GB
padded conv minimum — pads/norms/resizes are the gap).

Three variants per shape, value-fetch slope protocol (STATUS round-2 notes):
  reflect : jnp.pad(mode=reflect) -> VALID conv   (what nn/layers.Conv does)
  zeropad : jnp.pad(constant)     -> VALID conv   (XLA should fold into conv)
  inconv  : conv(padding=SAME)                    (no explicit pad op)

If reflect ~= zeropad ~= inconv, the pad copy is fused/free and the border-
correction rewrite is not worth building. If reflect >> inconv, an exact
"zero-pad conv + 1-px border fix" path pays.

  python tools/bench_pad.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    # (B, H, W, Cin, Cout): decoder/generator full- and half-res hot shapes
    shapes = [
        (60, 128, 256, 32, 32),
        (60, 128, 256, 64, 32),
        (60, 64, 128, 64, 64),
        (60, 32, 64, 128, 128),
    ]
    K_SMALL, K_BIG = 2, 16

    def run(mode, b, h, w, cin, cout, k):
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
        wgt = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05

        def conv_valid(x):
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def one(x):
            if mode == "reflect":
                xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                             mode="reflect")
                return conv_valid(xp)
            if mode == "zeropad":
                xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
                return conv_valid(xp)
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @partial(jax.jit, static_argnums=1)
        def fused(seed, kk):
            acc = jnp.zeros((), jnp.float32)
            for i in range(kk):
                s = jax.random.fold_in(seed, i)
                x = x0 + jax.random.uniform(s, (), dtype=jnp.bfloat16,
                                            maxval=1e-2)
                acc = acc + one(x).astype(jnp.float32).mean()
            return acc

        def timed(kk, seed):
            t0 = time.perf_counter()
            float(fused(jax.random.PRNGKey(seed), kk))
            return time.perf_counter() - t0

        float(fused(jax.random.PRNGKey(0), K_SMALL))
        float(fused(jax.random.PRNGKey(0), K_BIG))
        ts = min(timed(K_SMALL, 10 + s) for s in range(3))
        tb = min(timed(K_BIG, 20 + s) for s in range(3))
        return (tb - ts) / (K_BIG - K_SMALL) * 1e3

    print(f"{'shape':>24} {'reflect':>9} {'zeropad':>9} {'inconv':>9}"
          f"  (ms/call, slope K={K_SMALL}v{K_BIG})")
    for b, h, w, cin, cout in shapes:
        r = run("reflect", b, h, w, cin, cout, 3)
        z = run("zeropad", b, h, w, cin, cout, 3)
        c = run("inconv", b, h, w, cin, cout, 3)
        print(f"{str((b, h, w, cin, cout)):>24} {r:9.3f} {z:9.3f} {c:9.3f}",
              flush=True)


if __name__ == "__main__":
    main()
