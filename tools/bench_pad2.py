#!/usr/bin/env python
"""Compare output-assembly strategies for the implicit reflect-pad conv at
the hot shape (value-fetch slope protocol). bench.py regressed 790->655 f/s
with the DUS strip replacement (xla_bytes 42.6->56.6 GB): are the DUS
updates copying? Which assembly is cheapest?

  reflect : jnp.pad(reflect) -> VALID conv            (the old explicit path)
  zeropad : jnp.pad(zeros) -> VALID conv              (floor: pad folds in)
  dus     : zero conv + strip recompute + 4x dynamic_update_slice
  addpad  : zero conv + border contributions padded full-size and added
            (pads fuse into the add epilogue; border sum order differs)

  python tools/bench_pad2.py
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

    B, H, W, CIN, COUT = 60, 128, 256, 32, 32
    K_SMALL, K_BIG = 2, 10

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, H, W, CIN), jnp.bfloat16)
    wgt = jax.random.normal(key, (3, 3, CIN, COUT), jnp.bfloat16) * 0.05

    def conv(x, padding="VALID"):
        return jax.lax.conv_general_dilated(
            x, wgt, (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def one_reflect(x):
        return conv(jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                            mode="reflect"))

    def one_zeropad(x):
        return conv(jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)]))

    def strips(x):
        wp = lambda s: jnp.pad(s, [(0, 0), (0, 0), (1, 1), (0, 0)],
                               mode="reflect")
        hp = lambda s: jnp.pad(s, [(0, 0), (1, 1), (0, 0), (0, 0)],
                               mode="reflect")
        top = conv(wp(jnp.concatenate([x[:, 1:0:-1], x[:, :2]], 1)))
        bot = conv(wp(jnp.concatenate([x[:, -2:], x[:, -2:-3:-1]], 1)))
        left = conv(hp(jnp.concatenate([x[:, :, 1:0:-1], x[:, :, :2]], 2)))
        right = conv(hp(jnp.concatenate([x[:, :, -2:], x[:, :, -2:-3:-1]], 2)))
        return top, bot, left, right

    def one_dus(x):
        y = one_zeropad(x)
        top, bot, left, right = strips(x)
        y = jax.lax.dynamic_update_slice(y, top, (0, 0, 0, 0))
        y = jax.lax.dynamic_update_slice(y, bot, (0, H - 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, left, (0, 0, 0, 0))
        y = jax.lax.dynamic_update_slice(y, right, (0, 0, W - 1, 0))
        return y

    def one_addpad(x):
        # contributions of the reflected 1-px frame only (difference vs the
        # zero pad), as 1D convs, padded full-size; the pads+adds fuse into
        # the conv epilogue
        y = one_zeropad(x)

        def conv_w(row, taps):  # row [B, W, C] x taps [3, C, F], reflect pad
            r = jnp.pad(row, [(0, 0), (1, 1), (0, 0)], mode="reflect")
            return jax.lax.conv_general_dilated(
                r, taps, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"))

        def conv_h(col, taps):  # col [B, H, C] x taps [3, C, F], zero pad
            return jax.lax.conv_general_dilated(
                col, taps, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))

        top = conv_w(x[:, 1], wgt[0])          # contributes to out row 0
        bot = conv_w(x[:, -2], wgt[2])
        left = conv_h(x[:, :, 1], wgt[:, 0])   # corners excluded: zero pad
        right = conv_h(x[:, :, -2], wgt[:, 2])
        border = (
            jnp.pad(top[:, None], [(0, 0), (0, H - 1), (0, 0), (0, 0)])
            + jnp.pad(bot[:, None], [(0, 0), (H - 1, 0), (0, 0), (0, 0)])
            + jnp.pad(left[:, :, None], [(0, 0), (0, 0), (0, W - 1), (0, 0)])
            + jnp.pad(right[:, :, None], [(0, 0), (0, 0), (W - 1, 0), (0, 0)]))
        return y + border

    variants = {"reflect": one_reflect, "zeropad": one_zeropad,
                "dus": one_dus, "addpad": one_addpad}

    # correctness cross-check first (bf16 inputs as benched)
    ref = jax.jit(lambda x: variants["reflect"](x))(x0).astype(jnp.float32)
    for name in ("dus", "addpad"):
        got = jax.jit(variants[name])(x0).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"{name} max err vs reflect: {err:.2e}", flush=True)

    def measure(fn):
        @partial(jax.jit, static_argnums=1)
        def fused(seed, kk):
            acc = jnp.zeros((), jnp.float32)
            for i in range(kk):
                s = jax.random.fold_in(seed, i)
                x = x0 + jax.random.uniform(s, (), dtype=jnp.bfloat16,
                                            maxval=1e-2)
                acc = acc + fn(x).astype(jnp.float32).mean()
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

    for name, fn in variants.items():
        print(f"{name:8s} {measure(fn):7.3f} ms/conv", flush=True)


if __name__ == "__main__":
    main()
