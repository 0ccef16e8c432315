#!/usr/bin/env python
"""Bisect inference time across submodules + batch sizes (run on the TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    b, n, t, h, w = 4, 8, 5, 128, 256
    cfg = _flagship_cfg(h=h, w=w, batch=b, max_objects=n, dtype="bfloat16")
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    print(f"device: {jax.devices()[0]}", flush=True)

    # appearance encoder alone
    @jax.jit
    def appearance(v, bt):
        return model.apply(v, bt, False,
                           method=lambda m, bt, tr: m._appearance(bt, tr))
    print(f"appearance: {timeit(appearance, variables, batch):.2f} ms", flush=True)

    # sparse feature encoder alone
    sm = jax.random.normal(key, (b, t, h, w, 2), jnp.bfloat16)

    @jax.jit
    def sparse_enc(v, x):
        return model.apply(v, x, method=lambda m, x: m.sparse_feature_encoder(
            x, train=False))
    print(f"sparse_encoder: {timeit(sparse_enc, variables, sm):.2f} ms", flush=True)

    # dense decoder alone (synthetic inputs at the right shapes)
    app = appearance(variables, batch)
    sparse_feats = sparse_enc(variables, sm)
    occ = jnp.ones((b, t, h, w, 1))
    z = jax.random.normal(key, (b, t, h // 64, w // 64, 528), jnp.bfloat16)

    @jax.jit
    def decoder(v, app, sf, sm_, occ_, z_):
        return model.apply(v, app, sf, sm_, occ_, z_,
                           method=lambda m, *a: m.dense_generator_bw(
                               *a, train=False))
    print(f"decoder: {timeit(decoder, variables, app, sparse_feats, sm.astype(jnp.float32), occ, z):.2f} ms",
          flush=True)

    # full inference at batch 4 and 12
    for bsz in (4, 12):
        cfg_b = _flagship_cfg(h=h, w=w, batch=bsz, max_objects=n,
                              dtype="bfloat16")
        model_b = C2MGenerator(cfg_b)
        batch_b = {k: jnp.asarray(v) for k, v in make_batch(cfg_b, seed=0).items()}
        vb = model_b.init({"params": key, "sample": key}, batch_b, train=False)
        z_m = jax.random.normal(key, (bsz, 1024))
        click = jax.nn.one_hot(jnp.zeros((bsz,), jnp.int32), n)

        @jax.jit
        def infer(v, bt, zz, cc):
            return model_b.apply(v, bt, zz, cc, method="inference",
                                 rngs={"sample": key})["generated"]
        ms = timeit(infer, vb, batch_b, z_m, click, iters=10)
        print(f"full inference b={bsz}: {ms:.2f} ms -> "
              f"{bsz * t / ms * 1000:.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
