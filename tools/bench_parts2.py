#!/usr/bin/env python
"""Per-submodule inference profile using the trustworthy slope protocol.

Replaces tools/bench_parts.py (which used bare ``block_until_ready`` —
invalid through the axon tunnel, see STATUS.md round-2 notes). For every
part we build a K-times-fused jitted loop whose input VARIES per iteration
(seed fold-in), FETCH the scalar result, and report the slope between a
short and a long fused loop: (t_big - t_small) / (K_big - K_small).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 12
H, W = 128, 256
K_SMALL, K_BIG = 2, 12
REPEATS = 3


def slope(make_fused, *args):
    """make_fused(k) -> jitted fn(seed, *args) returning a scalar."""
    fs, fb = make_fused(K_SMALL), make_fused(K_BIG)

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(jax.random.PRNGKey(seed), *args))
        return time.perf_counter() - t0

    timed(fs, 0)
    timed(fb, 0)
    ts = min(timed(fs, 1 + r) for r in range(REPEATS))
    tb = min(timed(fb, 100 + r) for r in range(REPEATS))
    return (tb - ts) / (K_BIG - K_SMALL) * 1e3  # ms per call


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    cfg = _flagship_cfg(h=H, w=W, batch=BATCH, max_objects=8, dtype="bfloat16")
    t = cfg.train_params.num_predicted_frames
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    print(f"device: {jax.devices()[0]}  batch={BATCH} {H}x{W} bf16", flush=True)

    def jitter(bt, s):
        """Vary everything the graph depends on, so no sub-network is CSE'd
        across the fused iterations (video -> appearance/GNN/previews;
        thetas -> raster/splat)."""
        out = dict(bt)
        out["video"] = bt["video"] + jax.random.uniform(s, (), minval=0.0,
                                                        maxval=1e-3)
        out["targets_theta"] = bt["targets_theta"].at[..., 2].add(
            jax.random.uniform(s, (), maxval=1e-4))
        return out

    # --- full inference ---
    click = jax.nn.one_hot(jnp.zeros((BATCH,), jnp.int32),
                           cfg.dataset_params.max_objects)

    def full_factory(k):
        @jax.jit
        def fused(seed, v, bt):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                z = jax.random.normal(s, (BATCH, 1024))
                out = model.apply(v, jitter(bt, s), z, click,
                                  method="inference", rngs={"sample": seed})
                acc = acc + out["generated"].mean()
            return acc
        return fused

    print(f"full inference: {slope(full_factory, variables, batch):8.2f} ms",
          flush=True)

    # --- appearance encoder ---
    def app_factory(k):
        @jax.jit
        def fused(seed, v, bt):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                out = model.apply(v, jitter(bt, s), False,
                                  method=lambda m, b_, tr: m._appearance(b_, tr))
                acc = acc + out["app_encoded"].astype(jnp.float32).mean()
            return acc
        return fused

    print(f"appearance:     {slope(app_factory, variables, batch):8.2f} ms",
          flush=True)

    # --- sparse feature encoder ---
    sm = jax.random.normal(key, (BATCH, t, H, W, 2), jnp.bfloat16)

    def senc_factory(k):
        @jax.jit
        def fused(seed, v, x):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                xi = x + jax.random.uniform(s, (), dtype=jnp.bfloat16,
                                            maxval=1e-2)
                out = model.apply(v, xi, method=lambda m, x_: (
                    m.sparse_feature_encoder(x_, train=False)))
                acc = acc + out["enco_sparse_0"].astype(jnp.float32).mean()
            return acc
        return fused

    print(f"sparse_encoder: {slope(senc_factory, variables, sm):8.2f} ms",
          flush=True)

    # --- dense decoder ---
    app = jax.jit(lambda v, bt: model.apply(
        v, bt, False, method=lambda m, b_, tr: m._appearance(b_, tr)))(
            variables, batch)
    sfeat = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, x_: m.sparse_feature_encoder(x_, train=False)))(
            variables, sm)
    occ = jnp.ones((BATCH, t, H, W, 1))
    z = jax.random.normal(key, (BATCH, t, H // 64, W // 64, 528), jnp.bfloat16)

    def dec_factory(k):
        @jax.jit
        def fused(seed, v, app_, sf_, sm_, occ_, z_):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                zi = z_ + jax.random.uniform(s, (), dtype=z_.dtype, maxval=1e-2)
                out = model.apply(v, app_, sf_, sm_, occ_, zi,
                                  method=lambda m, *a: m.dense_generator_bw(
                                      *a, train=False))
                acc = acc + out["dense_motion"].mean()
            return acc
        return fused

    print(f"decoder:        {slope(dec_factory, variables, app, sfeat, sm.astype(jnp.float32), occ, z):8.2f} ms",
          flush=True)

    # --- generator ---
    ff = jnp.zeros((BATCH * t, H, W, 3), jnp.float32)
    flow = jax.random.normal(key, (BATCH * t, H, W, 2)) * 4.0
    gocc = jnp.ones((BATCH * t, H, W, 1))

    def gen_factory(k):
        @jax.jit
        def fused(seed, v, ff_, fl_, oc_):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                fi = fl_ + jax.random.uniform(s, (), maxval=1e-2)
                out = model.apply(v, ff_, fi, oc_, False,
                                  method=lambda m, *a: m.generator(*a))
                acc = acc + out.mean()
            return acc
        return fused

    print(f"generator:      {slope(gen_factory, variables, ff, flow, gocc):8.2f} ms",
          flush=True)

    # --- raster + GNN (motion front-end): full inference minus the above
    # is attributable to VAE heads, raster, GNN, and glue.


if __name__ == "__main__":
    main()
