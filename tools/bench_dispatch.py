#!/usr/bin/env python
"""Test whether full-inference time is per-call dispatch overhead: compare
one inference per jit call vs K inferences fused in one jit."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    b, n = 4, 8
    cfg = _flagship_cfg(h=128, w=256, batch=b, max_objects=n, dtype="bfloat16")
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    click = jax.nn.one_hot(jnp.zeros((b,), jnp.int32), n)

    def one(v, bt, z, c):
        return model.apply(v, bt, z, c, method="inference",
                           rngs={"sample": key})["generated"]

    K = 8
    @jax.jit
    def fused(v, bt, c, seed):
        acc = 0.0
        for i in range(K):
            z = jax.random.normal(jax.random.fold_in(seed, i), (b, 1024))
            acc = acc + one(v, bt, z, c).mean()
        return acc

    single = jax.jit(one)
    z = jax.random.normal(key, (b, 1024))
    for _ in range(2):
        single(variables, batch, z, click).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        out = single(variables, batch, z, click)
    out.block_until_ready()
    t_single = (time.perf_counter() - t0) / 10 * 1000
    print(f"single-call: {t_single:.1f} ms", flush=True)

    for _ in range(2):
        fused(variables, batch, click, key).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        out = fused(variables, batch, click, key)
    out.block_until_ready()
    t_fused = (time.perf_counter() - t0) / 5 / K * 1000
    print(f"fused {K}-in-1: {t_fused:.1f} ms per inference", flush=True)

if __name__ == "__main__":
    main()
