#!/usr/bin/env python
"""Micro-benchmarks of the core ops + full inference on the current device.

Identifies where inference time goes (rasterizer gathers? splat scatter?
resample? conv stacks?) to target Pallas work. Prints ms/call for each op at
the flagship operating point.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from c2m_tpu.ops.raster import generate_sparse_motion
    from c2m_tpu.ops.splat import occlusion_map
    from c2m_tpu.ops.warp import resample

    b, n, t, h, w = 4, 8, 5, 128, 256
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (b * t, h, w, 32))
    flow = jax.random.normal(key, (b * t, h, w, 2)) * 4
    print(f"device: {jax.devices()[0]}")

    r = jax.jit(resample)
    print(f"resample [B*T={b*t},{h},{w},32]: {timeit(r, img, flow):.2f} ms")

    o = jax.jit(occlusion_map)
    print(f"occlusion_map [B*T={b*t},{h},{w}]: {timeit(o, flow):.2f} ms")

    instance = np.zeros((b, h, w, 1), np.float32)
    instance[:, 30:60, 40:90, 0] = 26001
    instance[:, 70:100, 150:220, 0] = 24002
    inst_ids = np.tile(np.array([26001, 24002] + [0] * (n - 2), np.int32), (b, 1))
    thetas = np.tile(np.array([1, 0, 0.1, 0, 1, 0.05], np.float32), (b, n, t, 1))
    g = jax.jit(lambda i, ids, m, th: generate_sparse_motion(i, ids, m, th))
    print(f"raster [B={b},N={n},T={t},{h},{w}]: "
          f"{timeit(g, jnp.asarray(instance), jnp.asarray(inst_ids), jnp.asarray(inst_ids != 0), jnp.asarray(thetas)):.2f} ms")

    # full inference
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel
    cfg = _flagship_cfg(h=h, w=w, batch=b, max_objects=n, dtype="bfloat16")
    model = C2MTrainModel(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    z_m = jax.random.normal(key, (b, 1024))
    click = jax.nn.one_hot(jnp.zeros((b,), jnp.int32), n)

    @jax.jit
    def infer(v, bt, z, c):
        return model.apply(v, bt, z, c, method="inference",
                           rngs={"sample": jax.random.PRNGKey(3)})["generated"]

    ms = timeit(infer, variables, batch, z_m, click, iters=20)
    print(f"full inference [B={b}]: {ms:.2f} ms -> "
          f"{b * cfg.train_params.num_predicted_frames / ms * 1000:.1f} frames/s")

    # inference without rasterizer cost: time the generator alone
    gen_in = jax.random.normal(key, (b * t, h, w, 3))
    gflow = jax.random.normal(key, (b * t, h, w, 2))
    gocc = jax.nn.sigmoid(jax.random.normal(key, (b * t, h, w, 1)))

    @jax.jit
    def gen_only(v, x, f, o):
        return model.apply(v, x, f, o, method=lambda m, *a: m.c2m.generator(*a, train=False))
    try:
        ms = timeit(gen_only, variables, gen_in, gflow, gocc)
        print(f"generator alone [B*T={b*t}]: {ms:.2f} ms")
    except Exception as e:
        print(f"generator-alone bench skipped: {e}")


if __name__ == "__main__":
    main()
