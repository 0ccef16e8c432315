#!/usr/bin/env python
"""Per-clip inference efficiency vs batch size (the reference's test batch is
12, c2m_journal_cityscapes.yaml:166). Round-1 recorded a 45% batch-12
per-clip regression with the broken block_until_ready timing; this re-measures
with the value-fetch slope protocol (STATUS.md round-2 notes).

  python tools/bench_batch_sweep.py [--batches 4 8 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch_size, h=128, w=256, k_small=2, k_big=12):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    cfg = _flagship_cfg(h=h, w=w, batch=batch_size, max_objects=8,
                        dtype="bfloat16")
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    click = jax.nn.one_hot(jnp.zeros((batch_size,), jnp.int32),
                           cfg.dataset_params.max_objects)

    def make_fused(k):
        @jax.jit
        def fused(v, bt, c, seed):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                z = jax.random.normal(s, (batch_size, 1024))
                # fresh conditioning AND thetas per iteration, and the
                # reference's test-time use_gt_eval=True — matching bench.py
                # (varying only z lets XLA CSE the batch-dependent front end
                # across the loop and invalidates the sweep)
                bt_i = dict(bt)
                bt_i["video"] = bt["video"] + jax.random.uniform(
                    s, (), dtype=bt["video"].dtype, maxval=1e-3)
                bt_i["targets_theta"] = bt["targets_theta"].at[..., 2].add(
                    jax.random.uniform(s, (), maxval=1e-4))
                acc = acc + model.apply(
                    v, bt_i, z, c, True, method="inference",
                    rngs={"sample": key})["generated"].mean()
            return acc
        return fused

    fs, fb = make_fused(k_small), make_fused(k_big)

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(variables, batch, click, jax.random.PRNGKey(seed)))
        return time.perf_counter() - t0

    timed(fs, 0)
    timed(fb, 0)
    ts = min(timed(fs, 1 + r) for r in range(3))
    tb = min(timed(fb, 50 + r) for r in range(3))
    per_call = (tb - ts) / (k_big - k_small)
    return per_call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 12])
    args = ap.parse_args()
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    for b in args.batches:
        per_call = measure(b)
        print(f"batch {b:2d}: {per_call * 1e3:7.2f} ms/call  "
              f"{per_call / b * 1e3:6.2f} ms/clip  "
              f"{b * 5 / per_call:7.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
