#!/usr/bin/env python
"""Measure the serving path (c2m_tpu/serving.py) on the real chip:
export -> load -> serve, vs the in-process jit path on identical requests.

  python tools/bench_serving.py [--bucket 12] [--requests 8] [--h 128 --w 256]

Reports artifact export/load/first-call (compile) times and the steady
per-request latency of BOTH paths timed the same way (sequential dispatch,
value fetch). On the tunneled v5e every dispatch carries ~220 ms RPC — it
cancels in the serving-vs-jit comparison but inflates both absolute numbers
vs on-host serving (see STATUS.md round-2 protocol notes).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=12)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--out", default="/tmp/c2m_serving_artifact")
    args = ap.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu import serving
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    B = args.bucket
    cfg = _flagship_cfg(h=args.h, w=args.w, batch=B, max_objects=8,
                        dtype="bfloat16")
    model = C2MGenerator(cfg)
    batch0 = make_batch(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": k},
                             {kk: jnp.asarray(v) for kk, v in batch0.items()},
                             train=False))(key)
    variables = jax.device_get(variables)

    t0 = time.perf_counter()
    serving.export_artifact(args.out, cfg, variables, batch_sizes=(B,),
                            platforms=(jax.default_backend(),))
    t_export = time.perf_counter() - t0
    size_mb = sum(os.path.getsize(os.path.join(args.out, f))
                  for f in os.listdir(args.out)) / 1e6
    print(f"export: {t_export:.1f}s, artifact {size_mb:.1f} MB", flush=True)

    t0 = time.perf_counter()
    served = serving.ServingModel(args.out)
    t_load = time.perf_counter() - t0
    print(f"load: {t_load:.1f}s", flush=True)

    zd = serving.z_dim(cfg)
    n_max = cfg.dataset_params.max_objects

    def request(seed):
        b = make_batch(cfg, batch_size=B, seed=seed)
        rng = np.random.RandomState(seed)
        z = rng.randn(B, zd).astype(np.float32)
        click = np.zeros((B, n_max), np.float32)
        click[np.arange(B), rng.randint(0, n_max, B)] = 1.0
        return b, z, click, np.asarray([0, seed], np.uint32)

    # serving path: first call compiles the deserialized StableHLO
    b, z, c, r = request(1)
    t0 = time.perf_counter()
    out = served(b, z, c, r)
    _ = float(np.asarray(out["generated"]).mean())
    t_first = time.perf_counter() - t0
    print(f"serving first call (compile): {t_first:.1f}s", flush=True)

    def timed_serving(seed, outputs):
        b, z, c, r = request(seed)
        t0 = time.perf_counter()
        out = served(b, z, c, r, outputs=outputs)
        m = float(np.asarray(out["generated"]).mean())
        return time.perf_counter() - t0, m

    ts = [timed_serving(10 + i, ("generated",))[0]
          for i in range(args.requests)]
    serve_ms = 1e3 * min(ts)
    print(f"serving steady (generated only): min {serve_ms:.1f} ms/request "
          f"(median {1e3 * sorted(ts)[len(ts) // 2]:.1f})", flush=True)
    tf = [timed_serving(30 + i, None)[0] for i in range(args.requests)]
    print(f"serving steady (all outputs):    min {1e3 * min(tf):.1f} "
          f"ms/request", flush=True)

    # jit path, identical requests/protocol: numpy in -> numpy out, the
    # host->device batch upload INSIDE the timer exactly like ServingModel
    infer = serving._infer_fn(cfg)
    jit_infer = jax.jit(infer)
    dev_vars = jax.device_put(variables)

    def timed_jit(seed):
        b, z, c, r = request(seed)
        t0 = time.perf_counter()
        out = jit_infer(dev_vars, {k: jnp.asarray(v) for k, v in b.items()},
                        jnp.asarray(z), jnp.asarray(c), jnp.asarray(r))
        m = float(np.asarray(out["generated"]).mean())
        return time.perf_counter() - t0, m

    timed_jit(1)  # compile
    tj = [timed_jit(10 + i)[0] for i in range(args.requests)]
    jit_ms = 1e3 * min(tj)
    print(f"jit steady:     min {jit_ms:.1f} ms/request "
          f"(median {1e3 * sorted(tj)[len(tj) // 2]:.1f})", flush=True)
    print(f"serving overhead vs jit: {serve_ms - jit_ms:+.1f} ms/request",
          flush=True)

    # upload-isolated: device-resident inputs, value fetch — what the chip
    # does per request once the batch is staged (the tunnel's upload cost is
    # deployment-irrelevant; an on-host server overlaps it with compute)
    b, z, c, r = request(99)
    dev_args = ({k: jnp.asarray(v) for k, v in b.items()}, jnp.asarray(z),
                jnp.asarray(c), jnp.asarray(r))
    jax.block_until_ready(dev_args)
    ts_dev = []
    for i in range(args.requests):
        t0 = time.perf_counter()
        out = jit_infer(dev_vars, *dev_args)
        _ = float(np.asarray(out["generated"]).mean())
        ts_dev.append(time.perf_counter() - t0)
    print(f"jit device-staged: min {1e3 * min(ts_dev):.1f} ms/request "
          f"(upload share of e2e = {jit_ms - 1e3 * min(ts_dev):.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
