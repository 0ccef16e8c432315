#!/usr/bin/env python
"""Training-step throughput on the real chip (slope protocol): full GAN
train step (G + GNN + D_image + D_video updates, all losses incl. VGG
perceptual when weights exist) at the reference's train operating point
(128x256, batch 3/GPU — c2m_journal_cityscapes.yaml:49) and at the driver's
config-4 point (256x512, --size):

  python tools/bench_train.py [--batches 3] [--size 128 256] [--remat]
                              [--scan-frames N] [--s2d] [--no-upfuse]
                              [--effort -0.2] [--k 2 6]

Like bench.py (round 4), the K chained steps run inside ONE compiled
program with the iteration count as a RUNTIME scalar (`lax.fori_loop`
carrying the train state), so a cold cache costs one train-graph compile
and both slope points share the executable. Protocol validated vs the
round-3 unrolled-pair numbers at 128x256 b3 (see STATUS.md round-4).

--no-upfuse disables the fused upsample+conv decoder stages via
C2M_UPFUSE_MIN_PIXELS (the A/B hook for its train-time effect).
--effort passes exec_time_optimization_effort to the compile; measured
equivalence notes in STATUS.md round-4 (-0.2 == default codegen for the
inference program; verify per-program before trusting a new point).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[3])
    ap.add_argument("--size", type=int, nargs=2, default=[128, 256],
                    metavar=("H", "W"))
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default="",
                    help="'' (save boundaries only) or 'convs' (nn/remat.py)")
    ap.add_argument("--remat-segments", default="all",
                    help="'all' or comma list of nn/remat.SEGMENTS")
    ap.add_argument("--scan-frames", type=int, default=0)
    ap.add_argument("--s2d", action="store_true")
    ap.add_argument("--no-upfuse", action="store_true",
                    help="disable the fused upsample+conv decoder stages")
    ap.add_argument("--effort", type=float, default=None,
                    help="exec_time_optimization_effort compile option")
    ap.add_argument("--k", type=int, nargs=2, default=[1, 3],
                    metavar=("K_SMALL", "K_BIG"))
    args = ap.parse_args()
    if args.no_upfuse:
        os.environ["C2M_UPFUSE_MIN_PIXELS"] = str(1 << 62)

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.train.step import make_train_step

    k_small, k_big = args.k
    copts = ({"exec_time_optimization_effort": args.effort}
             if args.effort is not None else None)
    print(f"device: {jax.devices()[0]} effort={args.effort} "
          f"upfuse={'off' if args.no_upfuse else 'auto'}", flush=True)
    for bsz in args.batches:
        cfg = _flagship_cfg(h=args.size[0], w=args.size[1], batch=bsz,
                            max_objects=8, dtype="bfloat16")
        cfg.train_params.remat = args.remat
        cfg.train_params.remat_policy = args.remat_policy
        cfg.train_params.remat_segments = args.remat_segments
        cfg.train_params.scan_frames = args.scan_frames
        cfg.train_params.s2d_tail = args.s2d
        model = C2MTrainModel(cfg)
        batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        step = make_train_step(cfg, donate=False)

        def fused(st, bt, seed, n):
            def body(i, carry):
                st, _ = carry
                s = jax.random.fold_in(seed, i)
                bt_i = dict(bt)
                bt_i["video"] = bt["video"] + jax.random.uniform(
                    s, (), dtype=bt["video"].dtype, maxval=1e-3)
                bt_i["targets_theta"] = bt["targets_theta"].at[..., 2].add(
                    jax.random.uniform(s, (), maxval=1e-4))
                st, metrics = step(st, bt_i, s)
                return st, metrics["total_gen"].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0.0)))

        t0 = time.perf_counter()
        compiled = jax.jit(fused).lower(
            state, batch, jax.random.PRNGKey(0),
            jnp.int32(k_big)).compile(compiler_options=copts)
        print(f"  compiled in {time.perf_counter() - t0:.0f}s", flush=True)

        def timed(n, seed):
            t0 = time.perf_counter()
            _, m = compiled(state, batch, jax.random.PRNGKey(seed),
                            jnp.int32(n))
            float(m)
            return time.perf_counter() - t0

        timed(k_small, 0)
        timed(k_big, 0)
        ts = min(timed(k_small, 1 + r) for r in range(REPEATS))
        tb = min(timed(k_big, 100 + r) for r in range(REPEATS))
        per_step = (tb - ts) / (k_big - k_small)
        tpred = cfg.train_params.num_predicted_frames
        print(f"batch {bsz}: {per_step * 1e3:8.2f} ms/step  "
              f"({bsz * tpred / per_step:7.1f} trained frames/s/chip)",
              flush=True)


if __name__ == "__main__":
    main()
