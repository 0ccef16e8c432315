#!/usr/bin/env python
"""Long-horizon 512x1024 10-frame config (BASELINE.json config 5) on a real
chip: memory fit + per-step train/inference timing at batch 1/chip (the
v5p-16 config is 16 = 1/chip data-parallel; DP throughput scales linearly
over ICI once the per-chip step fits — mesh.py's model axis stays reserved).

Timing follows the value-fetch slope protocol (STATUS.md round-2 notes).

  python tools/bench_long_horizon.py [--h 512 --w 1024 --tpred 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--tpred", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-inference", action="store_true",
                    help="train step only (inference is independent of "
                         "--remat-policy; skip its recompile on A/Bs)")
    ap.add_argument("--scan-frames", type=int, default=2,
                    help="frame-chunked full-res tail (0 = folded; the "
                         "folded train step needs 26.7 GB vs 15.75 GB HBM)")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth full-res tail (train_params."
                         "s2d_tail): exact, measured 2.4x on the 512x1024 "
                         "tail convs")
    ap.add_argument("--effort", type=float, default=None,
                    help="exec_time_optimization_effort compile option "
                         "(verify codegen equivalence before trusting)")
    ap.add_argument("--remat-segments", default="all",
                    help="'all' or comma list of nn/remat.SEGMENTS")
    ap.add_argument("--remat-policy", default="",
                    help="'' (save boundaries only) or 'convs' (nn/remat.py);"
                         " fit-check with tools/mem_train.py first")
    args = ap.parse_args()
    copts = ({"exec_time_optimization_effort": args.effort}
             if args.effort is not None else None)

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from c2m_tpu.config import Config
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.train.step import make_train_step

    cfg = Config()
    cfg.dataset_params.dataset = "synthetic"
    cfg.dataset_params.max_objects = 24
    cfg.train_params.input_size = [args.h, args.w]
    cfg.train_params.num_predicted_frames = args.tpred
    cfg.train_params.batch_size = args.batch
    cfg.train_params.dtype = "bfloat16"
    cfg.test_params.input_size = [args.h, args.w]
    cfg.test_params.num_predicted_frames = args.tpred
    # without remat the 512x1024 train step needs 38.4 GB (measured) vs
    # 15.75 GB HBM; segment remat recomputes activations in the backward
    cfg.train_params.remat = True
    # rematted-but-folded still needs 26.7 GB; the frame-chunked scan tail
    # brings the donated step to 15.53 GB (tools/mem_train.py, round 3)
    cfg.train_params.scan_frames = args.scan_frames
    cfg.train_params.s2d_tail = args.s2d
    cfg.train_params.remat_policy = args.remat_policy
    cfg.train_params.remat_segments = args.remat_segments
    cfg.validate()

    print(f"building batch {args.batch}x{args.h}x{args.w} tpred={args.tpred}",
          flush=True)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)

    if not args.skip_inference:
        # ---- inference -------------------------------------------------------
        model = C2MGenerator(cfg)
        t0 = time.time()
        # jit the init: op-by-op init at 512x1024 holds every intermediate
        # alive and OOMs the 16 GB chip; under jit XLA plans the memory
        variables = jax.jit(lambda k: model.init(
            {"params": k, "sample": k}, batch, train=False))(key)
        print(f"init done in {time.time() - t0:.0f}s", flush=True)
        click = jax.nn.one_hot(jnp.zeros((args.batch,), jnp.int32),
                               cfg.dataset_params.max_objects)

        def one(v, bt, z, c):
            # use_gt_eval=True: the reference's test-time raster setting
            # (c2m_journal_cityscapes.yaml:170) -> separable MXU raster
            return model.apply(v, bt, z, c, True, method="inference",
                               rngs={"sample": key})["generated"]

        # ONE compiled program, iteration count a runtime scalar (the round-4
        # bench.py protocol, validated vs the unrolled pair at 128x256): a cold
        # cache costs one inference-graph compile, the loop body is a single
        # inference (kinder to HBM than the old unrolled K>=2 programs), and
        # XLA cannot fuse across iterations by construction.
        def fused(v, bt, c, seed, n):
            def body(i, acc):
                s = jax.random.fold_in(seed, i)
                z = jax.random.normal(s, (args.batch, 1024))
                bt_i = dict(bt)
                bt_i["video"] = bt["video"] + jax.random.uniform(
                    s, (), dtype=bt["video"].dtype, maxval=1e-3)
                bt_i["targets_theta"] = bt["targets_theta"].at[..., 2].add(
                    jax.random.uniform(s, (), maxval=1e-4))
                return acc + one(v, bt_i, z, c).mean()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t0 = time.time()
        compiled = jax.jit(fused).lower(
            variables, batch, click, key, jnp.int32(6)).compile(
            compiler_options=copts)
        print(f"inference compiled in {time.time() - t0:.0f}s", flush=True)

        def timed(n, seed):
            t0 = time.perf_counter()
            float(compiled(variables, batch, click, jax.random.PRNGKey(seed),
                           jnp.int32(n)))
            return time.perf_counter() - t0

        timed(1, 0)  # warm
        per1 = min(timed(1, s) for s in (1, 2, 3))
        print(f"INFERENCE single-dispatch (incl. ~0.2s RPC): {per1 * 1e3:.1f} ms"
              f" -> {args.batch * args.tpred / per1:.1f} f/s/chip", flush=True)
        k_small, k_big = 2, 6
        timed(k_big, 0)
        ts = min(timed(k_small, 10 + s) for s in (0, 1, 2))
        tb = min(timed(k_big, 20 + s) for s in (0, 1, 2))
        per = (tb - ts) / (k_big - k_small)
        print(f"INFERENCE slope (n={k_small} vs {k_big}): {per * 1e3:.1f} ms"
              f" / clip -> {args.batch * args.tpred / per:.1f} f/s/chip",
              flush=True)

    if args.skip_train:
        return
    # free the inference model + compiled loop BEFORE the train step: the
    # donated step peaks at 15.53 of 15.75 GB (tools/mem_train.py) — an
    # extra resident set of inference params/executables OOMs the chip
    if not args.skip_inference:
        del variables, compiled
    import gc
    gc.collect()
    jax.clear_caches()

    # ---- train step ------------------------------------------------------
    tm = C2MTrainModel(cfg)
    t0 = time.time()
    state = jax.jit(lambda k: create_train_state(cfg, tm, k, batch))(key)
    print(f"train state init {time.time() - t0:.0f}s", flush=True)
    # donation is REQUIRED at this size: the new state aliases the old one's
    # 4.24 GB of buffers (peak 15.53 vs 15.75 GB HBM — tools/mem_train.py)
    step = make_train_step(cfg, donate=True)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    tg = float(metrics["total_gen"])
    print(f"train compile+step {time.time() - t0:.0f}s total_gen={tg:.3f}",
          flush=True)
    times = []
    for s in (2, 3, 4):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(s))
        float(m["total_gen"])
        times.append(time.perf_counter() - t0)
    # single-step timing incl. one RPC round trip; report min
    print(f"TRAIN: {min(times) * 1e3:.0f} ms/step (batch {args.batch}, "
          f"incl. ~1 RPC round trip)", flush=True)
    print("LONG-HORIZON OK", flush=True)


if __name__ == "__main__":
    main()
