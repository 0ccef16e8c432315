#!/usr/bin/env python
"""Training-step throughput on the real chip (slope protocol): full GAN
train step (G + GNN + D_image + D_video updates, all losses incl. VGG
perceptual when weights exist) at the reference's train operating point
(128x256, batch 3/GPU — c2m_journal_cityscapes.yaml:49) and at batch 12.

Also measures the driver's config-4 point (256x512 training) via --size:

  python tools/bench_train.py [--batches 3] [--size 128 256] [--remat]
                              [--scan-frames N] [--s2d]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_SMALL, K_BIG, REPEATS = 1, 3, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[3])
    ap.add_argument("--size", type=int, nargs=2, default=[128, 256],
                    metavar=("H", "W"))
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--scan-frames", type=int, default=0)
    ap.add_argument("--s2d", action="store_true")
    args = ap.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.train.step import make_train_step

    print(f"device: {jax.devices()[0]}", flush=True)
    for bsz in args.batches:
        cfg = _flagship_cfg(h=args.size[0], w=args.size[1], batch=bsz,
                            max_objects=8, dtype="bfloat16")
        cfg.train_params.remat = args.remat
        cfg.train_params.scan_frames = args.scan_frames
        cfg.train_params.s2d_tail = args.s2d
        model = C2MTrainModel(cfg)
        batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        step = make_train_step(cfg, donate=False)

        def make_fused(k):
            @jax.jit
            def fused(st, bt, seed):
                metrics = None
                for i in range(k):
                    s = jax.random.fold_in(seed, i)
                    bt_i = dict(bt)
                    bt_i["video"] = bt["video"] + jax.random.uniform(
                        s, (), dtype=bt["video"].dtype, maxval=1e-3)
                    bt_i["targets_theta"] = bt["targets_theta"].at[..., 2].add(
                        jax.random.uniform(s, (), maxval=1e-4))
                    st, metrics = step(st, bt_i, s)
                return st, metrics["total_gen"]
            return fused

        fs, fb = make_fused(K_SMALL), make_fused(K_BIG)

        def timed(fn, seed):
            t0 = time.perf_counter()
            _, m = fn(state, batch, jax.random.PRNGKey(seed))
            float(m)
            return time.perf_counter() - t0

        timed(fs, 0)
        timed(fb, 0)
        ts = min(timed(fs, 1 + r) for r in range(REPEATS))
        tb = min(timed(fb, 100 + r) for r in range(REPEATS))
        per_step = (tb - ts) / (K_BIG - K_SMALL)
        tpred = cfg.train_params.num_predicted_frames
        print(f"batch {bsz}: {per_step * 1e3:8.2f} ms/step  "
              f"({bsz * tpred / per_step:7.1f} trained frames/s/chip)",
              flush=True)


if __name__ == "__main__":
    main()
