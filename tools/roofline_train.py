#!/usr/bin/env python
"""Roofline the TRAIN step at the reference operating point (128x256,
batch 3 — c2m_journal_cityscapes.yaml:49): XLA cost-model FLOPs/bytes for
the compiled step vs the v5e peaks, alongside the measured slope time
(tools/bench_train.py protocol). Answers VERDICT-r2-#3's question for the
training path: is the 123.9 ms/step near its bound, and which bound?

  python tools/roofline_train.py [--batches 3 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_FLOPS = 394e12
V5E_HBM_BYTES_PER_SEC = 819e9

REPEATS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[3])
    ap.add_argument("--k", type=int, nargs=2, default=[1, 3],
                    metavar=("K_SMALL", "K_BIG"),
                    help="fused-loop lengths for the slope (use 1 2 at "
                         "batch 12 — the K=3 loop exceeds HBM)")
    ap.add_argument("--no-vgg", action="store_true",
                    help="ablation: perceptual/style weight 0 (drops the "
                         "VGG19 tower) to attribute its step-time share")
    ap.add_argument("--no-disc", action="store_true",
                    help="ablation: disable both discriminators")
    ap.add_argument("--size", type=int, nargs=2, default=[128, 256],
                    metavar=("H", "W"))
    ap.add_argument("--remat", action="store_true",
                    help="segment remat (required for the 256x512 point)")
    ap.add_argument("--aot-only", action="store_true",
                    help="print the cost-model floors from the AOT compile "
                         "and skip the measured slope")
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
        if args.no_vgg:
            cfg.train_params.loss_weights.perceptual = 0.0
            cfg.train_params.loss_weights.style = 0.0
        if args.no_disc:
            cfg.train_params.use_image_discriminator = False
            cfg.train_params.use_video_discriminator = False
            for k in ("g_gan_image", "g_gan_video", "feature_matching_image",
                      "feature_matching_video"):
                if hasattr(cfg.train_params.loss_weights, k):
                    setattr(cfg.train_params.loss_weights, k, 0.0)
        model = C2MTrainModel(cfg)
        batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        step = make_train_step(cfg, donate=False)

        lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1))
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
        mem = compiled.memory_analysis()
        t_flop = flops / V5E_BF16_PEAK_FLOPS
        t_byte = byts / V5E_HBM_BYTES_PER_SEC
        print(f"batch {bsz}: XLA cost model {flops / 1e12:.2f} TFLOP, "
              f"{byts / 1e9:.1f} GB; floors: MXU {t_flop * 1e3:.1f} ms, "
              f"HBM {t_byte * 1e3:.1f} ms; AI {flops / max(byts, 1):.0f} "
              f"FLOP/byte (ridge 481)", flush=True)
        if mem is not None:
            print(f"  temps {mem.temp_size_in_bytes / 1e9:.2f} GB, "
                  f"args {mem.argument_size_in_bytes / 1e9:.2f} GB",
                  flush=True)
        if args.aot_only:
            continue

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

        k_small, k_big = args.k
        fs, fb = make_fused(k_small), make_fused(k_big)

        def timed(fn, seed):
            t0 = time.perf_counter()
            _, m = fn(state, batch, jax.random.PRNGKey(seed))
            float(m)
            return time.perf_counter() - t0

        timed(fs, 0)
        timed(fb, 0)
        ts = min(timed(fs, 1 + r) for r in range(REPEATS))
        tb = min(timed(fb, 100 + r) for r in range(REPEATS))
        per_step = (tb - ts) / (k_big - k_small)
        print(f"  measured {per_step * 1e3:.1f} ms/step -> "
              f"MXU util {t_flop / per_step:.1%}, "
              f"HBM util {t_byte / per_step:.1%}", flush=True)


if __name__ == "__main__":
    main()
