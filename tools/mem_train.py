#!/usr/bin/env python
"""AOT-compile the train step and report XLA's memory analysis WITHOUT
executing — the fit-check tool for the 512x1024 long-horizon config
(driver config 5). Compiles on whatever backend is active (the real TPU
through the tunnel by default), so the reported temp/argument sizes are the
ones the chip would actually allocate, including layout padding.

  python tools/mem_train.py [--h 512 --w 1024 --tpred 10 --batch 1]
                            [--scan-frames K] [--inference] [--platform cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gb(x):
    return x / (1 << 30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--tpred", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--scan-frames", type=int, default=0)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default="",
                    help="'' (save boundaries only) or 'convs' (nn/remat.py)")
    ap.add_argument("--remat-segments", default="all",
                    help="'all' or comma list of nn/remat.SEGMENTS")
    ap.add_argument("--inference", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth full-res tail (train_params."
                         "s2d_tail): exact, measured 2.4x on the 512x1024 "
                         "tail convs")
    args = ap.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax(platform=args.platform)
    import jax
    import jax.numpy as jnp
    from c2m_tpu.config import Config
    from c2m_tpu.data.synthetic import make_batch

    cfg = Config()
    cfg.dataset_params.dataset = "synthetic"
    cfg.dataset_params.max_objects = 24
    cfg.train_params.input_size = [args.h, args.w]
    cfg.train_params.num_predicted_frames = args.tpred
    cfg.train_params.batch_size = args.batch
    cfg.train_params.dtype = "bfloat16"
    cfg.train_params.remat = not args.no_remat
    cfg.train_params.remat_policy = args.remat_policy
    cfg.train_params.remat_segments = args.remat_segments
    cfg.train_params.scan_frames = args.scan_frames
    cfg.train_params.s2d_tail = args.s2d
    cfg.test_params.input_size = [args.h, args.w]
    cfg.test_params.num_predicted_frames = args.tpred
    cfg.validate()

    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} shape={args.batch}x{args.tpred}"
          f"x{args.h}x{args.w} scan_frames={args.scan_frames} "
          f"remat={cfg.train_params.remat}", flush=True)

    if args.inference:
        from c2m_tpu.models.c2m import C2MGenerator
        model = C2MGenerator(cfg)
        variables = jax.eval_shape(
            lambda k: model.init({"params": k, "sample": k}, batch,
                                 train=False), key)
        click = jax.eval_shape(
            lambda: jax.nn.one_hot(jnp.zeros((args.batch,), jnp.int32),
                                   cfg.dataset_params.max_objects))
        z = jax.ShapeDtypeStruct((args.batch, 1024), jnp.float32)

        def fn(v, bt, zz, c):
            return model.apply(v, bt, zz, c, True, method="inference",
                               rngs={"sample": key})["generated"]

        t0 = time.time()
        lowered = jax.jit(fn).lower(variables, batch, z, click)
    else:
        from c2m_tpu.train.model import C2MTrainModel
        from c2m_tpu.train.state import create_train_state
        from c2m_tpu.train.step import make_train_step
        tm = C2MTrainModel(cfg)
        state = jax.eval_shape(
            lambda k: create_train_state(cfg, tm, k, batch), key)
        # donate the state exactly like the real train loop: the new state
        # aliases the old one's buffers, so peak = temp + args
        step = make_train_step(cfg, donate=True)
        t0 = time.time()
        lowered = step.lower(state, batch, key)

    print(f"lowered in {time.time() - t0:.0f}s; compiling...", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)
    m = compiled.memory_analysis()
    if m is None:
        print("memory_analysis unavailable on this backend")
        return
    print(f"temp:      {gb(m.temp_size_in_bytes):7.2f} GB")
    print(f"arguments: {gb(m.argument_size_in_bytes):7.2f} GB")
    print(f"output:    {gb(m.output_size_in_bytes):7.2f} GB")
    print(f"alias:     {gb(m.alias_size_in_bytes):7.2f} GB")
    peak = (m.temp_size_in_bytes + m.argument_size_in_bytes
            + m.output_size_in_bytes - m.alias_size_in_bytes)
    print(f"peak (temp+arg+out-alias): {gb(peak):.2f} GB", flush=True)


if __name__ == "__main__":
    main()
