#!/usr/bin/env python
"""Export a deployable serving artifact (StableHLO + weights + config).

  python tools/export_serving.py --config configs/c2m_journal_cityscapes.yaml \
      --job-dir runs/city --out artifacts/city_serving \
      [--batch-sizes 1,4,12] [--platforms tpu,cpu] [--random-init]

The artifact is hermetic: a serving process loads it with
``c2m_tpu.serving.ServingModel`` and needs no model code (see
c2m_tpu/serving.py). Replaces the reference's run-test.py-in-a-checkout
deployment story (reference src/test.py:40-80).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("c2m-tpu export-serving")
    p.add_argument("--config", required=True)
    p.add_argument("--job-dir", default=None,
                   help="checkpoint dir; omit with --random-init")
    p.add_argument("--out", required=True)
    p.add_argument("--batch-sizes", default="1",
                   help="comma-separated serving buckets")
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--random-init", action="store_true",
                   help="export freshly initialized weights (smoke/testing)")
    args = p.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from c2m_tpu import serving
    from c2m_tpu.config import Config
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.from_yaml(args.config)
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    platforms = args.platforms.split(",")

    model = C2MTrainModel(cfg)
    init_batch = {k: jnp.asarray(v)
                  for k, v in make_batch(cfg, batch_size=1, seed=0).items()}
    state = jax.jit(lambda k: create_train_state(cfg, model, k, init_batch))(
        jax.random.PRNGKey(0))
    if not args.random_init:
        if not args.job_dir:
            p.error("--job-dir required unless --random-init")
        state, epoch, _ = load_checkpoint(args.job_dir, state)
        print(f"exporting checkpoint from epoch {epoch}")
    variables = serving.generator_variables(
        {"params": state.params, "batch_stats": state.batch_stats})

    serving.export_artifact(args.out, cfg, variables,
                            batch_sizes=batch_sizes, platforms=platforms)
    sizes = {f: os.path.getsize(os.path.join(args.out, f)) // 1024
             for f in sorted(os.listdir(args.out))}
    print(f"artifact written to {args.out}:")
    for f, kb in sizes.items():
        print(f"  {f:28s} {kb:8d} KiB")


if __name__ == "__main__":
    main()
