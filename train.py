#!/usr/bin/env python
"""Training entry point (reference: src/train.py + src/options/options.py).

  python train.py --config configs/c2m_journal_cityscapes.yaml [--seed N]
                  [--profile] [--num-epochs N]

Differences from the reference CLI: --device_ids is accepted but ignored —
device selection is JAX's (all local devices form the data mesh; multi-host
via jax.distributed, not torch.distributed.run).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser("c2m-tpu train")
    p.add_argument("--config", required=True, help="path to the yaml config")
    p.add_argument("--device_ids", default=None,
                   help="accepted for reference-CLI parity; ignored (JAX owns "
                        "device placement)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--profile", action="store_true",
                   help="trace a few steps with jax.profiler, then exit")
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--job-dir", default=None)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (cpu/tpu); overrides the "
                        "environment's backend registration")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap steps per epoch (smoke runs)")
    return p.parse_args()


def main():
    args = parse_args()
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax(args.platform)
    import jax
    from c2m_tpu.config import Config
    cfg = Config.from_yaml(args.config)
    if args.seed is not None:
        cfg.train_params.seed = args.seed
    from c2m_tpu.data.dataset import get_test_set, get_training_set
    from c2m_tpu.parallel.mesh import make_mesh
    from c2m_tpu.train.trainer import Trainer

    dataset = get_training_set(cfg)
    try:
        # val set feeds the eval_freq-cadenced mid-train sampled inference
        # (reference src/train.py:62-66 + trainer.py:186-209)
        val_dataset = get_test_set(cfg)
    except Exception as e:
        print(f"no val set ({e}); mid-train eval falls back to train batches")
        val_dataset = None

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    trainer = Trainer(cfg, dataset, val_dataset=val_dataset,
                      job_dir=args.job_dir, mesh=mesh)

    if args.profile:
        # reference --profile: 7 iterations under the profiler, then exit
        # (src/train.py:103-123)
        import jax.profiler
        trace_dir = os.path.join(trainer.job_dir, "profile")
        with jax.profiler.trace(trace_dir):
            trainer.fit(num_epochs=1, max_steps=7)
        print(f"profile trace written to {trace_dir}")
        return

    trainer.fit(num_epochs=args.num_epochs, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
