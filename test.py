#!/usr/bin/env python
"""Evaluation entry point (reference: src/test.py).

  python test.py --config configs/c2m_journal_cityscapes.yaml \
                 [--job-dir runs/...] [--max-batches N]

Loads the latest checkpoint, runs sampled inference over the val set, dumps
gifs/pngs/flow visualizations + HTML, computes available metrics, writes
results.txt.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser("c2m-tpu test")
    p.add_argument("--config", required=True)
    p.add_argument("--device_ids", default=None, help="ignored (JAX devices)")
    p.add_argument("--job-dir", default=None)
    p.add_argument("--max-batches", type=int, default=None)
    args = p.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from c2m_tpu.config import Config
    from c2m_tpu.data.dataset import get_test_set
    from c2m_tpu.data.loader import DataLoader
    from c2m_tpu.eval.evaluator import Evaluator
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.from_yaml(args.config)
    job_dir = args.job_dir or os.path.join(
        cfg.workspace, f"{cfg.dataset_params.dataset}_{cfg.name}{cfg.suffix}")
    dataset = get_test_set(cfg)

    loader = DataLoader(dataset, batch_size=cfg.test_params.batch_size,
                        shuffle=False, num_workers=cfg.test_params.workers,
                        drop_last=False)

    model = C2MTrainModel(cfg, dataset=cfg.dataset_params.dataset)
    init_batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()
                  if k != "names"}
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.test_params.seed),
                               init_batch)
    state, epoch, _ = load_checkpoint(job_dir, state)
    print(f"evaluating checkpoint from epoch {epoch}")
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "spectral": state.spectral}

    evaluator = Evaluator(cfg, model, variables, job_dir)
    rng = jax.random.PRNGKey(cfg.test_params.seed)
    for bi, batch in enumerate(loader):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        rng, sub = jax.random.split(rng)
        out = evaluator.evaluate_batch(batch, bi, sub)
        evaluator.save_samples(batch, out, bi)
        evaluator.fetch_metrics_data(batch, out)
        print(f"batch {bi} done", flush=True)

    results = evaluator.generate_metrics()
    path = evaluator.write_metrics(results)
    print(f"wrote {path}: {results}")


if __name__ == "__main__":
    main()
