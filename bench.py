"""Benchmark: generated frames/sec/chip, Cityscapes-config 128x256 5-frame clips.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload: K independent sampled inferences (fresh latent each) fused per
dispatch — the serving-shaped batch. Measured on this tunneled v5e setup,
per-dispatch RPC overhead is ~220 ms, so single-call timing measures the
tunnel, not the chip; fusing K calls amortizes it exactly like a local
deployment's ~50 us dispatch would.

Baseline: the reference publishes no numbers (BASELINE.md); until a real A100
measurement of the PyTorch reference exists, ``BASELINE_FRAMES_PER_SEC`` is a
documented estimate of reference inference throughput (batch 12, 128x256,
A100) — ~150 frames/s (see BASELINE.md operating point). vs_baseline is the
BASELINE.md north-star ratio (target >= 5x).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FRAMES_PER_SEC = 150.0  # estimated PyTorch reference on A100

BATCH = 4
K_FUSED = 8          # independent inferences fused per dispatch
H, W = 128, 256
WARMUP = 2
ITERS = 10


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    cfg = _flagship_cfg(h=H, w=W, batch=BATCH, max_objects=8, dtype="bfloat16")
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    click = jax.nn.one_hot(jnp.zeros((BATCH,), jnp.int32),
                           cfg.dataset_params.max_objects)

    def one(v, bt, z, c):
        return model.apply(v, bt, z, c, method="inference",
                           rngs={"sample": key})["generated"]

    @jax.jit
    def fused(v, bt, c, seed):
        acc = 0.0
        for i in range(K_FUSED):
            z = jax.random.normal(jax.random.fold_in(seed, i), (BATCH, 1024))
            acc = acc + one(v, bt, z, c).mean()
        return acc

    for _ in range(WARMUP):
        fused(variables, batch, click, key).block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fused(variables, batch, click, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    tpred = cfg.train_params.num_predicted_frames
    frames_per_sec = ITERS * K_FUSED * BATCH * tpred / dt
    print(json.dumps({
        "metric": "generated_frames_per_sec_per_chip_128x256",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
