"""Benchmark: generated frames/sec/chip, Cityscapes-config 128x256 5-frame clips.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md); until a real A100
measurement of the PyTorch reference exists, ``BASELINE_FRAMES_PER_SEC`` is a
documented estimate of reference inference throughput (batch 12, 128x256,
A100): the model runs ~30 conv-stage forwards per clip at 0.13 MPix; profiled
PyTorch stacks of this size land in the 20-40 clips/s range -> ~150 frames/s.
Replace with a measured number when GPU access exists; vs_baseline is then
exactly the BASELINE.md north-star ratio (target >= 5x).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FRAMES_PER_SEC = 150.0  # estimated PyTorch reference on A100 (see above)

BATCH = 4
H, W = 128, 256
WARMUP = 3
ITERS = 20


def main():
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel

    cfg = _flagship_cfg(h=H, w=W, batch=BATCH, max_objects=8, dtype="bfloat16")
    model = C2MTrainModel(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch, train=False)
    z_m = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 1024))
    click = jax.nn.one_hot(jnp.zeros((BATCH,), jnp.int32),
                           cfg.dataset_params.max_objects)

    @jax.jit
    def infer(variables, batch, z_m, click):
        out = model.apply(variables, batch, z_m, click, method="inference",
                          rngs={"sample": jax.random.PRNGKey(3)})
        return out["generated"]

    for _ in range(WARMUP):
        infer(variables, batch, z_m, click).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = infer(variables, batch, z_m, click)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    tpred = cfg.train_params.num_predicted_frames
    frames_per_sec = ITERS * BATCH * tpred / dt
    print(json.dumps({
        "metric": "generated_frames_per_sec_per_chip_128x256",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
