"""Benchmark: generated frames/sec/chip, Cityscapes-config 128x256 5-frame clips
at the reference's test batch size (12, c2m_journal_cityscapes.yaml:166 — also
the measured-best operating point: see tools/bench_batch_sweep.py).

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: K independent sampled inferences (fresh latent each) fused per
dispatch — the serving-shaped batch.

Measurement protocol (see STATUS.md round-2 notes): on this tunneled v5e,
``block_until_ready`` does NOT wait for remote execution and identical
dispatches can be served from a terminal-side cache, so we (1) FETCH the
result value, (2) vary the seed per call, and (3) report the slope between a
short and a long fused loop, which cancels RPC + transfer overhead exactly.

MFU: analytic FLOPs come from XLA's own cost model for the compiled fused
program (compiled.cost_analysis()['flops'] / K), against the v5e bf16 peak
of 394 TFLOP/s.

Baseline: the reference publishes no numbers (BASELINE.md);
``BASELINE_FRAMES_PER_SEC`` is a documented ESTIMATE of the PyTorch
reference's A100 inference throughput (~150 f/s at batch 12, 128x256) until
a real measurement exists; the JSON carries that caveat explicitly.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FRAMES_PER_SEC = 150.0  # estimated PyTorch reference on A100
V5E_BF16_PEAK_FLOPS = 394e12
V5E_HBM_BYTES_PER_SEC = 819e9

BATCH = 12
K_SMALL = 2
K_BIG = 12
H, W = 128, 256
REPEATS = 3


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
        # use_gt_eval=True is the reference's test-time setting
        # (c2m_journal_cityscapes.yaml:170): the raster composes GT thetas
        # (axis-aligned -> the separable MXU path); the GNN still runs.
        return model.apply(v, bt, z, c, True, method="inference",
                           rngs={"sample": key})["generated"]

    def make_fused(k):
        @jax.jit
        def fused(v, bt, c, seed):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                z = jax.random.normal(s, (BATCH, 1024))
                # vary the conditioning per call: every iteration is a FULL
                # fresh-request inference — without this, XLA CSE dedups the
                # batch-dependent front end (appearance/raster/splat) across
                # the unrolled loop and the bench only times the z-dependent
                # tail (the round-1/round-2 numbers had that flaw).
                bt_i = dict(bt)
                bt_i["video"] = bt["video"] + jax.random.uniform(
                    s, (), dtype=bt["video"].dtype, maxval=1e-3)
                # ...and the click targets, so the raster/splat front end
                # is also fresh per request
                bt_i["targets_theta"] = bt["targets_theta"].at[..., 2].add(
                    jax.random.uniform(s, (), maxval=1e-4))
                acc = acc + one(v, bt_i, z, c).mean()
            return acc
        return fused

    fused_s, fused_b = make_fused(K_SMALL), make_fused(K_BIG)

    # XLA's own FLOP count for the big fused program -> per-inference FLOPs
    lowered = fused_b.lower(variables, batch, click, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops_per_call = float(cost.get("flops", 0.0)) / K_BIG if cost else 0.0
    bytes_per_call = float(cost.get("bytes accessed", 0.0)) / K_BIG \
        if cost else 0.0

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(variables, batch, click, jax.random.PRNGKey(seed)))
        return time.perf_counter() - t0

    timed(fused_s, 0)  # warm (compile)
    timed(fused_b, 0)
    t_small = min(timed(fused_s, 1 + r) for r in range(REPEATS))
    t_big = min(timed(fused_b, 100 + r) for r in range(REPEATS))
    per_call = (t_big - t_small) / (K_BIG - K_SMALL)

    tpred = cfg.train_params.num_predicted_frames
    frames_per_sec = BATCH * tpred / per_call
    mfu = (flops_per_call / per_call) / V5E_BF16_PEAK_FLOPS
    # The architecture is HBM-bound, not MXU-bound (tools/roofline.py: conv
    # AI ~226 FLOP/byte vs the 481 ridge, plus a ~3.2x lane-padding tax on
    # its thin-channel tensors) — bandwidth utilization is the honest
    # efficiency metric; MFU is reported alongside for continuity.
    bw_util = (bytes_per_call / per_call) / V5E_HBM_BYTES_PER_SEC
    print(json.dumps({
        "metric": "generated_frames_per_sec_per_chip_128x256",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
        "baseline_basis": "estimated (reference publishes no numbers; "
                          "~150 f/s PyTorch A100 inference, BASELINE.md)",
        "mfu_vs_v5e_bf16_peak": round(mfu, 4),
        "hbm_bw_utilization": round(bw_util, 4),
        "bound": "HBM (roofline: AI 226 vs ridge 481, tools/roofline.py)",
        "xla_flops_per_inference": flops_per_call,
        "xla_bytes_per_inference": bytes_per_call,
        "ms_per_batch12_inference": round(per_call * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
