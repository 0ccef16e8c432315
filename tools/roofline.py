#!/usr/bin/env python
"""Roofline analysis of the inference hot path (VERDICT r2 #3).

Answers WHY bench.py's MFU is what it is: for every conv in the flagship
128x256 batch-12 inference graph, compute analytic FLOPs and minimum HBM
bytes, classify MXU-bound vs HBM-bound against the v5e ridge point, and
print per-module light-speed times to compare with the measured module
times (tools/bench_parts2.py / STATUS.md). Shapes are captured by spying
on nn.Conv during an eval_shape trace — no device work, runs anywhere.

  python tools/roofline.py [--h 128 --w 256 --batch 12]

v5e peaks (public): 394 TFLOP/s bf16 MXU, ~819 GB/s HBM
-> ridge at ~481 FLOP/byte. A [60, 128, 256, 32] bf16 activation is 126 MB;
a 3x3 32->32 conv on it is 36 GFLOP over ~252 MB moved = 143 FLOP/byte —
every full-res thin-channel conv in this architecture sits LEFT of the
ridge: the model is HBM-bandwidth-bound at bf16, and "MFU" is the wrong
denominator (report bandwidth utilization alongside).
"""

import argparse
import os
import sys
from unittest import mock

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pure shape analysis — never touch the tunneled TPU
os.environ["JAX_PLATFORMS"] = "cpu"

PEAK_FLOPS = 394e12      # v5e bf16 MXU
PEAK_BW = 819e9          # v5e HBM GB/s
RIDGE = PEAK_FLOPS / PEAK_BW


def capture_convs(fn, *args):
    """Run fn under eval_shape with an nn.Conv spy; returns
    [(path, in_shape, out_shape, kernel, features, dtype_bytes)]."""
    import jax
    from flax import linen as nn
    records = []
    orig = nn.Conv.__call__

    def spy(self, x):
        y = orig(self, x)
        path = "/".join(self.scope.path) if self.scope else "?"
        k = self.kernel_size if isinstance(self.kernel_size, tuple) \
            else (self.kernel_size,) * 2
        nbytes = 2 if (self.dtype or x.dtype) == "bfloat16" else \
            x.dtype.itemsize if hasattr(x.dtype, "itemsize") else 4
        records.append((path, tuple(x.shape), tuple(y.shape), tuple(k),
                        self.features, nbytes))
        return y

    with mock.patch.object(nn.Conv, "__call__", spy):
        jax.eval_shape(fn, *args)
    return records


def _padded_elems(shape, nbytes):
    """Elements an (8,128)-tiled TPU layout actually stores/moves: the
    minor dim (C) pads to 128 lanes, the second-minor to 8 sublanes (16
    for bf16's (16,128)(2,1) packing when it lands on a short dim). This
    is why a [60, 128, 256, 32] activation moves 4x its logical bytes —
    the measured OOM dumps (STATUS r2/r3) confirm XLA materializes exactly
    these padded tiles in HBM."""
    if len(shape) < 2:
        return int(np.prod(shape))
    lead = int(np.prod(shape[:-2]))
    sub, lane = shape[-2], shape[-1]
    sub_q = 8 if nbytes == 4 else 16
    return lead * -(-sub // sub_q) * sub_q * -(-lane // 128) * 128


def analyze(records):
    rows = []
    for path, xs, ys, k, feats, nbytes in records:
        n_out = 1
        for d in ys[:-1]:
            n_out *= d
        cin = xs[-1]
        kk = 1
        for d in k:
            kk *= d
        flops = 2.0 * n_out * feats * cin * kk
        in_elems = 1
        for d in xs:
            in_elems *= d
        out_elems = n_out * feats
        w_bytes = kk * cin * feats * nbytes
        bytes_moved = (in_elems + out_elems) * nbytes + w_bytes
        pad_bytes = (_padded_elems(xs, nbytes)
                     + _padded_elems(ys, nbytes)) * nbytes + w_bytes
        ai = flops / bytes_moved
        t_mxu = flops / PEAK_FLOPS
        t_hbm = bytes_moved / PEAK_BW
        rows.append(dict(path=path, xs=xs, k=k, feats=feats, flops=flops,
                         bytes=bytes_moved, pad_bytes=pad_bytes, ai=ai,
                         bound="MXU" if ai >= RIDGE else "HBM",
                         t_floor=max(t_mxu, t_hbm),
                         t_floor_pad=max(t_mxu, pad_bytes / PEAK_BW)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--per-conv", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    cfg = _flagship_cfg(h=args.h, w=args.w, batch=args.batch, max_objects=8,
                        dtype="bfloat16")
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(lambda: model.init(
        {"params": key, "sample": key}, batch, train=False))
    click = jnp.zeros((args.batch, cfg.dataset_params.max_objects))
    z = jax.ShapeDtypeStruct((args.batch, 1024), jnp.float32)

    def infer(v, bt, zz):
        return model.apply(v, bt, zz, click, True, method="inference",
                           rngs={"sample": key})["generated"]

    records = capture_convs(infer, variables, batch, z)
    rows = analyze(records)

    groups = {}
    for r in rows:
        top = r["path"].split("/")[0] if r["path"] != "?" else "?"
        g = groups.setdefault(top, dict(flops=0.0, bytes=0.0, pad_bytes=0.0,
                                        t_floor=0.0, t_floor_pad=0.0,
                                        n=0, mxu=0))
        g["flops"] += r["flops"]
        g["bytes"] += r["bytes"]
        g["pad_bytes"] += r["pad_bytes"]
        g["t_floor"] += r["t_floor"]
        g["t_floor_pad"] += r["t_floor_pad"]
        g["n"] += 1
        g["mxu"] += r["bound"] == "MXU"

    print(f"ridge: {RIDGE:.0f} FLOP/byte (394 TFLOP/s / 819 GB/s)\n")
    print(f"{'module':24s} {'convs':>5s} {'GFLOP':>9s} {'GB':>7s} "
          f"{'padGB':>7s} {'AI':>5s} {'floor':>8s} {'pad-floor':>9s} "
          f"{'MXU':>5s}")
    tot = dict(flops=0.0, bytes=0.0, pad_bytes=0.0, t_floor=0.0,
               t_floor_pad=0.0)
    for name, g in sorted(groups.items(), key=lambda kv: -kv[1]["t_floor_pad"]):
        ai = g["flops"] / g["bytes"]
        print(f"{name:24s} {g['n']:5d} {g['flops'] / 1e9:9.1f} "
              f"{g['bytes'] / 1e9:7.2f} {g['pad_bytes'] / 1e9:7.2f} "
              f"{ai:5.0f} {g['t_floor'] * 1e3:6.2f}ms "
              f"{g['t_floor_pad'] * 1e3:7.2f}ms {g['mxu']}/{g['n']:d}")
        for k in tot:
            tot[k] += g[k]
    print(f"\n{'TOTAL':24s} {'':5s} {tot['flops'] / 1e9:9.1f} "
          f"{tot['bytes'] / 1e9:7.2f} {tot['pad_bytes'] / 1e9:7.2f} "
          f"{tot['flops'] / tot['bytes']:5.0f} {tot['t_floor'] * 1e3:6.2f}ms "
          f"{tot['t_floor_pad'] * 1e3:7.2f}ms")
    tpred = cfg.train_params.num_predicted_frames
    print(f"\nconv-only floors: unpadded {tot['t_floor'] * 1e3:.2f} ms "
          f"({args.batch * tpred / tot['t_floor']:.0f} f/s), with the "
          f"(8,128)-tile lane-padding tax {tot['t_floor_pad'] * 1e3:.2f} ms "
          f"({args.batch * tpred / tot['t_floor_pad']:.0f} f/s). Pads, "
          "norms and resizes add further pure-bytes passes on the same "
          "padded tensors.")
    if args.per_conv:
        print(f"\n{'conv':58s} {'in':>24s} {'GFLOP':>7s} {'MB':>7s} "
              f"{'padMB':>7s} {'AI':>5s} {'padfloor':>8s}")
        for r in sorted(rows, key=lambda r: -r["t_floor_pad"]):
            print(f"{r['path'][:58]:58s} {str(r['xs']):>24s} "
                  f"{r['flops'] / 1e9:7.2f} {r['bytes'] / 1e6:7.1f} "
                  f"{r['pad_bytes'] / 1e6:7.1f} "
                  f"{r['ai']:5.0f} {r['t_floor_pad'] * 1e6:6.0f}us")


if __name__ == "__main__":
    main()
