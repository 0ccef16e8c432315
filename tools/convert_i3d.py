#!/usr/bin/env python
"""Convert a torch kinetics I3D checkpoint (the public pytorch-i3d layout,
``rgb_imagenet.pt``-style naming) to the npz consumed by c2m_tpu.eval.i3d —
the FVD embedder (reference drives the TF-Hub I3D instead,
src/utils/fvd/fvd.py:70-127; zero-egress forces local conversion).

Torch names -> flax scopes:
  <Block>.conv3d.weight [O,I,kt,kh,kw]   -> <Block>/Conv_0.kernel (t,h,w,I,O)
  <Block>.bn.{weight,bias,running_*}     -> <Block>/BatchNorm_0.{scale,bias}/stats
  Mixed_X.b{0,1a,1b,2a,2b,3b}            -> Mixed_X/Branch_{0,1a,1b,2a,2b,3b}
  logits.conv3d.{weight,bias}            -> Logits/Conv_0 (bias=True, no BN)

  python tools/convert_i3d.py --checkpoint rgb_imagenet.pt --out i3d.npz
"""

import argparse
import re

import numpy as np

_BRANCH = {"b0": "Branch_0", "b1a": "Branch_1a", "b1b": "Branch_1b",
           "b2a": "Branch_2a", "b2b": "Branch_2b", "b3b": "Branch_3b"}


def _put(tree, path, leaf, val):
    node = tree
    for k in path:
        node = node.setdefault(k, {})
    node[leaf] = val


def convert(sd):
    params, stats = {}, {}
    for key, val in sd.items():
        arr = val.numpy() if hasattr(val, "numpy") else np.asarray(val)
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[0] == "logits":
            scope = ["Logits"]
            sub, leaf = parts[-2], parts[-1]
        else:
            scope = [parts[0]]
            if len(parts) == 4:  # Mixed_X.bY.conv3d.weight
                m = re.fullmatch(r"b(0|1a|1b|2a|2b|3b)", parts[1])
                assert m, f"unknown branch in {key}"
                scope.append(_BRANCH[parts[1]])
            sub, leaf = parts[-2], parts[-1]
        if sub == "conv3d":
            if leaf == "weight":
                _put(params, [*scope, "Conv_0"], "kernel",
                     np.transpose(arr, (2, 3, 4, 1, 0)))
            else:
                _put(params, [*scope, "Conv_0"], "bias", arr)
        elif sub == "bn":
            if leaf == "weight":
                _put(params, [*scope, "BatchNorm_0"], "scale", arr)
            elif leaf == "bias":
                _put(params, [*scope, "BatchNorm_0"], "bias", arr)
            elif leaf == "running_mean":
                _put(stats, [*scope, "BatchNorm_0"], "mean", arr)
            elif leaf == "running_var":
                _put(stats, [*scope, "BatchNorm_0"], "var", arr)
        else:
            raise ValueError(f"unmapped key {key}")
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    import torch
    sd = torch.load(args.checkpoint, map_location="cpu")
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    params, stats = convert(sd)
    np.savez(args.out, params=np.asarray(params, dtype=object),
             batch_stats=np.asarray(stats, dtype=object))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
