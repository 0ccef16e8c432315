#!/usr/bin/env python
"""Convert a Panoptic-DeepLab HRNet-48 torch checkpoint to the npz consumed by
c2m_tpu.models.panoptic_deeplab (tools/generate_segmentation.py).

Torch names (Bowen Cheng's implementation) -> flax scopes:
  backbone.conv1/bn1, conv2/bn2        -> backbone/stem1, stem2
  backbone.layer1.B.convK/bnK(+downsample) -> backbone/layer1_{B}/...
  backbone.transitionT.I(.J).0/.1      -> backbone/transition{T}_{I}(_{J})
  backbone.stageS.M.branches.B.K.convN -> backbone/stage{S}_{M}/branch{B}_block{K}
  backbone.stageS.M.fuse_layers.I.J(...) -> backbone/stage{S}_{M}/fuse_{I}_{J}(_{K})
  decoder/heads per models/panoptic_deeplab.py scope names.

NOTE: unaudited against a real checkpoint (zero-egress environment); the
mapping mirrors the module-definition correspondence and will raise on any
unmapped key rather than silently skipping.

  python tools/convert_panoptic.py --checkpoint panoptic_deeplab.pth --out p.npz
"""

import argparse
import re

import numpy as np

_RULES = [
    # (torch regex, flax scope template)
    (r"backbone\.conv1\.weight", "backbone/stem1:conv"),
    (r"backbone\.bn1\.(\w+)", "backbone/stem1:bn"),
    (r"backbone\.conv2\.weight", "backbone/stem2:conv"),
    (r"backbone\.bn2\.(\w+)", "backbone/stem2:bn"),
]


def _put(tree, scope, leaf, val):
    node = tree
    for k in scope.split("/"):
        node = node.setdefault(k, {})
    node[leaf] = val


def convert(sd):
    params, stats = {}, {}

    def emit(scope, kind, leaf, arr):
        # every _ConvBN in our model is scope/{Conv_0,BatchNorm_0}
        if kind == "conv":
            _put(params, scope + "/Conv_0", "kernel",
                 np.transpose(arr, (2, 3, 1, 0)))
        elif leaf == "weight":
            _put(params, scope + "/BatchNorm_0", "scale", arr)
        elif leaf == "bias":
            _put(params, scope + "/BatchNorm_0", "bias", arr)
        elif leaf == "running_mean":
            _put(stats, scope + "/BatchNorm_0", "mean", arr)
        elif leaf == "running_var":
            _put(stats, scope + "/BatchNorm_0", "var", arr)

    unmapped = []
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = val.numpy() if hasattr(val, "numpy") else np.asarray(val)
        k = key
        m = re.match(r"(?:module\.)?backbone\.(conv|bn)([12])\.(\w+)", k)
        if m:
            kind, idx, leaf = m.groups()
            emit(f"backbone/stem{idx}", "conv" if kind == "conv" else "bn",
                 leaf, arr)
            continue
        m = re.match(r"(?:module\.)?backbone\.layer1\.(\d+)\.(conv|bn)(\d)\.(\w+)", k)
        if m:
            b, kind, n, leaf = m.groups()
            # our BottleneckBlock auto-names its convs ConvBNRelu_{0,1,2}
            emit(f"backbone/layer1_{b}/ConvBNRelu_{int(n) - 1}",
                 "conv" if kind == "conv" else "bn", leaf, arr)
            continue
        m = re.match(r"(?:module\.)?backbone\.layer1\.(\d+)\.downsample\.([01])\.(\w+)", k)
        if m:
            b, idx, leaf = m.groups()
            emit(f"backbone/layer1_{b}/downsample",
                 "conv" if idx == "0" else "bn", leaf, arr)
            continue
        m = re.match(r"(?:module\.)?backbone\.transition(\d)\.(\d+)\.(?:(\d+)\.)?([01])\.(\w+)", k)
        if m:
            t, i, j, idx, leaf = m.groups()
            scope = (f"backbone/transition{t}_{i}" if j is None
                     else f"backbone/transition{t}_{i}_{j}")
            emit(scope, "conv" if idx == "0" else "bn", leaf, arr)
            continue
        m = re.match(r"(?:module\.)?backbone\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.(conv|bn)(\d)\.(\w+)", k)
        if m:
            s, mod, br, blk, kind, n, leaf = m.groups()
            # our BasicBlock: conv1 -> ConvBNRelu_0, conv2 -> ConvBNRelu_1
            sub = f"ConvBNRelu_{int(n) - 1}"
            emit(f"backbone/stage{s}_{mod}/branch{br}_block{blk}/{sub}",
                 "conv" if kind == "conv" else "bn", leaf, arr)
            continue
        m = re.match(r"(?:module\.)?backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(?:(\d+)\.)?([01])\.(\w+)", k)
        if m:
            s, mod, i, j, kk, idx, leaf = m.groups()
            scope = (f"backbone/stage{s}_{mod}/fuse_{i}_{j}" if kk is None
                     else f"backbone/stage{s}_{mod}/fuse_{i}_{j}_{kk}")
            emit(scope, "conv" if idx == "0" else "bn", leaf, arr)
            continue
        unmapped.append(key)
    if unmapped:
        raise ValueError(f"{len(unmapped)} unmapped keys, e.g. {unmapped[:8]} "
                         "(decoder/head mapping must be extended for this "
                         "checkpoint's naming)")
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    import torch
    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    params, stats = convert(sd)
    np.savez(args.out, params=np.asarray(params, dtype=object),
             batch_stats=np.asarray(stats, dtype=object))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
