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

Parity-tested against the reference torch modules with random weights
(tests/test_converters.py); raises on any unmapped key rather than silently
skipping.

  python tools/convert_panoptic.py --checkpoint panoptic_deeplab.pth --out p.npz
"""

import argparse
import re

import numpy as np

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
        # ---- decoder (decoder/panoptic_deeplab.py + aspp.py + conv_module.py)
        # ASPP branches: convs.0 = 1x1, convs.1-3 = dilated 3x3,
        # convs.4 = image pooling (Sequential: pool, conv, bn)
        m = re.match(r"(?:module\.)?decoder\.(semantic|instance)_decoder\.aspp"
                     r"\.convs\.(\d)\.(?:aspp_pooling\.)?(\d)\.(\w+)", k)
        if m:
            which, branch, idx, leaf = m.groups()
            b = int(branch)
            if b == 4:   # image pooling: bare conv, no BN (aspp.py:23-31)
                _put(params, f"{which}_decoder/aspp/pool_conv", "kernel",
                     np.transpose(arr, (2, 3, 1, 0)))
                continue
            sub = "conv1x1" if b == 0 else f"rate{b - 1}"
            emit(f"{which}_decoder/aspp/{sub}",
                 "conv" if idx == "0" else "bn", leaf, arr)
            continue
        m = re.match(r"(?:module\.)?decoder\.(semantic|instance)_decoder\.aspp"
                     r"\.project\.([01])\.(\w+)", k)
        if m:
            which, idx, leaf = m.groups()
            emit(f"{which}_decoder/aspp/project",
                 "conv" if idx == "0" else "bn", leaf, arr)
            continue
        m = re.match(r"(?:module\.)?decoder\.(semantic|instance)_decoder"
                     r"\.project\.(\d)\.([01])\.(\w+)", k)
        if m:
            which, i, idx, leaf = m.groups()
            emit(f"{which}_decoder/project_{i}",
                 "conv" if idx == "0" else "bn", leaf, arr)
            continue
        # fuse.{i}.0 = depthwise_separable_conv: .0.{0,1}=dw conv+bn,
        # .1=pw conv, .2=pw bn (conv_module.py:29-44)
        m = re.match(r"(?:module\.)?decoder\.(semantic|instance)_decoder"
                     r"\.fuse\.(\d)\.0\.(?:0\.([01])|([12]))\.(\w+)", k)
        if m:
            which, i, dw_idx, pw_idx, leaf = m.groups()
            scope = f"{which}_decoder/fuse_{i}/" + ("dw" if dw_idx is not None
                                                    else "pw")
            idx = dw_idx if dw_idx is not None else ("0" if pw_idx == "1"
                                                     else "1")
            emit(scope, "conv" if idx == "0" else "bn", leaf, arr)
            continue
        # heads: classifier.<key> = Sequential(sep-conv stack, 1x1 Conv2d)
        m = re.match(r"(?:module\.)?decoder\.(?:semantic|instance)_head"
                     r"\.classifier\.(semantic|center|offset)"
                     r"\.(?:0\.0\.(?:0\.([01])|([12]))|1)\.(\w+)", k)
        if m:
            key_name, dw_idx, pw_idx, leaf = m.groups()
            head = f"{key_name}_head"
            if dw_idx is None and pw_idx is None:   # final 1x1 Conv2d (".1.")
                if leaf == "weight":
                    _put(params, f"{head}/out", "kernel",
                         np.transpose(arr, (2, 3, 1, 0)))
                else:
                    _put(params, f"{head}/out", "bias", arr)
                continue
            scope = f"{head}/conv/" + ("dw" if dw_idx is not None else "pw")
            idx = dw_idx if dw_idx is not None else ("0" if pw_idx == "1"
                                                     else "1")
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
