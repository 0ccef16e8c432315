#!/usr/bin/env python
"""Convert a pysot siamrpn_r50_l234_dwxcorr checkpoint to the npz consumed by
c2m_tpu.models.siamrpn (tracker weights for tools/generate_trajectories.py).

Torch names (pysot ModelBuilder state dict) -> flax scopes:
  backbone.conv1/bn1              -> backbone/conv1/{Conv_0,BatchNorm_0}
  backbone.layerL.B.convK/bnK     -> backbone/layer{L}_{B}/conv{K}/...
  backbone.layerL.B.downsample.{0,1} -> backbone/layer{L}_{B}/downsample/...
  neck.downsampleN.downsample.{0,1}  -> neck_{N-2}/downsample/...
  rpn_head.rpnN.{cls,loc}.conv_kernel/conv_search/head -> rpn_{N-2}/{cls,loc}/...
  rpn_head.{cls,loc}_weight       -> {cls,loc}_weight

  python tools/convert_siamrpn.py --checkpoint siamrpn_r50.pth --out siamrpn.npz
"""

import argparse
import re

import numpy as np


def _put(tree, path, leaf, val):
    node = tree
    for k in path:
        node = node.setdefault(k, {})
    node[leaf] = val


def convert(sd):
    params, stats = {}, {}

    def conv_bn(scope, kind, arr, leaf):
        """kind: 'conv' weight or bn {weight,bias,running_mean,running_var}."""
        if kind == "conv":
            _put(params, [*scope, "Conv_0"], "kernel",
                 np.transpose(arr, (2, 3, 1, 0)))
        elif leaf == "weight":
            _put(params, [*scope, "BatchNorm_0"], "scale", arr)
        elif leaf == "bias":
            _put(params, [*scope, "BatchNorm_0"], "bias", arr)
        elif leaf == "running_mean":
            _put(stats, [*scope, "BatchNorm_0"], "mean", arr)
        elif leaf == "running_var":
            _put(stats, [*scope, "BatchNorm_0"], "var", arr)

    for key, val in sd.items():
        arr = val.numpy() if hasattr(val, "numpy") else np.asarray(val)
        if key in ("rpn_head.cls_weight", "rpn_head.loc_weight"):
            params[key.split(".")[1]] = arr
            continue
        m = re.match(r"backbone\.conv1\.(weight)", key)
        if m:
            conv_bn(["backbone", "conv1"], "conv", arr, m.group(1))
            continue
        m = re.match(r"backbone\.bn1\.(\w+)", key)
        if m and m.group(1) != "num_batches_tracked":
            conv_bn(["backbone", "conv1"], "bn", arr, m.group(1))
            continue
        m = re.match(r"backbone\.layer(\d)\.(\d+)\.(conv|bn)(\d)\.(\w+)", key)
        if m:
            l, b, kind, k, leaf = m.groups()
            if leaf == "num_batches_tracked":
                continue
            conv_bn(["backbone", f"layer{l}_{b}", f"conv{k}"],
                    "conv" if kind == "conv" else "bn", arr, leaf)
            continue
        m = re.match(r"backbone\.layer(\d)\.(\d+)\.downsample\.([01])\.(\w+)", key)
        if m:
            l, b, idx, leaf = m.groups()
            if leaf == "num_batches_tracked":
                continue
            conv_bn(["backbone", f"layer{l}_{b}", "downsample"],
                    "conv" if idx == "0" else "bn", arr, leaf)
            continue
        m = re.match(r"neck\.downsample(\d)\.downsample\.([01])\.(\w+)", key)
        if m:
            n, idx, leaf = m.groups()
            if leaf == "num_batches_tracked":
                continue
            conv_bn([f"neck_{int(n) - 2}", "downsample"],
                    "conv" if idx == "0" else "bn", arr, leaf)
            continue
        m = re.match(r"rpn_head\.rpn(\d)\.(cls|loc)\.(conv_kernel|conv_search|head)"
                     r"\.(\d)\.(\w+)", key)
        if m:
            n, branch, part, idx, leaf = m.groups()
            if leaf == "num_batches_tracked":
                continue
            base = [f"rpn_{int(n) - 2}", branch]
            if part in ("conv_kernel", "conv_search"):
                scope = [*base, "kernel_conv" if part == "conv_kernel"
                         else "search_conv"]
                conv_bn(scope, "conv" if idx == "0" else "bn", arr, leaf)
            else:  # head: [conv, bn, relu, conv-with-bias]
                if idx == "0":
                    conv_bn([*base, "head1"], "conv", arr, leaf)
                elif idx == "1":
                    conv_bn([*base, "head1"], "bn", arr, leaf)
                elif idx == "3":
                    if leaf == "weight":
                        _put(params, [*base, "head2"], "kernel",
                             np.transpose(arr, (2, 3, 1, 0)))
                    else:
                        _put(params, [*base, "head2"], "bias", arr)
            continue
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
