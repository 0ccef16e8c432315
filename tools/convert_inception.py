#!/usr/bin/env python
"""Convert torchvision InceptionV3 weights to the npz consumed by
c2m_tpu.eval.inception (FID embedder). Requires torchvision + its checkpoint
locally (zero-egress).

  python tools/convert_inception.py --out inception_v3.npz [--torch-checkpoint p]
"""

import argparse

import numpy as np


def convert(sd):
    """torchvision inception_v3 state_dict -> (params, batch_stats) trees for
    c2m_tpu.eval.inception.InceptionV3Pool3 (AuxLogits/fc dropped)."""
    params, stats = {}, {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, val in sd.items():
        if key.startswith(("AuxLogits", "fc")):
            continue
        parts = key.split(".")
        # torchvision: <Block>.<branch>.conv.weight / .bn.{weight,bias,
        # running_mean,running_var}; flax: <Block>/<branch>/{Conv_0,BatchNorm_0}
        mod_path = parts[:-2] if parts[-2] in ("conv", "bn") else parts[:-1]
        kind, leaf = parts[-2], parts[-1]
        arr = val.numpy()
        if kind == "conv" and leaf == "weight":
            put(params, [*mod_path, "Conv_0", "kernel"],
                np.transpose(arr, (2, 3, 1, 0)))
        elif kind == "bn":
            if leaf == "weight":
                put(params, [*mod_path, "BatchNorm_0", "scale"], arr)
            elif leaf == "bias":
                put(params, [*mod_path, "BatchNorm_0", "bias"], arr)
            elif leaf == "running_mean":
                put(stats, [*mod_path, "BatchNorm_0", "mean"], arr)
            elif leaf == "running_var":
                put(stats, [*mod_path, "BatchNorm_0", "var"], arr)
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--torch-checkpoint", default=None)
    args = ap.parse_args()

    import torch
    if args.torch_checkpoint:
        sd = torch.load(args.torch_checkpoint, map_location="cpu")
    else:
        import torchvision
        sd = torchvision.models.inception_v3(weights="DEFAULT").state_dict()

    params, stats = convert(sd)
    np.savez(args.out, params=np.asarray(params, dtype=object),
             batch_stats=np.asarray(stats, dtype=object))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
