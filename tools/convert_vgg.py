#!/usr/bin/env python
"""Convert torchvision VGG19 weights to the npz consumed by
c2m_tpu.nn.vgg.load_vgg19_params (perceptual loss).

Zero-egress environments need the torch checkpoint already on disk (either the
torchvision cache or an explicit --torch-checkpoint path to vgg19 features
state_dict). Conv kernels transpose OIHW -> HWIO.

  python tools/convert_vgg.py --out vgg19.npz [--torch-checkpoint path.pth]
"""

import argparse

import numpy as np

_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))


def convert(sd):
    """torchvision vgg19 ``features.N.{weight,bias}`` state_dict -> flat npz
    dict ``conv{s}_{i}.{kernel,bias}`` (kernel HWIO)."""
    # torchvision features indices of the conv layers, in order
    conv_indices = []
    i = 0
    for _, n_convs in _STAGES:
        for _ in range(n_convs):
            conv_indices.append(i)
            i += 2          # conv + relu
        i += 1              # maxpool

    def arr(v):
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    out = {}
    k = 0
    for stage, (_, n_convs) in enumerate(_STAGES, start=1):
        for ci in range(1, n_convs + 1):
            idx = conv_indices[k]
            w = arr(sd[f"features.{idx}.weight"])         # [O, I, kh, kw]
            b = arr(sd[f"features.{idx}.bias"])
            out[f"conv{stage}_{ci}.kernel"] = np.transpose(w, (2, 3, 1, 0))
            out[f"conv{stage}_{ci}.bias"] = b
            k += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--torch-checkpoint", default=None,
                    help="state_dict of torchvision vgg19 (full model or "
                         ".features); defaults to the torchvision hub cache")
    args = ap.parse_args()

    import torch
    if args.torch_checkpoint:
        sd = torch.load(args.torch_checkpoint, map_location="cpu")
        if not any(k.startswith("features") for k in sd):
            sd = {f"features.{k}": v for k, v in sd.items()}
    else:
        import torchvision
        sd = torchvision.models.vgg19(weights="DEFAULT").state_dict()

    out = convert(sd)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
