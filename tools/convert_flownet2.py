#!/usr/bin/env python
"""Convert the FlowNet2 torch checkpoint (flownet2.pth.tar, the GDrive
checkpoint the reference downloads in flow_net.py:28-30) to the npz consumed
by c2m_tpu.models.flownet2.

Mapping pinned by tests/test_layers.py::test_deconv_torch_matches_convtranspose2d:
  conv OIHW -> HWIO; ConvTranspose2d [in, out, kh, kw] -> [kh, kw, out, in].
Torch names: <net>.<layer>.0.{weight,bias}; upsampled_flowX_to_Y -> up_flowX.

  python tools/convert_flownet2.py --checkpoint flownet2.pth.tar --out flownet2.npz
"""

import argparse
import re

import numpy as np


def convert(state_dict):
    params = {}

    def put(path, leaf, val):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node.setdefault(path[-1], {})[leaf] = val

    for key, val in state_dict.items():
        arr = val.numpy() if hasattr(val, "numpy") else np.asarray(val)
        parts = key.split(".")
        net = parts[0]                      # flownetc / flownets_1 / ...
        layer = parts[1]
        leaf = parts[-1]                    # weight / bias
        m = re.match(r"upsampled_flow(\d)_to_\d", layer)
        if m:
            layer = f"up_flow{m.group(1)}"
        is_deconv = layer.startswith(("deconv", "up_flow"))
        mod = "ConvTranspose_0" if is_deconv else "Conv_0"
        if leaf == "weight":
            # conv OIHW -> HWIO and deconv [in,out,kh,kw] -> [kh,kw,out,in]
            # are both axes (2, 3, 1, 0)
            put([net, layer, mod], "kernel", np.transpose(arr, (2, 3, 1, 0)))
        elif leaf == "bias":
            put([net, layer, mod], "bias", arr)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    params = convert(sd)
    np.savez(args.out, params=np.asarray(params, dtype=object))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
