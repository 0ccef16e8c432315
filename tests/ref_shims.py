"""Offline import shims for the /root/reference torch modules.

The converter parity tests (tests/test_converters.py) execute the reference's
own nn.Module definitions with RANDOM weights to prove our converters map a
real state_dict onto numerically identical flax networks (VERDICT r1 #2).
Some reference imports need substitutes in this environment:

  yacs         -- not installed; pysot only needs an attribute-dict CfgNode.
  correlation  -- CUDA extension; pure-torch cost volume with the kernel's
                  documented semantics (correlation_cuda_kernel.cu:74-149,
                  pinned on the jnp side by c2m_tpu.ops.correlation).
  resample2d   -- CUDA extension; pixel-space border bilinear warp
                  (resample2d_kernel.cu:16-77).
  channelnorm  -- CUDA extension; per-pixel channel L2 norm.

These shims are OUR implementations of the documented op semantics, written
for the torch side of the parity harness only.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"


def _install_yacs():
    if "yacs" in sys.modules:
        return

    class CfgNode(dict):
        def __init__(self, init=None, new_allowed=False):
            super().__init__(init or {})

        def __getattr__(self, key):
            try:
                return self[key]
            except KeyError:
                raise AttributeError(key)

        def __setattr__(self, key, value):
            self[key] = value

        def clone(self):
            import copy
            return copy.deepcopy(self)

        def freeze(self):
            pass

    yacs = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")
    config.CfgNode = CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


def _install_cuda_op_shims():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "correlation" not in sys.modules:
        class Correlation(nn.Module):
            def __init__(self, pad_size=20, kernel_size=1,
                         max_displacement=20, stride1=1, stride2=2,
                         corr_multiply=1):
                super().__init__()
                assert kernel_size == 1 and stride1 == 1 and corr_multiply == 1
                assert pad_size == max_displacement
                self.md = max_displacement
                self.stride2 = stride2

            def forward(self, in1, in2):
                md, s = self.md, self.stride2
                b, c, h, w = in1.shape
                p = F.pad(in2, (md, md, md, md))
                outs = []
                for dy in range(-md, md + 1, s):
                    for dx in range(-md, md + 1, s):
                        win = p[:, :, md + dy:md + dy + h, md + dx:md + dx + w]
                        outs.append((in1 * win).mean(1))
                return torch.stack(outs, 1)

        mod = types.ModuleType("correlation")
        mod.Correlation = Correlation
        sys.modules["correlation"] = mod

    if "resample2d" not in sys.modules:
        class Resample2d(nn.Module):
            def forward(self, img, flow):
                b, c, h, w = img.shape
                ys = torch.arange(h, dtype=img.dtype)
                xs = torch.arange(w, dtype=img.dtype)
                gy, gx = torch.meshgrid(ys, xs, indexing="ij")
                sx = gx[None] + flow[:, 0]
                sy = gy[None] + flow[:, 1]
                # normalized align_corners=True grid == raw pixel coords
                gxn = 2.0 * sx / max(w - 1, 1) - 1.0
                gyn = 2.0 * sy / max(h - 1, 1) - 1.0
                grid = torch.stack([gxn, gyn], dim=-1)
                return F.grid_sample(img, grid, mode="bilinear",
                                     padding_mode="border",
                                     align_corners=True)

        mod = types.ModuleType("resample2d")
        mod.Resample2d = Resample2d
        sys.modules["resample2d"] = mod

    if "channelnorm" not in sys.modules:
        class ChannelNorm(nn.Module):
            def forward(self, x):
                return x.pow(2).sum(1, keepdim=True).sqrt()

        mod = types.ModuleType("channelnorm")
        mod.ChannelNorm = ChannelNorm
        sys.modules["channelnorm"] = mod


def add_ref_paths():
    """Make the reference packages importable, with required shims."""
    _install_yacs()
    _install_cuda_op_shims()
    for p in (f"{REF}/src", f"{REF}/pysot", f"{REF}/panoptic_deeplab"):
        if p not in sys.path:
            sys.path.append(p)


def randomize_bn_stats(model, seed=0):
    """Give torch BatchNorms non-trivial affine + running stats so the
    converter's stats mapping is actually exercised."""
    import torch
    import torch.nn as nn
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
