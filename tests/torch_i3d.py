"""Torch replica of the kinetics I3D trunk (public pytorch-i3d checkpoint
layout), used ONLY by the converter parity tests: there is no importable
torch I3D in the reference (it drives a TF-Hub module), but
tools/convert_i3d.py consumes the public ``rgb_imagenet.pt`` state_dict
naming, so this replica provides a random-init state_dict with that layout
plus a reference forward to the 1024-d FVD embedding. TF-SAME (asymmetric)
padding throughout, BN eps 1e-3 (TF semantics)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _same_pad(x, kernel, stride):
    """TF-SAME padding over (T, H, W) of an NCTHW tensor."""
    pads = []
    for size, k, s in zip(x.shape[2:], kernel, stride):
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        pads.append((total // 2, total - total // 2))
    # F.pad order: last dim first
    flat = [v for p in reversed(pads) for v in p]
    return F.pad(x, flat)


class Unit3D(nn.Module):
    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, act=True):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.use_bn, self.act = use_bn, act
        self.conv3d = nn.Conv3d(in_ch, out_ch, kernel, stride,
                                bias=not use_bn)
        if use_bn:
            self.bn = nn.BatchNorm3d(out_ch, eps=1e-3)

    def forward(self, x):
        x = self.conv3d(_same_pad(x, self.kernel, self.stride))
        if self.use_bn:
            x = self.bn(x)
        return F.relu(x) if self.act else x


def _maxpool_same(x, kernel, stride):
    x = _same_pad(x, kernel, stride)
    return F.max_pool3d(x, kernel, stride)


class Mixed(nn.Module):
    def __init__(self, in_ch, c):
        super().__init__()
        self.b0 = Unit3D(in_ch, c[0])
        self.b1a = Unit3D(in_ch, c[1])
        self.b1b = Unit3D(c[1], c[2], (3, 3, 3))
        self.b2a = Unit3D(in_ch, c[3])
        self.b2b = Unit3D(c[3], c[4], (3, 3, 3))
        self.b3b = Unit3D(in_ch, c[5])

    def forward(self, x):
        return torch.cat([
            self.b0(x),
            self.b1b(self.b1a(x)),
            self.b2b(self.b2a(x)),
            self.b3b(_maxpool_same(x, (3, 3, 3), (1, 1, 1))),
        ], 1)


class I3DTrunk(nn.Module):
    """Kinetics I3D up to the pre-logits spatiotemporal average (FVD)."""

    def __init__(self):
        super().__init__()
        self.Conv3d_1a_7x7 = Unit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = Unit3D(64, 64)
        self.Conv3d_2c_3x3 = Unit3D(64, 192, (3, 3, 3))
        self.Mixed_3b = Mixed(192, (64, 96, 128, 16, 32, 32))
        self.Mixed_3c = Mixed(256, (128, 128, 192, 32, 96, 64))
        self.Mixed_4b = Mixed(480, (192, 96, 208, 16, 48, 64))
        self.Mixed_4c = Mixed(512, (160, 112, 224, 24, 64, 64))
        self.Mixed_4d = Mixed(512, (128, 128, 256, 24, 64, 64))
        self.Mixed_4e = Mixed(512, (112, 144, 288, 32, 64, 64))
        self.Mixed_4f = Mixed(528, (256, 160, 320, 32, 128, 128))
        self.Mixed_5b = Mixed(832, (256, 160, 320, 32, 128, 128))
        self.Mixed_5c = Mixed(832, (384, 192, 384, 48, 128, 128))
        self.logits = Unit3D(1024, 400, use_bn=False, act=False)

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3b(x)
        x = self.Mixed_3c(x)
        x = _maxpool_same(x, (3, 3, 3), (2, 2, 2))
        x = self.Mixed_4b(x)
        x = self.Mixed_4c(x)
        x = self.Mixed_4d(x)
        x = self.Mixed_4e(x)
        x = self.Mixed_4f(x)
        x = _maxpool_same(x, (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        return x.mean(dim=(2, 3, 4))  # [B, 1024]
