"""Panoptic-DeepLab with HRNet-48 backbone (preprocessing stage 1) in Flax.

Reference: panoptic_deeplab/ (Bowen Cheng's implementation as vendored):
- HRNet-48 (segmentation/model/backbone/hrnet.py; stage config
  segmentation/config/hrnet_config.py HRNET_48): stem of two stride-2 3x3
  convs, a Bottleneck stage, then 3 multi-resolution stages (1/4..1/32) of
  BasicBlocks with full cross-resolution fusion after every module.
- Panoptic-DeepLab decoder (decoder/panoptic_deeplab.py): ASPP(rates 3,6,9)
  over res5, top-down fusion with projected res4/res3/res2 via 5x5
  depthwise-separable convs; semantic head (19 classes) + instance decoder/
  heads (center heatmap + offset).
- Post-processing (post_processing/instance_post_processing.py): max-pool NMS
  on the center heatmap, offset voting to the nearest center, panoptic ids as
  semantic*label_divisor + instance index (thing classes 11..18,
  label_divisor 1000 — tools/generate_segmentation.py:100-103).

Inference-only here (it is an offline preprocessing stage); BNs use running
stats. Weights via tools/convert_panoptic.py from a torch checkpoint.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from c2m_tpu.ops.warp import resize_bilinear

# HRNET_48 stage configuration (hrnet_config.py:16-49)
STAGE2 = dict(modules=1, branches=2, blocks=4, channels=(48, 96))
STAGE3 = dict(modules=4, branches=3, blocks=4, channels=(48, 96, 192))
STAGE4 = dict(modules=3, branches=4, blocks=4, channels=(48, 96, 192, 384))


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    relu: bool = True
    depthwise: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding if self.padding is not None else (self.kernel - 1) // 2
        groups = x.shape[-1] if self.depthwise else 1
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=groups, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5)(x)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNRelu(self.planes, 3, self.stride)(x, train)
        out = ConvBNRelu(self.planes, 3, relu=False)(out, train)
        res = ConvBNRelu(self.planes, 1, self.stride, padding=0,
                         relu=False, name="downsample")(x, train) \
            if self.has_downsample else x
        return nn.relu(out + res)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNRelu(self.planes, 1, padding=0)(x, train)
        out = ConvBNRelu(self.planes, 3, self.stride)(out, train)
        out = ConvBNRelu(self.planes * 4, 1, padding=0, relu=False)(out, train)
        res = ConvBNRelu(self.planes * 4, 1, self.stride, padding=0,
                         relu=False, name="downsample")(x, train) \
            if self.has_downsample else x
        return nn.relu(out + res)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch BasicBlocks + full fusion
    (hrnet.py:138-285)."""
    channels: Sequence[int]
    blocks: int = 4

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        n = len(self.channels)
        outs = []
        for i, x in enumerate(xs):
            for b in range(self.blocks):
                x = BasicBlock(self.channels[i],
                               name=f"branch{i}_block{b}")(x, train)
            outs.append(x)

        fused = []
        for i in range(n):
            y = None
            for j in range(n):
                if j == i:
                    z = outs[j]
                elif j > i:
                    z = ConvBNRelu(self.channels[i], 1, padding=0, relu=False,
                                   name=f"fuse_{i}_{j}")(outs[j], train)
                    z = resize_bilinear(z, outs[i].shape[1:3],
                                        align_corners=True)
                else:
                    z = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        z = ConvBNRelu(self.channels[i] if last
                                       else self.channels[j], 3, 2,
                                       relu=not last,
                                       name=f"fuse_{i}_{j}_{k}")(z, train)
                y = z if y is None else y + z
            fused.append(nn.relu(y))
        return fused


class HRNet48(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = ConvBNRelu(64, 3, 2, name="stem1")(x, train)
        x = ConvBNRelu(64, 3, 2, name="stem2")(x, train)
        # stage 1: 4 Bottlenecks at 64 -> 256 channels
        x = BottleneckBlock(64, has_downsample=True, name="layer1_0")(x, train)
        for b in range(1, 4):
            x = BottleneckBlock(64, name=f"layer1_{b}")(x, train)

        def transition(xs, prev_ch, cur_ch, name):
            outs = []
            np_, nc = len(prev_ch), len(cur_ch)
            for i in range(nc):
                if i < np_:
                    if prev_ch[i] != cur_ch[i]:
                        outs.append(ConvBNRelu(cur_ch[i], 3,
                                               name=f"{name}_{i}")(xs[i], train))
                    else:
                        outs.append(xs[i])
                else:
                    z = xs[-1]
                    for j in range(i + 1 - np_):
                        out_c = cur_ch[i] if j == i - np_ else prev_ch[-1]
                        z = ConvBNRelu(out_c, 3, 2,
                                       name=f"{name}_{i}_{j}")(z, train)
                    outs.append(z)
            return outs

        xs = transition([x], (256,), STAGE2["channels"], "transition1")
        for m in range(STAGE2["modules"]):
            xs = HRModule(STAGE2["channels"], name=f"stage2_{m}")(xs, train)
        xs = transition(xs, STAGE2["channels"], STAGE3["channels"], "transition2")
        for m in range(STAGE3["modules"]):
            xs = HRModule(STAGE3["channels"], name=f"stage3_{m}")(xs, train)
        xs = transition(xs, STAGE3["channels"], STAGE4["channels"], "transition3")
        for m in range(STAGE4["modules"]):
            xs = HRModule(STAGE4["channels"], name=f"stage4_{m}")(xs, train)
        return {"res2": xs[0], "res3": xs[1], "res4": xs[2], "res5": xs[3]}


class ASPP(nn.Module):
    """decoder/aspp.py: 1x1 + three dilated 3x3 + image pooling, projected."""
    out_channels: int
    rates: Sequence[int] = (3, 6, 9)

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [ConvBNRelu(self.out_channels, 1, padding=0,
                               name="conv1x1")(x, train)]
        for i, r in enumerate(self.rates):
            branches.append(ConvBNRelu(self.out_channels, 3, padding=r,
                                       dilation=r, name=f"rate{i}")(x, train))
        # image pooling branch: AdaptiveAvgPool(1) + conv(bias=False) + relu
        # (NO BatchNorm, aspp.py:23-31); bilinear upsample of 1x1 == broadcast
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(nn.Conv(self.out_channels, (1, 1), use_bias=False,
                                 name="pool_conv")(pooled))
        pooled = jnp.broadcast_to(pooled, (*x.shape[:3], self.out_channels))
        branches.append(pooled)
        y = jnp.concatenate(branches, -1)
        return ConvBNRelu(self.out_channels, 1, padding=0, name="project")(
            y, train)


class SeparableConv5(nn.Module):
    """stacked_conv(kernel 5, depthwise_separable) (conv_module.py)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(x.shape[-1], 5, depthwise=True, name="dw")(x, train)
        return ConvBNRelu(self.features, 1, padding=0, name="pw")(x, train)


class SingleDecoder(nn.Module):
    decoder_channels: int
    aspp_channels: int
    project_channels: Sequence[int]

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = ASPP(self.aspp_channels, name="aspp")(feats["res5"], train)
        for i, key in enumerate(("res4", "res3", "res2")):
            low = ConvBNRelu(self.project_channels[i], 1, padding=0,
                             name=f"project_{i}")(feats[key], train)
            x = resize_bilinear(x, low.shape[1:3], align_corners=True)
            x = SeparableConv5(self.decoder_channels, name=f"fuse_{i}")(
                jnp.concatenate([x, low], -1), train)
        return x


class Head(nn.Module):
    head_channels: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConv5(self.head_channels, name="conv")(x, train)
        return nn.Conv(self.num_classes, (1, 1), name="out")(x)


class PanopticDeepLab(nn.Module):
    num_classes: int = 19
    upsample: bool = True  # False: decoder-native (res2) resolution outputs

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        h, w = x.shape[1:3]
        feats = HRNet48(name="backbone")(x, train)
        sem = SingleDecoder(256, 256, (128, 64, 32),
                            name="semantic_decoder")(feats, train)
        semantic = Head(256, self.num_classes, name="semantic_head")(sem, train)
        inst = SingleDecoder(128, 256, (64, 32, 16),
                             name="instance_decoder")(feats, train)
        center = Head(32, 1, name="center_head")(inst, train)
        offset = Head(32, 2, name="offset_head")(inst, train)
        if self.upsample:
            up = lambda v: resize_bilinear(v, (h, w), align_corners=True)
        else:
            up = lambda v: v
        return {"semantic": up(semantic), "center": up(center),
                "offset": up(offset)}


# ---------------------------------------------------------------------------
# Post-processing (post_processing/instance_post_processing.py:182,
# semantic_post_processing.py:11)
# ---------------------------------------------------------------------------

THING_CLASSES = tuple(range(11, 19))
LABEL_DIVISOR = 1000


def postprocess(semantic: np.ndarray, center: np.ndarray, offset: np.ndarray,
                center_threshold: float = 0.1, nms_kernel: int = 7,
                top_k: int = 200) -> Tuple[np.ndarray, np.ndarray]:
    """-> (semantic trainId map [H, W], instance-id map [H, W])."""
    sem = np.argmax(semantic, axis=-1)
    heat = center[..., 0]
    h, w = heat.shape
    # max-pool NMS
    pad = nms_kernel // 2
    padded = np.pad(heat, pad, constant_values=-np.inf)
    windows = np.lib.stride_tricks.sliding_window_view(
        padded, (nms_kernel, nms_kernel))
    is_peak = (heat >= windows.max(axis=(2, 3))) & (heat > center_threshold)
    ys, xs = np.nonzero(is_peak)
    if len(ys) > top_k:
        order = np.argsort(-heat[ys, xs])[:top_k]
        ys, xs = ys[order], xs[order]
    instance = np.zeros((h, w), np.int32)
    if len(ys):
        yy, xx = np.mgrid[0:h, 0:w]
        vote_y = yy + offset[..., 0]
        vote_x = xx + offset[..., 1]
        d2 = ((vote_y[..., None] - ys[None, None]) ** 2
              + (vote_x[..., None] - xs[None, None]) ** 2)
        nearest = np.argmin(d2, axis=-1) + 1
        thing = np.isin(sem, THING_CLASSES)
        # per-class instance indexing: id = trainId * divisor + running index
        inst_map = np.where(thing, nearest, 0)
        out = np.zeros((h, w), np.int32)
        for cls in THING_CLASSES:
            mask = (sem == cls) & (inst_map > 0)
            ids = np.unique(inst_map[mask])
            for k, iid in enumerate(ids, start=1):
                out[mask & (inst_map == iid)] = cls * LABEL_DIVISOR + k
        instance = out
    return sem.astype(np.int32), instance
