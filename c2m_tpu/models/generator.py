"""Occlusion-aware frame generator (+ optional SPADE path).

Reference: src/modules/generator/{generator.py, flowembedder.py}. Encodes the
conditioning frame, warps the *bottleneck features* with the predicted dense
flow, multiplies by the occlusion map (the inpainting mask), runs residual
blocks and decodes to RGB with a sigmoid head. The SPADE path (use_spade=True)
instead conditions the up blocks on FlowEmbedder features of
[warped image, flow, occlusion]; an extra warped-image encoder branch exists
for KITTI (generator.py:37-48, 139-145).

The generator runs on the time-folded batch [B*T, H, W, C] — one big conv
batch per step, ideal for the MXU.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn

from c2m_tpu.config import FlowEmbedderParams, GeneratorParams
from c2m_tpu.nn.layers import (Conv, DownBlock2d, InstanceNorm, ResidualBlock,
                               SameBlock2d, UpBlock2d, leaky)
from c2m_tpu.ops.warp import resample, resize_bilinear


def deform_input(inp: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp ``inp`` by ``flow`` after resizing the flow to inp's spatial size
    WITHOUT magnitude rescale (reference generator.py:80-86 interpolates the
    raw flow values)."""
    h, w = inp.shape[1:3]
    if flow.shape[1:3] != (h, w):
        flow = resize_bilinear(flow, (h, w), align_corners=False)
    return resample(inp, flow)


def apply_optical(inp: jnp.ndarray, flow: jnp.ndarray,
                  occlusion: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Warp + occlusion-mask (reference generator.py:88-96)."""
    warped = deform_input(inp, flow)
    if occlusion is None:
        return warped
    if occlusion.shape[1:3] != warped.shape[1:3]:
        occlusion = resize_bilinear(occlusion, warped.shape[1:3],
                                    align_corners=False)
    return warped * occlusion


class FlowEmbedder(nn.Module):
    """U-net embedding of [warped img, flow, occ] -> multiscale SPADE maps
    (flowembedder.py:9-81)."""
    params: FlowEmbedderParams
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> List[jnp.ndarray]:
        p = self.params
        ch = [min(p.max_expansion, p.block_expansion * (2 ** i))
              for i in range(p.num_down_blocks + 1)]
        outputs = [SameBlock2d(p.block_expansion, 3, 1, 1,
                               padding_mode=p.padding_mode, use_norm=False,
                               dtype=self.dtype, name="first")(x)]
        for i in range(p.num_down_blocks):
            outputs.append(DownBlock2d(ch[i + 1], 4, 2, 1,
                                       padding_mode=p.padding_mode,
                                       dtype=self.dtype,
                                       name=f"down_{i}")(outputs[-1], train=train))
        if not p.use_decoder:
            return outputs
        for i in reversed(range(p.num_down_blocks)):
            inp = outputs[-1]
            if i != p.num_down_blocks - 1:
                nh, nw = outputs[i + 1].shape[1:3]
                if inp.shape[1:3] != (nh, nw):
                    inp = resize_bilinear(inp, (nh, nw), align_corners=False)
                inp = jnp.concatenate([inp, outputs[i + 1]], axis=-1)
            outputs.append(UpBlock2d(ch[i], 3, 1, 1, padding_mode=p.padding_mode,
                                     dtype=self.dtype, name=f"up_{i}")(inp,
                                                                       train=train))
        return outputs[p.num_down_blocks:][::-1]


class SpatiallyAdaptiveNorm(nn.Module):
    """SPADE (spade_block.py:7-77): instance-norm modulated by conv features
    of the conditioning map."""
    num_filters: int = 128
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        out = InstanceNorm(affine=False)(x)
        if cond.shape[1:3] != x.shape[1:3]:
            from c2m_tpu.ops.warp import resize_nearest
            cond = resize_nearest(cond, x.shape[1:3])
        m = SameBlock2d(self.num_filters, self.kernel_size, 1,
                        self.kernel_size // 2, padding_mode="reflect",
                        use_norm=False, dtype=self.dtype, name="mlp")(cond)
        gb = Conv(x.shape[-1] * 2, self.kernel_size, 1, self.kernel_size // 2,
                  "reflect", dtype=self.dtype, name="gamma_beta")(m)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return out * (1.0 + gamma) + beta


class ResidualSpadeBlock(nn.Module):
    """SPADE residual up block (residual_block.py:34-71)."""
    features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        in_planes = x.shape[-1]
        dx = SpatiallyAdaptiveNorm(dtype=self.dtype, name="norm1")(x, cond)
        dx = Conv(self.features, self.kernel_size, 1, 1, "reflect",
                  dtype=self.dtype, name="conv1")(leaky(dx))
        dx = SpatiallyAdaptiveNorm(dtype=self.dtype, name="norm2")(dx, cond)
        dx = Conv(self.features, self.kernel_size, 1, 1, "reflect",
                  dtype=self.dtype, name="conv2")(leaky(dx))
        if in_planes != self.features:
            xs = SpatiallyAdaptiveNorm(dtype=self.dtype, name="norm_s")(x, cond)
            xs = Conv(self.features, 1, 1, 0, "zeros", use_bias=False,
                      dtype=self.dtype, name="conv_s")(leaky(xs))
            return dx + xs
        return dx


class OcclusionAwareGenerator(nn.Module):
    params: GeneratorParams
    flow_params: FlowEmbedderParams
    dataset: str = "cityscapes"
    dtype: Optional[jnp.dtype] = None
    s2d_tail: bool = False  # run the full-res entry/exit segments on the
    # lane-filling space-to-depth form (nn/s2d_blocks.py): exact, same param
    # tree; pays at >=512x512 (tools/bench_s2d.py), non-SPADE path only

    @nn.compact
    def __call__(self, first_frame: jnp.ndarray, flow: jnp.ndarray,
                 occlusion: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """first_frame: [B*, H, W, 3] (time folded into batch); flow [B*, H, W, 2];
        occlusion [B*, H, W, 1] -> generated RGB [B*, H, W, 3] in [0,1]."""
        p = self.params
        nd = p.num_down_blocks
        use_s2d = (self.s2d_tail and not p.use_spade and nd > 0
                   and first_frame.shape[1] % 2 == 0
                   and first_frame.shape[2] % 2 == 0)
        if use_s2d:
            from c2m_tpu.nn import s2d as _s2d
            from c2m_tpu.nn import s2d_blocks as sb

        flow_features = None
        if p.use_spade:
            img_warp = apply_optical(first_frame, flow, None)
            embed_in = jnp.concatenate([img_warp, flow, occlusion], axis=-1)
            flow_features = FlowEmbedder(self.flow_params, dtype=self.dtype,
                                         name="flowembedder")(embed_in, train=train)

        if use_s2d:
            out = sb.SameBlock2dS2d(p.block_expansion, 7, p.padding_mode,
                                    dtype=self.dtype,
                                    name="first")(_s2d.to_s2d(first_frame))
            feat0 = min(p.max_expansion, p.block_expansion * 2)
            out = sb.DownBlock2dS2dIn(feat0, p.padding_mode, dtype=self.dtype,
                                      name="down_0")(out, train=train)
            down_start = 1
        else:
            out = SameBlock2d(p.block_expansion, kernel_size=7, strides=1,
                              padding=3, padding_mode=p.padding_mode,
                              dtype=self.dtype, name="first")(first_frame)
            down_start = 0
        for i in range(down_start, nd):
            features = min(p.max_expansion, p.block_expansion * (2 ** (i + 1)))
            out = DownBlock2d(features, 4, 2, 1, padding_mode=p.padding_mode,
                              dtype=self.dtype, name=f"down_{i}")(out, train=train)
        if not p.use_spade:
            out = apply_optical(out, flow, occlusion)
        for i in range(p.num_bottleneck_blocks):
            out = ResidualBlock(out.shape[-1], 3, 1, dtype=self.dtype,
                                name=f"middle_{i}")(out, train=train)

        if "kitti" in self.dataset:
            img_warp = apply_optical(first_frame, flow, None)
            if use_s2d:
                xw = sb.SameBlock2dS2d(p.block_expansion, 7, p.padding_mode,
                                       dtype=self.dtype,
                                       name="first_warped")(_s2d.to_s2d(img_warp))
                feat0 = min(p.max_expansion, p.block_expansion * 2)
                xw = sb.DownBlock2dS2dIn(feat0, p.padding_mode,
                                         dtype=self.dtype,
                                         name="down_warped_0")(xw, train=train)
                dw_start = 1
            else:
                xw = SameBlock2d(p.block_expansion, 7, 1, 3,
                                 padding_mode=p.padding_mode, dtype=self.dtype,
                                 name="first_warped")(img_warp)
                dw_start = 0
            for i in range(dw_start, nd):
                features = min(p.max_expansion, p.block_expansion * (2 ** (i + 1)))
                xw = DownBlock2d(features, 4, 2, 1, padding_mode=p.padding_mode,
                                 dtype=self.dtype,
                                 name=f"down_warped_{i}")(xw, train=train)
            occ_r = occlusion
            if xw.shape[1:3] != occ_r.shape[1:3]:
                occ_r = resize_bilinear(occ_r, xw.shape[1:3], align_corners=False)
            out = SameBlock2d(xw.shape[-1], 3, 1, 1, padding_mode=p.padding_mode,
                              dtype=self.dtype, name="pre_decode")(
                jnp.concatenate([out, xw * occ_r], axis=-1))

        out_is_s2d = False
        for i in range(nd):
            features = min(p.max_expansion, p.block_expansion * (2 ** (nd - i - 1)))
            if p.use_spade:
                cond = flow_features[min(nd - i, len(flow_features) - 1)]
                if out.shape[1:3] != cond.shape[1:3]:
                    out = resize_bilinear(out, cond.shape[1:3], align_corners=False)
                out = ResidualSpadeBlock(features, 3, dtype=self.dtype,
                                         name=f"up_{i}")(out, cond)
                h, w = out.shape[1:3]
                out = resize_bilinear(out, (h * 2, w * 2), align_corners=False)
            elif (use_s2d and i == nd - 1
                  and (out.shape[1] * 2, out.shape[2] * 2)
                  == first_frame.shape[1:3]):
                # last up emits the s2d form; the full-res tensor is never
                # materialized in plain layout
                out = sb.UpBlock2dS2d(features, 3, p.padding_mode,
                                      dtype=self.dtype,
                                      name=f"up_{i}")(out, train=train)
                out_is_s2d = True
            else:
                out = UpBlock2d(features, 3, 1, 1, padding_mode=p.padding_mode,
                                dtype=self.dtype, name=f"up_{i}")(out, train=train)
        if out_is_s2d:
            out = sb.ConvS2d(3, 7, "zeros", dtype=self.dtype,
                             name="final")(out)
            out = _s2d.from_s2d(out)
        else:
            if out.shape[1:3] != first_frame.shape[1:3]:
                out = resize_bilinear(out, first_frame.shape[1:3],
                                      align_corners=False)
            out = Conv(3, 7, 1, 3, "zeros", dtype=self.dtype, name="final")(out)
        return nn.sigmoid(out.astype(jnp.float32))
