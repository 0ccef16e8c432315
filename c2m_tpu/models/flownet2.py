"""FlowNet2 (C + S1 + S2 + SD + Fusion) in Flax — optical-flow precompute /
on-the-fly flow for training.

Reference: src/modules/third_party/flow_net/ (NVIDIA flownet2-pytorch
derivative; stack wiring in flownet2/models.py:20-172, submodules in
networks/*.py). The three CUDA extensions map to:
  resample2d   -> c2m_tpu.ops.warp.resample_pixel (pixel-space bilinear
                  border warp, resample2d_kernel.cu:16-77 semantics)
  correlation  -> c2m_tpu.ops.correlation.correlation
  channelnorm  -> c2m_tpu.ops.correlation.channel_norm

Layout NHWC; LeakyReLU(0.1) convs; torch ConvTranspose2d(4,2,1) reproduced
exactly (see ``DeconvTorch``). use_batch_norm=False (the pretrained
configuration). Weights: converted from a torch checkpoint when available
(tools/convert_flownet2.py); zero-egress default is random init.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from c2m_tpu.ops.correlation import channel_norm, correlation
from c2m_tpu.ops.splat import occlusion_map
from c2m_tpu.ops.warp import resample_pixel, resize_bilinear, resize_nearest


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class ConvL(nn.Module):
    """conv(pad (k-1)//2) + LeakyReLU(0.1) (submodules.py conv())."""
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_init=nn.initializers.xavier_uniform())(x)
        return _leaky(y) if self.act else y


class DeconvTorch(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) exact equivalent + LeakyReLU(0.1).

    use_bias quirk (load-bearing for checkpoint conversion): FlowNetS's
    upsampled_flowX_to_Y layers are bias=False (flownet_s.py:57-64); the
    same layers in FlowNetC/SD/Fusion and all deconvX are bias=True."""
    features: int
    act: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(4, 2, padding=1) == lax padding (2, 2)
        y = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)),
                             transpose_kernel=True, use_bias=self.use_bias,
                             kernel_init=nn.initializers.xavier_uniform())(x)
        return _leaky(y) if self.act else y


def _predict(x, name_scope):
    return ConvL(2, kernel=3, stride=1, act=False, name=name_scope)(x)


class FlowNetS(nn.Module):
    """networks/flownet_s.py — plain encoder-decoder refinement net."""
    input_channels: int = 12

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        c1 = ConvL(64, 7, 2, name="conv1")(x)
        c2 = ConvL(128, 5, 2, name="conv2")(c1)
        c3 = ConvL(256, 5, 2, name="conv3")(c2)
        c3 = ConvL(256, 3, 1, name="conv3_1")(c3)
        c4 = ConvL(512, 3, 1, name="conv4_1")(ConvL(512, 3, 2, name="conv4")(c3))
        c5 = ConvL(512, 3, 1, name="conv5_1")(ConvL(512, 3, 2, name="conv5")(c4))
        c6 = ConvL(1024, 3, 1, name="conv6_1")(ConvL(1024, 3, 2, name="conv6")(c5))

        flow6 = _predict(c6, "predict_flow6")
        f6u = DeconvTorch(2, act=False, use_bias=False, name="up_flow6")(flow6)
        d5 = DeconvTorch(512, name="deconv5")(c6)
        cat5 = jnp.concatenate([c5, d5, f6u], -1)
        flow5 = _predict(cat5, "predict_flow5")
        f5u = DeconvTorch(2, act=False, use_bias=False, name="up_flow5")(flow5)
        d4 = DeconvTorch(256, name="deconv4")(cat5)
        cat4 = jnp.concatenate([c4, d4, f5u], -1)
        flow4 = _predict(cat4, "predict_flow4")
        f4u = DeconvTorch(2, act=False, use_bias=False, name="up_flow4")(flow4)
        d3 = DeconvTorch(128, name="deconv3")(cat4)
        cat3 = jnp.concatenate([c3, d3, f4u], -1)
        flow3 = _predict(cat3, "predict_flow3")
        f3u = DeconvTorch(2, act=False, use_bias=False, name="up_flow3")(flow3)
        d2 = DeconvTorch(64, name="deconv2")(cat3)
        cat2 = jnp.concatenate([c2, d2, f3u], -1)
        return _predict(cat2, "predict_flow2")


class FlowNetC(nn.Module):
    """networks/flownet_c.py — siamese encoder + correlation cost volume."""

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x1, x2 = x[..., :3], x[..., 3:]
        conv1 = ConvL(64, 7, 2, name="conv1")
        conv2 = ConvL(128, 5, 2, name="conv2")
        conv3 = ConvL(256, 5, 2, name="conv3")
        c3a = conv3(conv2(conv1(x1)))
        c3b = conv3(conv2(conv1(x2)))
        corr = _leaky(correlation(c3a, c3b, max_displacement=20, stride=2))
        redir = ConvL(32, 1, 1, name="conv_redir")(c3a)
        c3_1 = ConvL(256, 3, 1, name="conv3_1")(
            jnp.concatenate([redir, corr], -1))
        c4 = ConvL(512, 3, 1, name="conv4_1")(ConvL(512, 3, 2, name="conv4")(c3_1))
        c5 = ConvL(512, 3, 1, name="conv5_1")(ConvL(512, 3, 2, name="conv5")(c4))
        c6 = ConvL(1024, 3, 1, name="conv6_1")(ConvL(1024, 3, 2, name="conv6")(c5))

        flow6 = _predict(c6, "predict_flow6")
        f6u = DeconvTorch(2, act=False, name="up_flow6")(flow6)
        d5 = DeconvTorch(512, name="deconv5")(c6)
        cat5 = jnp.concatenate([c5, d5, f6u], -1)
        flow5 = _predict(cat5, "predict_flow5")
        f5u = DeconvTorch(2, act=False, name="up_flow5")(flow5)
        d4 = DeconvTorch(256, name="deconv4")(cat5)
        cat4 = jnp.concatenate([c4, d4, f5u], -1)
        flow4 = _predict(cat4, "predict_flow4")
        f4u = DeconvTorch(2, act=False, name="up_flow4")(flow4)
        d3 = DeconvTorch(128, name="deconv3")(cat4)
        cat3 = jnp.concatenate([c3_1, d3, f4u], -1)
        flow3 = _predict(cat3, "predict_flow3")
        f3u = DeconvTorch(2, act=False, name="up_flow3")(flow3)
        d2 = DeconvTorch(64, name="deconv2")(cat3)
        # NOTE: the reference concatenates conv2 of the FIRST image here
        # (flownet_c.py:152), not of the merged stream.
        c2a = conv2(conv1(x1))
        cat2 = jnp.concatenate([c2a, d2, f3u], -1)
        return _predict(cat2, "predict_flow2")


class FlowNetSD(nn.Module):
    """networks/flownet_sd.py — small-displacement net with inter convs."""

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        c0 = ConvL(64, 3, 1, name="conv0")(x)
        c1 = ConvL(128, 3, 1, name="conv1_1")(ConvL(64, 3, 2, name="conv1")(c0))
        c2 = ConvL(128, 3, 1, name="conv2_1")(ConvL(128, 3, 2, name="conv2")(c1))
        c3 = ConvL(256, 3, 1, name="conv3_1")(ConvL(256, 3, 2, name="conv3")(c2))
        c4 = ConvL(512, 3, 1, name="conv4_1")(ConvL(512, 3, 2, name="conv4")(c3))
        c5 = ConvL(512, 3, 1, name="conv5_1")(ConvL(512, 3, 2, name="conv5")(c4))
        c6 = ConvL(1024, 3, 1, name="conv6_1")(ConvL(1024, 3, 2, name="conv6")(c5))

        flow6 = _predict(c6, "predict_flow6")
        f6u = DeconvTorch(2, act=False, name="up_flow6")(flow6)
        d5 = DeconvTorch(512, name="deconv5")(c6)
        cat5 = jnp.concatenate([c5, d5, f6u], -1)
        i5 = ConvL(512, 3, 1, act=False, name="inter_conv5")(cat5)
        flow5 = _predict(i5, "predict_flow5")
        f5u = DeconvTorch(2, act=False, name="up_flow5")(flow5)
        d4 = DeconvTorch(256, name="deconv4")(cat5)
        cat4 = jnp.concatenate([c4, d4, f5u], -1)
        i4 = ConvL(256, 3, 1, act=False, name="inter_conv4")(cat4)
        flow4 = _predict(i4, "predict_flow4")
        f4u = DeconvTorch(2, act=False, name="up_flow4")(flow4)
        d3 = DeconvTorch(128, name="deconv3")(cat4)
        cat3 = jnp.concatenate([c3, d3, f4u], -1)
        i3 = ConvL(128, 3, 1, act=False, name="inter_conv3")(cat3)
        flow3 = _predict(i3, "predict_flow3")
        f3u = DeconvTorch(2, act=False, name="up_flow3")(flow3)
        d2 = DeconvTorch(64, name="deconv2")(cat3)
        cat2 = jnp.concatenate([c2, d2, f3u], -1)
        i2 = ConvL(64, 3, 1, act=False, name="inter_conv2")(cat2)
        return _predict(i2, "predict_flow2")


class FlowNetFusion(nn.Module):
    """networks/flownet_fusion.py — full-resolution fusion of SD + S2 flows."""

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        c0 = ConvL(64, 3, 1, name="conv0")(x)
        c1 = ConvL(128, 3, 1, name="conv1_1")(ConvL(64, 3, 2, name="conv1")(c0))
        c2 = ConvL(128, 3, 1, name="conv2_1")(ConvL(128, 3, 2, name="conv2")(c1))
        flow2 = _predict(c2, "predict_flow2")
        f2u = DeconvTorch(2, act=False, name="up_flow2")(flow2)
        d1 = DeconvTorch(32, name="deconv1")(c2)
        cat1 = jnp.concatenate([c1, d1, f2u], -1)
        i1 = ConvL(32, 3, 1, act=False, name="inter_conv1")(cat1)
        flow1 = _predict(i1, "predict_flow1")
        f1u = DeconvTorch(2, act=False, name="up_flow1")(flow1)
        d0 = DeconvTorch(16, name="deconv0")(cat1)
        cat0 = jnp.concatenate([c0, d0, f1u], -1)
        i0 = ConvL(16, 3, 1, act=False, name="inter_conv0")(cat0)
        return _predict(i0, "predict_flow0")


class FlowNet2(nn.Module):
    """The full stacked network (models.py:20-172). Input: two RGB frames
    [B, H, W, 3] each (H, W divisible by 64); output flow [B, H, W, 2]."""
    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
        # per-image, per-channel mean normalization (models.py:119-123)
        stacked = jnp.stack([im1, im2], axis=1)
        mean = stacked.mean(axis=(1, 2, 3), keepdims=True)
        x1 = (im1 - mean[:, 0]) / self.rgb_max
        x2 = (im2 - mean[:, 0]) / self.rgb_max
        x = jnp.concatenate([x1, x2], axis=-1)
        h, w = x1.shape[1:3]

        def up4_bilinear(f):
            return resize_bilinear(f, (f.shape[1] * 4, f.shape[2] * 4),
                                   align_corners=False)

        def up4_nearest(f):
            return resize_nearest(f, (f.shape[1] * 4, f.shape[2] * 4))

        # FlowNetC
        flowc = FlowNetC(name="flownetc")(x)
        flowc_up = up4_bilinear(flowc * self.div_flow)
        warped1 = resample_pixel(x2, flowc_up)
        diff = channel_norm(x1 - warped1)
        concat1 = jnp.concatenate([x, warped1, flowc_up / self.div_flow, diff],
                                  -1)
        # FlowNetS1
        flows1 = FlowNetS(name="flownets_1")(concat1)
        flows1_up = up4_bilinear(flows1 * self.div_flow)
        warped1 = resample_pixel(x2, flows1_up)
        diff = channel_norm(x1 - warped1)
        concat2 = jnp.concatenate([x, warped1, flows1_up / self.div_flow, diff],
                                  -1)
        # FlowNetS2
        flows2 = FlowNetS(name="flownets_2")(concat2)
        flows2_up = up4_nearest(flows2 * self.div_flow)
        norm_s2 = channel_norm(flows2_up)
        diff_s2 = channel_norm(x1 - resample_pixel(x2, flows2_up))
        # FlowNetSD
        flowsd = FlowNetSD(name="flownets_d")(x)
        flowsd_up = up4_nearest(flowsd / self.div_flow)
        norm_sd = channel_norm(flowsd_up)
        diff_sd = channel_norm(x1 - resample_pixel(x2, flowsd_up))
        # Fusion
        concat3 = jnp.concatenate([x1, flowsd_up, flows2_up, norm_sd, norm_s2,
                                   diff_sd, diff_s2], -1)
        return FlowNetFusion(name="flownetfusion")(concat3)


def compute_flow_and_conf(apply_fn, variables, im1: jnp.ndarray,
                          im2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FlowNet wrapper semantics (flow_net.py:54-95): pad to /64 via resize,
    run, confidence = forward-splat occlusion of the flow, resize back with
    height-ratio magnitude rescale."""
    old_h, old_w = im1.shape[1:3]
    new_h, new_w = old_h // 64 * 64, old_w // 64 * 64
    new_h, new_w = max(new_h, 64), max(new_w, 64)
    if (old_h, old_w) != (new_h, new_w):
        im1 = resize_bilinear(im1, (new_h, new_w), align_corners=False)
        im2 = resize_bilinear(im2, (new_h, new_w), align_corners=False)
    flow = apply_fn(variables, im1, im2)
    conf = occlusion_map(flow)
    if (old_h, old_w) != (new_h, new_w):
        flow = resize_bilinear(flow, (old_h, old_w),
                               align_corners=False) * (old_h / new_h)
        conf = resize_bilinear(conf, (old_h, old_w), align_corners=False)
    return flow, conf
