"""Space-to-depth execution of the full-res model tail (layer blocks).

nn/s2d.py proves the conv reformulation exact; tools/bench_s2d.py measures
it on the v5e: the fused single-conv form LOSES at 128x256 (0.64x chained)
but WINS 2.4x at 512x1024 (52.2 -> 22.0 ms for a 3-conv chain) — XLA's
thin-channel conv mitigation runs out at long-horizon sizes where the
[B*T, 512, 1024, 32] tensors pay the full 4x lane-padding tax in both
bytes and HBM capacity. These blocks wire that win into the model tail,
gated to big resolutions (``s2d_auto``).

PARAM-TREE COMPATIBILITY (load-bearing): every block here creates its
parameters under the exact child names/shapes the plain blocks use
(``.../Conv_0/kernel``, ``.../BatchNorm_0/...``), with the same torch-style
initializers — so a checkpoint trained with either path loads in the other,
the optimizer group labeling (train/state.py) is unchanged, and the
exactness tests apply one variable tree to both paths. Flax param init RNG
is path-keyed, so even init VALUES are identical.

Norms need no shim: BatchNorm/InstanceNorm applied to the phase-split 5D
view ``[..., 4, C]`` reduce the phase axis with the spatial axes and keep
(C,)-shaped parameters — exactly the original statistics (nn/s2d.py
norm_nd_s2d; tests/test_s2d.py::test_norm_reshape_exact_stats).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from c2m_tpu.nn import s2d
from c2m_tpu.nn.layers import (BatchNorm, InstanceNorm, leaky,
                               torch_bias_init, torch_kernel_init)

Dtype = jnp.dtype

# measured crossover (tools/bench_s2d.py): chained s2d wins at 512x1024,
# loses at 128x256; enable at >= 512x512 pixels
S2D_MIN_PIXELS = 512 * 512


def s2d_auto(h: int, w: int) -> bool:
    """Should the full-res tail run space-to-depth at this size?"""
    return h % 2 == 0 and w % 2 == 0 and h * w >= S2D_MIN_PIXELS


# fused upsample+conv (nn/s2d.fused_up_conv) crossover, measured in
# tools/bench_upfuse.py: 3.3x at 512x1024 outputs, 1.56x at 256x512,
# ~0.95x at 128x256 and below. Env override is the A/B measurement hook
# (tools/bench_train.py --no-upfuse sets it huge to disable).
UPFUSE_MIN_PIXELS = int(os.environ.get("C2M_UPFUSE_MIN_PIXELS",
                                       str(256 * 512)))


def upfuse_auto(h_up: int, w_up: int) -> bool:
    """Should an UpBlock whose fuse resizes straight back run the fused
    upsample+conv s2d stage at this (2x-upsampled) output size?"""
    return h_up % 2 == 0 and w_up % 2 == 0 and h_up * w_up >= UPFUSE_MIN_PIXELS


def concat_s2d(streams: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Channel-concat s2d tensors so the result is phase-major over the
    COMBINED channels: layout [phase, C0+C1+...] — what a plain-form
    ``concat`` followed by ``to_s2d`` would produce."""
    parts = [x.reshape(*x.shape[:-1], 4, x.shape[-1] // 4) for x in streams]
    return jnp.concatenate(parts, axis=-1).reshape(
        *streams[0].shape[:-1], -1)


def conv3d_s2d_single(v: jnp.ndarray, w: jnp.ndarray,
                      bias: Optional[jnp.ndarray], kt: int, k: int,
                      pad_t: int, padding_mode: str = "reflect",
                      dtype=None) -> jnp.ndarray:
    """Exact Conv3d (kt x k x k, stride 1, spatial pad k//2) on the s2d
    video form — the s2d counterpart of layers.Conv3d's time-tap lowering.

    v: [B, T, h2, w2, 4C] (phase-major); w: [k, k, kt*C, Co], the PLAIN
    Conv3d kernel whose input channels are kt-major ([tap, c] — the layout
    layers.Conv3d:143-148 produces). Time is reflect-padded by ``pad_t``
    (pass 0 when the caller halo-pads, as the scan tail does). Returns
    [B, T_out, h2, w2, 4Co].
    """
    b, t, h2, w2, c4 = v.shape
    c = c4 // 4
    assert w.shape[2] == kt * c, (w.shape, kt, c)
    co = w.shape[3]
    assert k % 2 == 1
    p = k // 2
    if pad_t:
        assert padding_mode == "reflect"
        vparts = [v[:, pad_t:0:-1], v, v[:, -2:-2 - pad_t:-1]]
        v = jnp.concatenate(vparts, axis=1)
        t = v.shape[1]
    t_out = t - kt + 1
    # spatial s2d pad BEFORE tap folding: _pad_s2d's phase-corrected reflect
    # rows assume phase-major channels, which the [tap, phase, c] tap-folded
    # layout breaks — and spatial padding commutes with time slicing
    u0 = min(s2d._taps(q, k, p)[0] for q in (0, 1))
    u1 = max(s2d._taps(q, k, p)[0] + s2d._taps(q, k, p)[1] - 1 for q in (0, 1))
    sk = u1 - u0 + 1
    vp = s2d._pad_s2d(v.reshape(b * t, h2, w2, c4), -u0, u1, -u0, u1,
                      padding_mode)
    v = vp.reshape(b, t, *vp.shape[1:])
    # tap-major fold: [B, T_out, h2p, w2p, kt*4C] with layout [tap, phase, c]
    taps = jnp.concatenate([v[:, j:j + t_out] for j in range(kt)], axis=-1) \
        if kt > 1 else v[:, :t_out]
    flat = taps.reshape(b * t_out, *taps.shape[2:])
    if dtype is not None:
        flat = flat.astype(dtype)
        w = w.astype(dtype)
    # scatter the plain kernel into s2d space: in-channels [tap, qy, qx, c],
    # out-channels [py, px, co] (phase-major, matching the s2d layout)
    w5 = w.reshape(k, k, kt, c, co)
    kk = jnp.zeros((sk, sk, kt, 2, 2, c, 2, 2, co), w.dtype)
    for py in range(2):
        for px in range(2):
            for ky in range(k):
                ry = py + ky - p
                for kx in range(k):
                    rx = px + kx - p
                    kk = kk.at[ry // 2 - u0, rx // 2 - u0, :,
                               ry & 1, rx & 1, :, py, px].set(
                        w5[ky, kx].transpose(0, 1, 2))
    kk = kk.reshape(sk, sk, kt * c4, 4 * co)
    y = jax.lax.conv_general_dilated(
        flat, kk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y.reshape(b, t_out, h2, w2, 4 * co)


class _ConvParams(nn.Module):
    """Owns kernel/bias under the SAME names/shapes/initializers nn.Conv
    would create, so the s2d path shares trees with the plain path. Named
    "Conv_0" by the caller to mirror the anonymous nn.Conv child."""
    features: int
    kernel_size: Sequence[int]
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", torch_kernel_init(),
                            (kh, kw, self.in_features, self.features))
        bias = None
        if self.use_bias:
            fan_in = self.in_features * kh * kw
            bias = self.param("bias", torch_bias_init(fan_in),
                              (self.features,))
        return kernel, bias


class ConvS2d(nn.Module):
    """layers.Conv on the s2d form (stride 1, odd k, pad k//2): consumes and
    emits phase-major s2d tensors via nn/s2d.conv_s2d_single."""
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    padding_mode: str = "zeros"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size if isinstance(self.kernel_size, int) \
            else self.kernel_size[0]
        cin = x.shape[-1] // 4
        kernel, bias = _ConvParams(self.features, (k, k), cin,
                                   self.use_bias, name="Conv_0")()
        return s2d.conv_s2d_single(x, kernel, bias, k // 2,
                                   self.padding_mode, dtype=self.dtype)


class UpConvS2d(nn.Module):
    """Fused 2x-bilinear-upsample + 3x3 conv: consumes the PLAIN half-res
    tensor, emits the s2d form of the conv'd full-res tensor
    (nn/s2d.fused_up_conv — the upsample folds into a composite kernel, so
    the upsampled tensor never exists and the conv keeps the original FLOP
    count). Param tree identical to ConvS2d / the plain layers.Conv."""
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    padding_mode: str = "zeros"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size if isinstance(self.kernel_size, int) \
            else self.kernel_size[0]
        kernel, bias = _ConvParams(self.features, (k, k), x.shape[-1],
                                   self.use_bias, name="Conv_0")()
        return s2d.fused_up_conv(x, kernel, bias, self.padding_mode,
                                 dtype=self.dtype)


class Conv3dS2d(nn.Module):
    """layers.Conv3d on the s2d video form (stride 1, spatial pad k//2).

    pad_t: temporal reflect padding (0 = caller already halo-padded).
    Param tree mirrors Conv3d's folded 2D kernel ("Conv_0/kernel",
    [kh, kw, kt*C, Co])."""
    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    pad_t: int = 1
    padding_mode: str = "reflect"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, v):
        kt, kh, kw = self.kernel_size
        c = v.shape[-1] // 4
        kernel, bias = _ConvParams(self.features, (kh, kw), kt * c,
                                   self.use_bias, name="Conv_0")()
        return conv3d_s2d_single(v, kernel, bias, kt, kh, self.pad_t,
                                 self.padding_mode, dtype=self.dtype)


def _norm5(x):
    return s2d.norm_nd_s2d(x)


def _denorm5(x5):
    return s2d.denorm_nd_s2d(x5)


class UpBlock2dS2d(nn.Module):
    """layers.UpBlock2d emitting the s2d form: the 2x bilinear upsample is
    FUSED into the conv kernel (nn/s2d.fused_up_conv — neither the upsampled
    nor the padded full-res tensor is ever materialized, and the conv keeps
    the plain path's FLOP count), then BN + leaky in s2d."""
    features: int
    kernel_size: int = 3
    padding_mode: str = "zeros"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: plain [B*, h, w, C] -> s2d of the conv'd 2x-upsampled tensor;
        # the upsample folds into the conv kernel (s2d.fused_up_conv)
        xs = UpConvS2d(self.features, self.kernel_size, self.padding_mode,
                       dtype=self.dtype, name="Conv_0")(x)
        xs = _denorm5(BatchNorm(dtype=self.dtype)(_norm5(xs), train=train))
        return leaky(xs)


class SameBlock2dS2d(nn.Module):
    """layers.SameBlock2d on the s2d form (conv + InstanceNorm + leaky)."""
    features: int
    kernel_size: int = 3
    padding_mode: str = "zeros"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = ConvS2d(self.features, self.kernel_size, self.padding_mode,
                    dtype=self.dtype, name="Conv_0")(x)
        if self.use_norm:
            x = _denorm5(InstanceNorm()(_norm5(x)))
        return leaky(x)


class SameBlock3dS2d(nn.Module):
    """layers.SameBlock3d on the s2d video form."""
    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    pad_t: int = 1
    padding_mode: str = "reflect"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, v, train: bool = True):
        v = Conv3dS2d(self.features, self.kernel_size, self.pad_t,
                      self.padding_mode, dtype=self.dtype,
                      name="Conv3d_0")(v)
        if self.use_norm:
            v = _denorm5(BatchNorm(dtype=self.dtype)(_norm5(v), train=train))
        return leaky(v)


class DownBlock2dS2dIn(nn.Module):
    """layers.DownBlock2d (4x4 stride-2 pad-1 conv + BN + leaky) CONSUMING
    the s2d form and emitting the normal half-res layout — the exit point of
    an s2d full-res segment (nn/s2d.downconv_s2d)."""
    features: int
    padding_mode: str = "zeros"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        cin = x.shape[-1] // 4
        conv_scope = self
        # mirror DownBlock2d's anonymous Conv child ("Conv_0") which itself
        # holds the anonymous nn.Conv ("Conv_0")

        class _Wrap(nn.Module):
            @nn.compact
            def __call__(wself, xs):
                kernel, bias = _ConvParams(self.features, (4, 4), cin,
                                           True, name="Conv_0")()
                return s2d.downconv_s2d(xs, kernel, bias, self.padding_mode,
                                        dtype=self.dtype)

        y = _Wrap(name="Conv_0")(x)
        if self.use_norm:
            y = BatchNorm(dtype=self.dtype)(y, train=train)
        return leaky(y)


def split_s2d(x: jnp.ndarray, sizes: Sequence[int]):
    """Phase-aware channel split (inverse of concat_s2d)."""
    c4 = x.shape[-1]
    total = sum(sizes)
    assert c4 == 4 * total, (c4, sizes)
    x5 = x.reshape(*x.shape[:-1], 4, total)
    outs = []
    off = 0
    for sz in sizes:
        outs.append(x5[..., off:off + sz].reshape(*x.shape[:-1], 4 * sz))
        off += sz
    return outs
