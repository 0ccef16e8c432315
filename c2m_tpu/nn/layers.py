"""Conv/norm building blocks (reference: src/modules/layers/*.py), TPU-first.

Layout is channels-last throughout (NHWC / NTHWC) so channels ride the TPU
lane dimension and XLA tiles convs onto the MXU. Semantics mirror the torch
blocks exactly:

- ``DownBlock2d``  conv(pad reflect) + BatchNorm + LeakyReLU(0.2)   (down_block.py:5-23)
- ``DownBlock3d``  ReflectionPad3d + conv3d + BatchNorm + leaky     (down_block.py:26-48)
- ``UpBlock2d``    2x bilinear upsample + conv + BatchNorm + leaky  (up_block.py:5-27);
  the torch version hard-codes a chunk(5) time unfold — time folding here is
  explicit via ``fold_time``/``unfold_time`` helpers instead.
- ``SameBlock2d``  conv + InstanceNorm(affine) + leaky              (same_block.py:5-23)
- ``SameBlockTwoConv2d`` conv + IN + conv(leaky(.))                 (same_block.py:26-47)
- ``SameBlock3d``  pad + conv3d + BatchNorm3d + leaky               (same_block.py:50-66)
- ``ResidualBlock`` BN-relu-conv x2 + skip                          (residual_block.py:6-31)
- ``SpectralNormConv`` torch-style one-power-iteration spectral norm (discriminator.py:77-79)

Weight init matches torch defaults (kaiming-uniform a=sqrt(5), bias uniform
1/sqrt(fan_in)) — the reference's fancier ``init_weights`` is imported but
never applied to the main model (model.py:9); only the discriminator uses
normal(0, 0.02) (discriminator.py:10-22).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from c2m_tpu.ops.warp import resize_bilinear

Dtype = Any


def torch_kernel_init(dtype=jnp.float32):
    """torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    return jax.nn.initializers.variance_scaling(
        scale=1.0 / 3.0, mode="fan_in", distribution="uniform", dtype=dtype)


def torch_bias_init(fan_in: int, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _tuple(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


def _pad_spatial(x: jnp.ndarray, pads: Sequence[Tuple[int, int]], mode: str) -> jnp.ndarray:
    """Pad the spatial dims (all but first/last) of a channels-last tensor.

    Reflect padding degrades to edge padding per-axis when the axis is too
    short to reflect (torch ReflectionPad errors there; we support tiny
    bottleneck maps, e.g. the 64-px-high mini config)."""
    if all(p == (0, 0) for p in pads):
        return x
    if mode == "zeros":
        mode = "constant"
    elif mode == "replicate":
        mode = "edge"
    if mode == "reflect":
        # jnp reflect requires pad < axis_size on each padded axis.
        for axis, (lo, hi) in enumerate(pads, start=1):
            if max(lo, hi) > 0 and x.shape[axis] <= max(lo, hi):
                cfg = [(0, 0)] * x.ndim
                cfg[axis] = (lo, hi)
                x = jnp.pad(x, cfg, mode="edge")
                pads = list(pads)
                pads[axis - 1] = (0, 0)
    cfg = [(0, 0)] + list(pads) + [(0, 0)]
    if all(p == (0, 0) for p in cfg):
        return x
    return jnp.pad(x, cfg, mode=mode)


class Conv(nn.Module):
    """2D conv, NHWC, with torch-style init and reflect/replicate/zeros padding."""
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    padding_mode: str = "zeros"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _tuple(self.kernel_size, 2)
        p = _tuple(self.padding, 2)
        x = _pad_spatial(x, [(p[0], p[0]), (p[1], p[1])],
                         self.padding_mode if self.padding_mode != "zeros" else "constant")
        fan_in = x.shape[-1] * int(np.prod(k))
        return nn.Conv(self.features, k, strides=_tuple(self.strides, 2),
                       padding="VALID", use_bias=self.use_bias,
                       kernel_init=torch_kernel_init(),
                       bias_init=torch_bias_init(fan_in),
                       dtype=self.dtype)(x)


class Conv3d(nn.Module):
    """3D conv, NTHWC, explicit pre-padding (torch ReflectionPad3d + valid conv).

    Lowered as a time-unrolled 2D conv: the kt temporal taps are folded into
    the input channel dim ([B, T_out, H, W, kt*C] gathered from static time
    slices) and one (kh, kw) conv runs on the time-folded batch. Numerically
    identical to a direct conv3d, but it hits XLA's well-tiled 2D-conv MXU
    path — direct conv3d lowering on TPU ran ~20x slower for the thin-channel
    video stacks this model uses.
    """
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0  # (t, h, w)
    padding_mode: str = "reflect"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = _tuple(self.kernel_size, 3)
        st, sh, sw = _tuple(self.strides, 3)
        pt, ph, pw = _tuple(self.padding, 3)
        # Pad ONLY the time axis first, keep H/W lane-aligned through the
        # tap slicing/concat, and reflect-pad H/W once on the folded result
        # just before the conv. Multi-axis reflect padding is separable, so
        # this is numerically identical to padding all three axes up front —
        # but the early (T,H,W) pad dragged lane-misaligned layouts through
        # every tap copy and tripled the 3D-conv stages' time (measured:
        # 13.5 -> ~5 ms for the full-res fuse block).
        x = _pad_spatial(x, [(pt, pt), (0, 0), (0, 0)],
                         self.padding_mode if self.padding_mode != "zeros"
                         else "constant")
        b, t_in, h, w, c = x.shape
        t_out = (t_in - kt) // st + 1
        # Fold the kt temporal taps into channels as [tap0|tap1|...] via
        # strided time slices + one minor-dim concat — same (kt-major)
        # channel layout as the fan_in reshape below, with NO transpose.
        parts = [x[:, j:j + (t_out - 1) * st + 1:st] for j in range(kt)]
        taps = (parts[0] if kt == 1
                else jnp.concatenate(parts, axis=-1))      # [B,T_out,H,W,kt*C]
        taps = taps.reshape(b * t_out, h, w, kt * c)
        taps = _pad_spatial(taps, [(ph, ph), (pw, pw)],
                            self.padding_mode if self.padding_mode != "zeros"
                            else "constant")
        fan_in = c * kt * kh * kw
        y = nn.Conv(self.features, (kh, kw), strides=(sh, sw),
                    padding="VALID", use_bias=self.use_bias,
                    kernel_init=torch_kernel_init(),
                    bias_init=torch_bias_init(fan_in),
                    dtype=self.dtype)(taps)
        return y.reshape(b, t_out, *y.shape[1:])


class Dense(nn.Module):
    """Linear with torch default init."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        ki = self.kernel_init or torch_kernel_init()
        bi = self.bias_init or torch_bias_init(x.shape[-1])
        return nn.Dense(self.features, use_bias=self.use_bias, kernel_init=ki,
                        bias_init=bi, dtype=self.dtype)(x)


class BatchNorm(nn.Module):
    """torch BatchNorm semantics: batch stats in training, running stats in eval.

    Normalizes over all axes but the channel (last). momentum 0.1 (torch) ->
    flax momentum 0.9; eps 1e-5; affine.
    """
    use_running_average: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: Optional[bool] = None):
        use_ra = self.use_running_average if train is None else not train
        return nn.BatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
                            dtype=self.dtype)(x)


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine, track_running_stats=False): per-sample,
    per-channel stats over the spatial dims."""
    affine: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: [B, *spatial, C]; normalize over spatial dims per (batch, channel).
        red_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=red_axes, keepdims=True)
        var = jnp.var(x, axis=red_axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class DownBlock2d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    padding_mode: str = "zeros"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                 self.padding_mode, dtype=self.dtype)(x)
        if self.use_norm:
            x = BatchNorm(dtype=self.dtype)(x, train=train)
        return leaky(x)


class DownBlock3d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    padding_mode: str = "reflect"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3d(self.features, self.kernel_size, self.strides, self.padding,
                   self.padding_mode, dtype=self.dtype)(x)
        if self.use_norm:
            x = BatchNorm(dtype=self.dtype)(x, train=train)
        return leaky(x)


def _upfuse_gate(h_up: int, w_up: int) -> bool:
    # late import: s2d_blocks imports this module
    from c2m_tpu.nn.s2d_blocks import upfuse_auto
    return upfuse_auto(h_up, w_up)


class UpBlock2d(nn.Module):
    """2x bilinear upsample + conv + BN + leaky (up_block.py:5-27), pure 2D —
    time folding is the caller's job (``fold_time``/``unfold_time``)."""
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    padding_mode: str = "zeros"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        # At big output sizes the upsample folds into the conv kernel
        # (nn/s2d.fused_up_conv: the [2h, 2w, C] upsampled tensor never
        # exists, conv emits lane-filled s2d, BN stats over the phase view
        # are exact) — measured 1.3-2.6x at >=256x512 outputs, neutral
        # below (tools/bench_upfuse.py). Param tree identical to the plain
        # path; exactness pinned in tests/test_s2d_blocks.py.
        if (self.kernel_size == 3 and self.strides == 1 and self.padding == 1
                and _upfuse_gate(h * 2, w * 2)):
            from c2m_tpu.nn import s2d as _s2d
            from c2m_tpu.nn.s2d_blocks import UpConvS2d
            xs = UpConvS2d(self.features, 3, self.padding_mode,
                           dtype=self.dtype, name="Conv_0")(x)
            xs5 = xs.reshape(*xs.shape[:-1], 4, xs.shape[-1] // 4)
            xs5 = BatchNorm(dtype=self.dtype)(xs5, train=train)
            return _s2d.from_s2d(leaky(
                xs5.reshape(*xs.shape[:-1], xs.shape[-1])))
        x = resize_bilinear(x, (h * 2, w * 2), align_corners=False)
        x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                 self.padding_mode, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train=train)
        return leaky(x)


class SameBlock2d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    padding_mode: str = "zeros"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                 self.padding_mode, dtype=self.dtype)(x)
        if self.use_norm:
            x = InstanceNorm()(x)
        return leaky(x)


class SameBlockTwoConv2d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    padding_mode: str = "zeros"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                 self.padding_mode, dtype=self.dtype)(x)
        if self.use_norm:
            x = InstanceNorm()(x)
        return Conv(self.features, self.kernel_size, self.strides, self.padding,
                    self.padding_mode, dtype=self.dtype)(leaky(x))


class SameBlock3d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    padding_mode: str = "reflect"
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3d(self.features, self.kernel_size, self.strides, self.padding,
                   self.padding_mode, dtype=self.dtype)(x)
        if self.use_norm:
            x = BatchNorm(dtype=self.dtype)(x, train=train)
        return leaky(x)


class ResidualBlock(nn.Module):
    """BN -> relu -> reflect-pad conv -> BN -> relu -> conv -> +x
    (residual_block.py:6-31; note norm2 normalizes the conv1 *input* channels
    in the reference since in_planes == out_planes in all uses)."""
    features: int
    kernel_size: int = 3
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = BatchNorm(dtype=self.dtype)(x, train=train)
        out = nn.relu(out)
        out = Conv(self.features, self.kernel_size, 1, self.padding, "reflect",
                   dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype)(out, train=train)
        out = nn.relu(out)
        out = Conv(self.features, self.kernel_size, 1, self.padding, "reflect",
                   dtype=self.dtype)(out)
        return out + x


class SpectralNormConv(nn.Module):
    """Conv with torch-style spectral normalization (one power iteration per
    training forward, persistent ``u``; discriminator.py:77-79)."""
    features: int
    kernel_size: Union[int, Sequence[int]] = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = _tuple(self.kernel_size, 2)
        in_ch = x.shape[-1]
        fan_in = in_ch * int(np.prod(k))
        kernel = self.param("kernel", torch_kernel_init(), (*k, in_ch, self.features))
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        # torch reshapes [out, in*kh*kw]; rows index the output channel.
        w_mat = kernel.reshape(-1, self.features).T            # [out, in*k*k]
        u_var = self.variable("spectral", "u",
                              lambda: jax.random.normal(
                                  self.make_rng("params") if self.has_rng("params")
                                  else jax.random.PRNGKey(0), (self.features,)))
        u = u_var.value

        def normalize(v):
            return v / (jnp.linalg.norm(v) + 1e-12)

        if train:
            v = normalize(w_mat.T @ u)
            u = normalize(w_mat @ v)
            if not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(u)
        else:
            v = normalize(w_mat.T @ u)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)
        w_sn = (kernel / sigma).astype(self.dtype or kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(w_sn.dtype), w_sn, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


def fold_time(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """[B, T, H, W, C] -> ([B*T, H, W, C], T).

    Equivalent to the reference's ``torch.cat(torch.unbind(x, dim=2), dim=0)``
    except batch-major: reference stacks as [t0 batch, t1 batch, ...] while we
    interleave as [(b0,t0), (b0,t1), ...]; all uses are elementwise-per-frame
    so only the fold/unfold pair must be consistent (it is).
    """
    b, t = x.shape[0], x.shape[1]
    return x.reshape(b * t, *x.shape[2:]), t


def unfold_time(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """Inverse of ``fold_time``: [B*T, ...] -> [B, T, ...]."""
    return x.reshape(x.shape[0] // t, t, *x.shape[1:])
