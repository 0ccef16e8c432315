"""upfirdn2d + fused bias/activation — StyleGAN2 ops parity.

Reference: src/modules/third_party/{upfirdn2d, bias_act} CUDA extensions
(SURVEY.md §2.7 — vendored, unused by the main C2M path; provided here as
lax-based utilities for API completeness). upfirdn2d = upsample by zero
insertion, FIR filter, downsample; bias_act = bias + activation * gain with
optional clamp.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad: Sequence[int] = (0, 0)) -> jnp.ndarray:
    """x: [B, H, W, C]; kernel: [kh, kw] separable-or-not FIR filter.

    Semantics of the reference's upfirdn2d (upfirdn2d.py:52-193): insert
    ``up-1`` zeros between samples, pad, correlate with the (non-flipped)
    filter, then keep every ``down``-th sample.
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    if up > 1:
        z = jnp.zeros((b, h, up, w, up, c), x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(b, h * up, w * up, c)
    x = jnp.pad(x, ((0, 0), (max(pad0, 0), max(pad1, 0)),
                    (max(pad0, 0), max(pad1, 0)), (0, 0)))
    if pad0 < 0 or pad1 < 0:
        x = x[:, max(-pad0, 0):x.shape[1] - max(-pad1, 0),
              max(-pad0, 0):x.shape[2] - max(-pad1, 0)]
    y = _depthwise_filter(x, kernel)
    if down > 1:
        y = y[:, ::down, ::down]
    return y


def _depthwise_filter(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    k = kernel[::-1, ::-1].astype(x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


_ACTS = {
    "linear": (lambda x: x, 1.0),
    "relu": (jax.nn.relu, 2.0 ** 0.5),
    "lrelu": (lambda x: jax.nn.leaky_relu(x, 0.2), 2.0 ** 0.5),
    "tanh": (jnp.tanh, 1.0),
    "sigmoid": (jax.nn.sigmoid, 1.0),
}


def bias_act(x: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
             act: str = "linear", gain: Optional[float] = None,
             clamp: Optional[float] = None) -> jnp.ndarray:
    """Fused bias + activation + gain + clamp (bias_act.py:12-99)."""
    fn, def_gain = _ACTS[act]
    if bias is not None:
        x = x + bias
    x = fn(x) * (gain if gain is not None else def_gain)
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
