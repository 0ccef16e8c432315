"""Frames-to-depth (f2d) execution of thin-channel 2D conv stages.

The time-folded hot tensors [B*T, H, W, C<=32] pay a 4x lane-padding tax
(tools/roofline.py) and under-fill the MXU contraction. Space-to-depth
(nn/s2d.py) fixes both but needs phase-corrected boundary machinery and
measured SLOWER than plain at the 128x256 operating point
(tools/bench_s2d.py). f2d instead groups G folded frames into channels:

    to_f2d: [B*T, H, W, C] -> [B*T/G, H, W, G*C]   (group-major channels)

and runs ONE conv with a block-diagonal kernel [k, k, G*C, G*Co]. Because
frames are independent under any per-frame 2D op this is an EXACT
reformulation with none of s2d's phase machinery: spatial padding stays a
plain pad, upsample/resize apply unchanged on the f2d form, InstanceNorm
statistics per (batch, G*C) channel ARE the original per-(frame, C) stats,
and BatchNorm uses the same [..., G, C] reduction view as s2d
(nn/s2d.norm_nd_s2d). The cost is G x structural-zero FLOPs in the conv —
spare MXU capacity traded for lane occupancy (tools/bench_f2d.py measures
whether that pays per shape).

Reference context: the time fold itself mirrors the reference's
unbind/cat dance (up_block.py:20-27); f2d only changes which axis the
fold lands on. Exactness is pinned by tests/test_f2d.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def to_f2d(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """[BT, H, W, C] -> [BT/g, H, W, g*C] (group-major channels)."""
    bt, h, w, c = x.shape
    assert bt % g == 0, (bt, g)
    x = x.reshape(bt // g, g, h, w, c)
    return jnp.moveaxis(x, 1, 3).reshape(bt // g, h, w, g * c)


def from_f2d(y: jnp.ndarray, g: int) -> jnp.ndarray:
    """[BT/g, H, W, g*C] -> [BT, H, W, C]."""
    b, h, w, gc = y.shape
    c = gc // g
    y = y.reshape(b, h, w, g, c)
    return jnp.moveaxis(y, 3, 1).reshape(b * g, h, w, c)


def blockdiag_kernel(w: jnp.ndarray, g: int) -> jnp.ndarray:
    """[k, k, C, Co] -> [k, k, g*C, g*Co] block-diagonal (frame i reads only
    frame i's channels)."""
    k0, k1, c, co = w.shape
    kk = jnp.zeros((k0, k1, g * c, g * co), w.dtype)
    for i in range(g):
        kk = kk.at[:, :, i * c:(i + 1) * c, i * co:(i + 1) * co].set(w)
    return kk


def conv_f2d(x: jnp.ndarray, w: jnp.ndarray, bias: Optional[jnp.ndarray],
             g: int, padding: int, padding_mode: str = "reflect",
             strides: int = 1, dtype=None) -> jnp.ndarray:
    """Exact kxk conv on the f2d form: from_f2d(out, g) == conv(from_f2d(x)).

    x: [BT/g, H, W, g*C]; w: [k, k, C, Co] (the ORIGINAL kernel)."""
    from c2m_tpu.nn.layers import _pad_spatial
    p = padding
    xp = _pad_spatial(x, [(p, p), (p, p)],
                      padding_mode if padding_mode != "zeros" else "constant")
    kk = blockdiag_kernel(w, g)
    if dtype is not None:
        xp = xp.astype(dtype)
        kk = kk.astype(dtype)
    y = jax.lax.conv_general_dilated(
        xp, kk, window_strides=(strides, strides), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), g)
    return y


def norm_nd_f2d(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """[..., g*C] -> [..., g, C] so a per-last-axis norm reducing every
    non-channel axis (BatchNorm) computes the original per-C statistics
    (the group axis joins the reduction) — same contract as
    nn/s2d.norm_nd_s2d."""
    return x.reshape(*x.shape[:-1], g, x.shape[-1] // g)


def denorm_nd_f2d(x5: jnp.ndarray) -> jnp.ndarray:
    return x5.reshape(*x5.shape[:-2], x5.shape[-2] * x5.shape[-1])


def instance_norm_f2d(x: jnp.ndarray, g: int, scale: jnp.ndarray,
                      bias: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm on the f2d form: per-(batch, g*C) stats over spatial ARE
    the original per-(frame, C) stats, so no reshape is needed — only the
    (C,) affine parameters tile across the g frame groups."""
    red = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=red, keepdims=True)
    var = jnp.var(x, axis=red, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + epsilon)
    return y * jnp.tile(scale, g) + jnp.tile(bias, g)
