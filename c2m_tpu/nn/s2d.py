"""Space-to-depth (s2d) execution of full-res thin-channel conv stages.

WHY: tools/roofline.py shows the inference hot path is HBM-bound and that
every full-res tensor with C<=32 pays a 4x lane-padding tax — a
[60, 128, 256, 32] bf16 activation occupies and moves 4x its logical bytes
because XLA tiles (sublane=8, lane=128) and 32 channels fill a quarter of
the lanes. Executing those stages on the space-to-depth form
[B, H/2, W/2, 4C] fills the lanes exactly (4*32 = 128): ~4x fewer bytes
per pass for ~1.8x more (cheap, MXU) FLOPs.

EXACTNESS: these are reformulations, not approximations. A kxk stride-1
conv on [H, W, C] is computed as 4 phase outputs, each a VALID conv on the
s2d tensor with a kernel assembled from the ORIGINAL conv weights (the
parameters are untouched — checkpoints and init are identical); reflect
padding maps to phase-corrected boundary rows built from interior s2d rows.
Each routine is unit-tested for exact equality against the plain path
(tests/test_s2d.py).

Phase layout is phase-major: s[b, i, j, (qy*2+qx)*C + c] == x[b, 2i+qy,
2j+qx, c].

Derivation of the kernel scatter: for output phase (py, px) and original
tap (ky, kx) with pad p, the sampled row is r = 2I + py + ky - p =
2*(I+u) + qy with u = (py+ky-p)//2 (floor), qy = (py+ky-p) & 1 — so tap
(ky, kx) of weight w lands at s-kernel position (u - u_min, ...) in the
input-phase block (qy, qx). Each phase's s-kernel is ceil((k+1)/2) wide.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (phase-major)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def from_s2d(s: jnp.ndarray) -> jnp.ndarray:
    """[B, H/2, W/2, 4C] -> [B, H, W, C]."""
    b, h2, w2, c4 = s.shape
    c = c4 // 4
    s = s.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return s.reshape(b, h2 * 2, w2 * 2, c)


def _phase_split(s: jnp.ndarray) -> jnp.ndarray:
    """[..., 4C] -> [..., 2, 2, C] (qy, qx, c)."""
    return s.reshape(*s.shape[:-1], 2, 2, s.shape[-1] // 4)


def _phase_join(s5: jnp.ndarray) -> jnp.ndarray:
    return s5.reshape(*s5.shape[:-3], 4 * s5.shape[-1])


def _pad_rows_reflect(s: jnp.ndarray, top: int, bottom: int) -> jnp.ndarray:
    """Reflect-pad the ORIGINAL row axis by building phase-corrected s2d
    boundary rows: padded s-row -m holds original rows (-2m, -2m+1), which
    reflect to s[m]'s phase-0 rows and s[m-1]'s phase-1 rows (and
    symmetrically at the bottom)."""
    if top == 0 and bottom == 0:
        return s
    p = _phase_split(s)                      # [B, n, w2, qy, qx, C]
    n = p.shape[1]
    rows = []
    for m in range(top, 0, -1):
        # [B, w2, qx, C] pair stacked on a new qy axis -> [B, 1, w2, 2, 2, C]
        row = jnp.stack([p[:, m, :, 0], p[:, m - 1, :, 1]], axis=2)
        rows.append(row[:, None])
    rows.append(p)
    for m in range(1, bottom + 1):
        row = jnp.stack([p[:, n - m, :, 0], p[:, n - m - 1, :, 1]], axis=2)
        rows.append(row[:, None])
    return _phase_join(jnp.concatenate(rows, axis=1))


def _pad_cols_reflect(s: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    if left == 0 and right == 0:
        return s
    p = _phase_split(s)                      # [B, h2, n, qy, qx, C]
    n = p.shape[2]
    cols = []
    for m in range(left, 0, -1):
        # [B, h2, qy, C] pair stacked on a new qx axis -> [B, h2, 1, 2, 2, C]
        col = jnp.stack([p[:, :, m, :, 0], p[:, :, m - 1, :, 1]], axis=3)
        cols.append(col[:, :, None])
    cols.append(p)
    for m in range(1, right + 1):
        col = jnp.stack([p[:, :, n - m, :, 0], p[:, :, n - m - 1, :, 1]],
                        axis=3)
        cols.append(col[:, :, None])
    return _phase_join(jnp.concatenate(cols, axis=2))


def _pad_s2d(s: jnp.ndarray, top: int, bottom: int, left: int, right: int,
             mode: str) -> jnp.ndarray:
    if mode in ("zeros", "constant"):
        return jnp.pad(s, ((0, 0), (top, bottom), (left, right), (0, 0)))
    assert mode == "reflect", mode
    return _pad_cols_reflect(_pad_rows_reflect(s, top, bottom), left, right)


def _taps(q: int, k: int, p: int) -> Tuple[int, int]:
    lo = (q - p) // 2
    hi = (q + k - 1 - p) // 2
    return lo, hi - lo + 1


def _scatter_kernel(w: jnp.ndarray, k: int, p: int, py: int, px: int
                    ) -> Tuple[jnp.ndarray, int, int]:
    """Assemble the s2d-space kernel for output phase (py, px).

    w: [k, k, C, Co]. Returns (K [sky, skx, 4C, Co], u_min_y, u_min_x)
    where sample row r = 2I + py + ky - p = 2*(I+u) + qy.
    """
    c, co = w.shape[2], w.shape[3]
    uy0, sky = _taps(py, k, p)
    ux0, skx = _taps(px, k, p)
    kk = jnp.zeros((sky, skx, 2, 2, c, co), w.dtype)
    for ky in range(k):
        ry = py + ky - p
        for kx in range(k):
            rx = px + kx - p
            kk = kk.at[ry // 2 - uy0, rx // 2 - ux0,
                       ry & 1, rx & 1].set(w[ky, kx])
    return kk.reshape(sky, skx, 4 * c, co), uy0, ux0


def conv_s2d(s: jnp.ndarray, w: jnp.ndarray, bias: Optional[jnp.ndarray],
             padding: int, padding_mode: str = "reflect",
             dtype=None) -> jnp.ndarray:
    """Exact kxk stride-1 conv (odd k, pad=padding) on the s2d form.

    s: [B, H/2, W/2, 4C]; w: [k, k, C, Co] (the ORIGINAL conv kernel);
    returns [B, H/2, W/2, 4Co] — from_s2d(out) == conv(from_s2d(s)).
    """
    import jax
    k = w.shape[0]
    p = padding
    assert k % 2 == 1 and p == k // 2, (k, p)
    u0_all = min(_taps(py, k, p)[0] for py in (0, 1))
    u1_all = max(q + _taps(q, k, p)[0] + _taps(q, k, p)[1] - 1 - q
                 for q in (0, 1))
    pt, pb = -u0_all, u1_all
    s_pad = _pad_s2d(s, pt, pb, pt, pb, padding_mode)
    if dtype is not None:
        s_pad = s_pad.astype(dtype)
        w = w.astype(dtype)
    outs = []
    for py in range(2):
        for px in range(2):
            kk, uy0, ux0 = _scatter_kernel(w, k, p, py, px)
            sky, skx = kk.shape[:2]
            sl = s_pad[:, pt + uy0: s_pad.shape[1] - pb + uy0 + (sky - 1),
                       pt + ux0: s_pad.shape[2] - pb + ux0 + (skx - 1)]
            y = jax.lax.conv_general_dilated(
                sl, kk, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y)
    out = jnp.stack(outs, axis=3)            # [B, h2, w2, 4, Co]
    out = out.reshape(*out.shape[:3], -1)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), 4)
    return out


def conv_s2d_single(s: jnp.ndarray, w: jnp.ndarray,
                    bias: Optional[jnp.ndarray], padding: int,
                    padding_mode: str = "reflect", dtype=None) -> jnp.ndarray:
    """conv_s2d as ONE dense conv emitting all four phases at once.

    Kernel [sk, sk, 4C, 4Co] with structural zeros: 4x the original FLOPs
    (vs conv_s2d's 1.8x across four calls), but a single MXU pass at
    128-lane-filling channel counts and one output write — the variant that
    trades spare MXU FLOPs for bytes. sk is the union of the phases'
    supports (3 for k=3, 5 for k=7).
    """
    import jax
    k = w.shape[0]
    p = padding
    assert k % 2 == 1 and p == k // 2, (k, p)
    c, co = w.shape[2], w.shape[3]
    u0 = min(_taps(py, k, p)[0] for py in (0, 1))
    u1 = max(_taps(py, k, p)[0] + _taps(py, k, p)[1] - 1 for py in (0, 1))
    sk = u1 - u0 + 1
    pt = -u0
    s_pad = _pad_s2d(s, pt, u1, pt, u1, padding_mode)
    if dtype is not None:
        s_pad = s_pad.astype(dtype)
        w = w.astype(dtype)
    kk = jnp.zeros((sk, sk, 2, 2, c, 2, 2, co), w.dtype)
    for py in range(2):
        for px in range(2):
            for ky in range(k):
                ry = py + ky - p
                for kx in range(k):
                    rx = px + kx - p
                    kk = kk.at[ry // 2 - u0, rx // 2 - u0,
                               ry & 1, rx & 1, :, py, px].set(w[ky, kx])
    kk = kk.reshape(sk, sk, 4 * c, 4 * co)
    y = jax.lax.conv_general_dilated(
        s_pad, kk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y


def downconv_s2d(s: jnp.ndarray, w: jnp.ndarray,
                 bias: Optional[jnp.ndarray], padding_mode: str = "reflect",
                 dtype=None) -> jnp.ndarray:
    """Exact 4x4 stride-2 pad-1 conv consuming the s2d form, emitting the
    NORMAL half-res layout (the shape the following blocks already use):
    out == conv4x4s2(from_s2d(s)). Sample row r = 2I + ky - 1."""
    import jax
    k = 4
    assert w.shape[0] == k
    c, co = w.shape[2], w.shape[3]
    # u = (ky-1)//2 for ky in 0..3 -> {-1, 0, 0, 1}: s-kernel 3 wide
    s_pad = _pad_s2d(s, 1, 1, 1, 1, padding_mode)
    if dtype is not None:
        s_pad = s_pad.astype(dtype)
        w = w.astype(dtype)
    kk = jnp.zeros((3, 3, 2, 2, c, co), w.dtype)
    for ky in range(k):
        ry = ky - 1
        for kx in range(k):
            rx = kx - 1
            kk = kk.at[ry // 2 + 1, rx // 2 + 1, ry & 1, rx & 1].set(w[ky, kx])
    kk = kk.reshape(3, 3, 4 * c, co)
    y = jax.lax.conv_general_dilated(
        s_pad, kk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def upsample2x_to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (align_corners=False, torch semantics)
    emitting the s2d form directly — the full-res unpacked tensor is never
    materialized. out phases: q0 = 0.25*shift_up(x) + 0.75*x (edge-clamped),
    q1 = 0.75*x + 0.25*shift_down(x)."""
    def shift_up(v, axis):
        first = jnp.take(v, jnp.array([0]), axis=axis)
        rest = jnp.take(v, jnp.arange(v.shape[axis] - 1), axis=axis)
        return jnp.concatenate([first, rest], axis=axis)

    def shift_down(v, axis):
        last = jnp.take(v, jnp.array([v.shape[axis] - 1]), axis=axis)
        rest = jnp.take(v, jnp.arange(1, v.shape[axis]), axis=axis)
        return jnp.concatenate([rest, last], axis=axis)

    y0 = 0.25 * shift_up(x, 1) + 0.75 * x
    y1 = 0.75 * x + 0.25 * shift_down(x, 1)
    rows = [y0, y1]
    phases = []
    for ry in rows:
        phases.append(0.25 * shift_up(ry, 2) + 0.75 * ry)
        phases.append(0.75 * ry + 0.25 * shift_down(ry, 2))
    return jnp.concatenate(phases, axis=-1).astype(x.dtype)


def _upconv_tap_weights(k: int) -> np.ndarray:
    """R[q, ky, t]: weight with which original conv tap ``ky`` (of a k-tap,
    pad k//2 conv applied to the 2x bilinear upsample) lands on input offset
    ``t - 1`` of the HALF-res tensor, for output phase ``q``.

    Derivation: output full-res row r = 2I + q + ky - p reads upsampled row
    up[r] = a*x[(r>>1)] + b*x[(r>>1) +/- 1] with (a, b) = (0.75, 0.25)
    split by r's parity (torch align_corners=False, scale 2: src = r/2 -
    0.25). For k = 3 every phase's support is exactly x[I-1 .. I+1]."""
    p = k // 2
    assert k == 3, "fused up-conv derived for the 3x3 UpBlock kernel"
    R = np.zeros((2, k, 3), np.float64)
    for q in range(2):
        for ky in range(k):
            delta = q + ky - p
            i_off = delta >> 1          # floor division
            if delta & 1:
                taps = ((i_off, 0.75), (i_off + 1, 0.25))
            else:
                taps = ((i_off - 1, 0.25), (i_off, 0.75))
            for off, wt in taps:
                assert -1 <= off <= 1, (q, ky, off)
                R[q, ky, off + 1] += wt
    return R


def upconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Composite kernel of (3x3 conv) o (2x bilinear upsample).

    w: [3, 3, C, Co] (the ORIGINAL UpBlock conv kernel). Returns
    W4 [3, 3, C, 4Co] (phase-major output channels) such that a VALID conv
    of the plain HALF-res tensor with W4 equals the interior of
    ``conv_s2d_single(upsample2x_to_s2d(x), w, ...)`` — same FLOP count as
    the plain full-res conv, no upsampled tensor, lane-filled output."""
    R = jnp.asarray(_upconv_tap_weights(w.shape[0]), w.dtype)
    # W4[ty, tx, c, (qy*2+qx)*Co + co] = sum_{ky,kx} R[qy,ky,ty] R[qx,kx,tx]
    #                                     * w[ky,kx,c,co]
    W4 = jnp.einsum("yat,xbu,abco->tucyxo", R, R, w)
    t, u, c = W4.shape[0], W4.shape[1], W4.shape[2]
    return W4.reshape(t, u, c, 4 * w.shape[3])


def fused_up_conv(x: jnp.ndarray, w: jnp.ndarray,
                  bias: Optional[jnp.ndarray], padding_mode: str = "reflect",
                  dtype=None) -> jnp.ndarray:
    """Exact ``conv3x3(pad(upsample2x_bilinear(x)))`` emitting the s2d form.

    Equals ``conv_s2d_single(upsample2x_to_s2d(x), w, bias, 1, mode)`` but
    4x cheaper: the upsample folds into the conv kernel (``upconv_kernel``),
    so the interior is ONE plain conv of the half-res input — original FLOP
    count (the s2d kernel scatter pays 4x), input read at 1/4 the bytes, and
    the [B, 2h, 2w, C] upsampled tensor never exists. Border rows/cols
    (where torch's edge clamp + the conv's reflect/zero pad break the
    uniform stencil) are computed exactly by the reference s2d path on thin
    slices and concatenated back.

    x: [B, h, w, C]; w: [3, 3, C, Co] -> [B, h, w, 4Co] (s2d of [2h, 2w, Co]).
    """
    import jax
    k = w.shape[0]
    p = k // 2
    m = 4  # slice margin: covers row 0 / row -1's receptive field for k=3
    b, h, wd, c = x.shape
    if k != 3 or h < m + 1 or wd < m + 1:
        return conv_s2d_single(upsample2x_to_s2d(x), w, bias, p,
                               padding_mode, dtype=dtype)
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    W4 = upconv_kernel(w)
    interior = jax.lax.conv_general_dilated(
        x, W4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        interior = interior + jnp.tile(bias.astype(interior.dtype), 4)

    def strip(xs):
        return conv_s2d_single(upsample2x_to_s2d(xs), w, bias, p,
                               padding_mode, dtype=dtype)

    top = strip(x[:, :m])[:, 0:1]
    bottom = strip(x[:, -m:])[:, -1:]
    left = strip(x[:, :, :m])[:, 1:-1, 0:1]
    right = strip(x[:, :, -m:])[:, 1:-1, -1:]
    mid = jnp.concatenate([left, interior, right], axis=2)
    return jnp.concatenate([top, mid, bottom], axis=1)


def mean_pool_s2d(s: jnp.ndarray) -> jnp.ndarray:
    """Exact bilinear 2x DOWNsample (align_corners=False, torch semantics)
    consuming the s2d form and emitting the PLAIN half-res tensor:
    ``mean_pool_s2d(to_s2d(x)) == resize_bilinear(x, (H/2, W/2))`` bitwise.

    For an exact 1/2 scale, torch bilinear samples src = 2*dst + 0.5 with
    weights (0.5, 0.5) — a 2x2 average, i.e. a combination of the four s2d
    phases. The arithmetic below replicates ops/warp.resize_bilinear's
    generic path exactly (rows lerp first, then cols, same dtype) so the
    equality is bitwise, not just numerical."""
    p = _phase_split(s)                       # [..., qy, qx, C]
    half = jnp.asarray(0.5, s.dtype)
    ra = p[..., 0, 0, :] + (p[..., 1, 0, :] - p[..., 0, 0, :]) * half
    rb = p[..., 0, 1, :] + (p[..., 1, 1, :] - p[..., 0, 1, :]) * half
    return ra + (rb - ra) * half


def norm_nd_s2d(s: jnp.ndarray) -> jnp.ndarray:
    """Reshape hook for norms: [..., 4C] -> [..., 4, C] so a per-last-axis
    norm (BatchNorm/InstanceNorm reducing every non-channel axis) computes
    EXACTLY the original per-C statistics (the phase axis joins the
    reduction)."""
    return s.reshape(*s.shape[:-1], 4, s.shape[-1] // 4)


def denorm_nd_s2d(s5: jnp.ndarray) -> jnp.ndarray:
    return s5.reshape(*s5.shape[:-2], s5.shape[-2] * s5.shape[-1])
