"""Flow warping / bilinear sampling / affine grids / torch-parity resizes.

These are the central primitives of the C2M pipeline (reference:
src/utils/ops.py:183-275, src/modules/motion_estimator/dense_motion.py:161-168,
src/utils/utils.py:346-372). Pure-jnp implementations with exact PyTorch
numerical semantics so golden tests against torch (CPU) validate parity; the
Pallas TPU kernels in ``c2m_tpu.ops.pallas`` plug in behind the same API.

Layout convention (TPU-native, channels-last):
- images/features: ``[..., H, W, C]``
- flows:           ``[..., H, W, 2]`` with last dim ``(fx, fy)`` in *pixels*

The reference composes grids in two different normalized conventions
(align_corners=True linspace grids sampled with align_corners=False
``grid_sample`` — ops.py:196-202 vs :183-184). Rather than porting that
convention mix, each function here documents and implements the exact
pixel-space sampling math it induces.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _gather_2d(image: jnp.ndarray, x_idx: jnp.ndarray, y_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels: image [H, W, C], x_idx/y_idx [H', W'] int32 -> [H', W', C]."""
    h, w, c = image.shape
    flat = image.reshape(h * w, c)
    idx = (y_idx * w + x_idx).reshape(-1)
    return jnp.take(flat, idx, axis=0).reshape(*x_idx.shape, c)


def bilinear_sample(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                    padding: str = "border") -> jnp.ndarray:
    """Bilinear sample of a single image at pixel coordinates.

    image: [H, W, C]; sx, sy: [H', W'] float pixel coords (0..W-1 / 0..H-1).
    padding: 'border' clamps coordinates (torch grid_sample padding_mode=
    'border'); 'zeros' returns 0 for corners outside the image (torch default).
    """
    h, w, _ = image.shape
    if padding == "border":
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding == "zeros":
        vx0 = (x0i >= 0) & (x0i <= w - 1)
        vx1 = (x1i >= 0) & (x1i <= w - 1)
        vy0 = (y0i >= 0) & (y0i <= h - 1)
        vy1 = (y1i >= 0) & (y1i <= h - 1)
        m00 = (vx0 & vy0)[..., None]
        m10 = (vx1 & vy0)[..., None]
        m01 = (vx0 & vy1)[..., None]
        m11 = (vx1 & vy1)[..., None]

    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    v00 = _gather_2d(image, x0c, y0c)
    v10 = _gather_2d(image, x1c, y0c)
    v01 = _gather_2d(image, x0c, y1c)
    v11 = _gather_2d(image, x1c, y1c)

    if padding == "zeros":
        zero = jnp.zeros((), image.dtype)
        v00 = jnp.where(m00, v00, zero)
        v10 = jnp.where(m10, v10, zero)
        v01 = jnp.where(m01, v01, zero)
        v11 = jnp.where(m11, v11, zero)

    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    top = v00 * (1.0 - wx) + v10 * wx
    bot = v01 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def resample(image: jnp.ndarray, flow: jnp.ndarray, use_pallas: Optional[bool] = None
             ) -> jnp.ndarray:
    """Backward-warp ``image`` by pixel ``flow`` — THE central C2M primitive.

    Matches reference ``utils.ops.resample`` (ops.py:187-202) exactly: the
    reference builds an align_corners=True linspace grid, adds the flow
    normalized by (size-1)/2, and samples with align_corners=False
    border-padded grid_sample, which induces the pixel-space source coords

        sx = (x + fx) * W/(W-1) - 0.5,   sy = (y + fy) * H/(H-1) - 0.5.

    image: [B, H, W, C]; flow: [B, H, W, 2] (fx, fy) in pixels -> [B, H, W, C].
    """
    if use_pallas is None:
        use_pallas = _pallas_enabled()
    if use_pallas:
        from c2m_tpu.ops.pallas import warp_kernels
        return warp_kernels.resample(image, flow)
    if jax.default_backend() == "tpu" and _onehot_supported(image):
        # XLA TPU lowers the 4-corner gather as a ~45M-indices/s scalar loop
        # (2-18 GB/s effective); the hat-matmul contraction below is exact
        # and 7-13x faster at the decoder/generator shapes (measured,
        # tools/bench_resample_variants.py). Larger maps keep the gather.
        return _resample_onehot(image, flow)
    return _resample_jnp(image, flow)


def _onehot_supported(image: jnp.ndarray) -> bool:
    """Exactness + win region for the hat-matmul resample: row bands cover
    the whole source height (band d = H), affordable for short maps."""
    if image.ndim != 4:
        return False
    h = image.shape[1]
    return h <= 64 and h % 8 == 0


def _resample_onehot(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Exact bilinear warp as two hat-weight contractions (MXU-native).

    out[p, c] = sum_y hat(sy_p - y) * sum_x hat(sx_p - x) * img[y, x, c]:
    the hats over the integer grid ARE the bilinear corner weights, and the
    pre-clamped coords make it border-padded. The y-contraction runs per
    8-row output band against the full (padded) source height, so it is
    exact for arbitrary flows — same math, same result as _resample_jnp,
    without XLA's scalar-loop gather.
    """
    b, h, w, c = image.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    wf = w / max(w - 1.0, 1e-6)
    hf = h / max(h - 1.0, 1e-6)
    sx = jnp.clip((xs[None, None, :] + flow[..., 0].astype(jnp.float32))
                  * wf - 0.5, 0.0, w - 1.0)
    sy = jnp.clip((ys[None, :, None] + flow[..., 1].astype(jnp.float32))
                  * hf - 0.5, 0.0, h - 1.0)

    bh = 8
    d = h                     # full-height coverage -> exact for any flow
    rows = bh + 2 * d
    pad = jnp.pad(image, ((0, 0), (d, d), (0, 0), (0, 0)))

    def band_out(bi):
        r0 = bi * bh
        slab = jax.lax.dynamic_slice(pad, (0, r0, 0, 0), (b, rows, w, c))
        sy_b = jax.lax.dynamic_slice(sy, (0, r0, 0), (b, bh, w))
        sx_b = jax.lax.dynamic_slice(sx, (0, r0, 0), (b, bh, w))
        yy = (jnp.arange(rows, dtype=jnp.float32) + (r0 - d))[None, None, :]
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(
            sy_b.reshape(b, bh * w, 1) - yy)).astype(image.dtype)
        tmp = jnp.einsum("bpr,brwc->bpwc", haty, slab,
                         preferred_element_type=jnp.float32)
        xx = xs[None, None, :]
        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(
            sx_b.reshape(b, bh * w, 1) - xx)).astype(tmp.dtype)
        out = jnp.einsum("bpw,bpwc->bpc", hatx, tmp)
        return out.reshape(b, bh, w, c).astype(image.dtype)

    outs = jax.lax.map(band_out, jnp.arange(h // bh))
    return jnp.moveaxis(outs, 0, 1).reshape(b, h, w, c)


@jax.jit
def resample_pixel(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Pixel-space backward warp — resample2d CUDA extension semantics.

    The FlowNet2 stack warps with the resample2d CUDA kernel
    (resample2d_kernel.cu:16-77): source coords are plainly (x+fx, y+fy)
    with corner clamping — i.e. align_corners=True border sampling — unlike
    the python ``utils.ops.resample`` above (align_corners=False quirk).
    Both conventions are load-bearing; don't unify them.

    image: [B, H, W, C]; flow: [B, H, W, 2] (fx, fy) in pixels.
    """
    b, h, w, _ = image.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    sx = xs[None, :] + flow[..., 0]
    sy = ys[:, None] + flow[..., 1]
    return jax.vmap(lambda im, x, y: bilinear_sample(im, x, y, padding="border"))(
        image, sx, sy)


@jax.jit
def _resample_jnp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    b, h, w, _ = image.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    base_x = jnp.broadcast_to(xs[None, :], (h, w))
    base_y = jnp.broadcast_to(ys[:, None], (h, w))
    # Degenerate 1-wide/1-tall axes: the reference grid collapses to -1 there;
    # (x+fx)*W/(W-1) is guarded since W=1 never occurs in practice.
    wf = w / max(w - 1.0, 1e-6)
    hf = h / max(h - 1.0, 1e-6)
    sx = (base_x[None] + flow[..., 0]) * wf - 0.5
    sy = (base_y[None] + flow[..., 1]) * hf - 0.5
    return jax.vmap(lambda im, x, y: bilinear_sample(im, x, y, padding="border"))(
        image, sx, sy)


def affine_grid(theta: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch ``F.affine_grid(theta, (1, C, h, w), align_corners=False)``.

    theta: [..., 2, 3] mapping output coords -> input coords in normalized
    [-1, 1] space; returns grid [..., h, w, 2] of (gx, gy) normalized coords.
    align_corners=False base coords: x_j = (2j+1)/W - 1.
    """
    dtype = theta.dtype
    xs = (2.0 * jnp.arange(w, dtype=dtype) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=dtype) + 1.0) / h - 1.0
    bx = jnp.broadcast_to(xs[None, :], (h, w))
    by = jnp.broadcast_to(ys[:, None], (h, w))
    gx = (theta[..., 0, 0, None, None] * bx + theta[..., 0, 1, None, None] * by
          + theta[..., 0, 2, None, None])
    gy = (theta[..., 1, 0, None, None] * bx + theta[..., 1, 1, None, None] * by
          + theta[..., 1, 2, None, None])
    return jnp.stack([gx, gy], axis=-1)


def grid_sample_normalized(image: jnp.ndarray, grid: jnp.ndarray,
                           padding: str = "zeros") -> jnp.ndarray:
    """torch ``F.grid_sample(image, grid, align_corners=False)``.

    image: [H, W, C]; grid: [H', W', 2] of normalized coords -> [H', W', C].
    Pixel coords: px = ((g+1)*size - 1)/2 (align_corners=False unnormalize).
    """
    h, w, _ = image.shape
    sx = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    sy = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    return bilinear_sample(image, sx, sy, padding=padding)


def affine_warp_mask(theta: jnp.ndarray, mask: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp a mask by an affine and return (warped_mask, flow_px).

    Reference ``DenseMotionNetwork.warp`` (dense_motion.py:161-168):
    grid = affine_grid(theta) (align_corners=False base), warped = zero-padded
    bilinear grid_sample, and the returned flow is ``grid - base_grid`` where
    base_grid is the *align_corners=True* linspace grid (mixed conventions in
    the reference, reproduced here), scaled to pixels by (size-1)/2.

    theta: [2, 3]; mask: [H, W, 1] -> warped [H, W, 1], flow [H, W, 2] px.
    """
    h, w, _ = mask.shape
    grid = affine_grid(theta, h, w)
    warped = grid_sample_normalized(mask, grid, padding="zeros")
    flow = affine_flow(theta, h, w, dtype=theta.dtype)
    return warped, flow


def affine_flow(theta: jnp.ndarray, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel flow field induced by an affine theta, matching the reference's
    ``grid - base_grid`` with base = linspace(-1,1) (dense_motion.py:163-166).

    Pointwise closed form — never materializes per-object grids in the
    rasterizer. theta: [..., 2, 3] -> flow [..., h, w, 2] in pixels.
    """
    g = affine_grid(theta, h, w)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype) if w > 1 else -jnp.ones((1,), dtype)
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype) if h > 1 else -jnp.ones((1,), dtype)
    fx = (g[..., 0] - xs[None, :]) * ((w - 1.0) / 2.0)
    fy = (g[..., 1] - ys[:, None]) * ((h - 1.0) / 2.0)
    return jnp.stack([fx, fy], axis=-1)


# ---------------------------------------------------------------------------
# Torch-parity resizes (reference: utils/utils.py:346-372; F.interpolate)
# ---------------------------------------------------------------------------

def _bilinear_axis_weights(out_size: int, in_size: int, align_corners: bool,
                           dtype=jnp.float32):
    """Per-output-pixel (lo_index, hi_index, hi_weight) along one axis."""
    dst = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        scale = (in_size - 1) / max(out_size - 1, 1)
        src = dst * scale
    else:
        scale = in_size / out_size
        src = jnp.maximum((dst + 0.5) * scale - 0.5, 0.0)  # torch clamps at 0
    lo = jnp.floor(src).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    whi = (src - lo.astype(dtype)).astype(dtype)
    return lo, hi, whi


def _upsample2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upsample (align_corners=False) along one axis with
    pure shifts/lerps — no gathers. out[2i] = 0.25*x[i-1] + 0.75*x[i] (edge
    clamped), out[2i+1] = 0.75*x[i] + 0.25*x[i+1]."""
    axis = axis % x.ndim
    n = x.shape[axis]

    def shift(v, delta):
        # edge-clamped neighbor along `axis`
        pad = [(0, 0)] * v.ndim
        if delta == -1:
            pad[axis] = (1, 0)
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(0, n)
        else:
            pad[axis] = (0, 1)
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(1, n + 1)
        return jnp.pad(v, pad, mode="edge")[tuple(sl)]

    even = 0.25 * shift(x, -1) + 0.75 * x
    odd = 0.75 * x + 0.25 * shift(x, +1)
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def resize_bilinear(x: jnp.ndarray, size: Sequence[int],
                    align_corners: bool = False) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear')`` on [..., H, W, C]."""
    *lead, h, w, c = x.shape
    nh, nw = size
    if (nh, nw) == (h, w):
        return x
    if not align_corners and (nh, nw) == (2 * h, 2 * w):
        # hot path: every UpBlock is an exact 2x upsample
        return _upsample2x_axis(_upsample2x_axis(x, -3), -2)
    ylo, yhi, wy = _bilinear_axis_weights(nh, h, align_corners, x.dtype)
    xlo, xhi, wx = _bilinear_axis_weights(nw, w, align_corners, x.dtype)
    # rows
    top = jnp.take(x, ylo, axis=-3)
    bot = jnp.take(x, yhi, axis=-3)
    rows = top + (bot - top) * wy[:, None, None]
    # cols
    left = jnp.take(rows, xlo, axis=-2)
    right = jnp.take(rows, xhi, axis=-2)
    return left + (right - left) * wx[:, None]


def resize_nearest(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')``: src = floor(dst * in/out)."""
    *lead, h, w, c = x.shape
    nh, nw = size
    if (nh, nw) == (h, w):
        return x
    yi = jnp.floor(jnp.arange(nh) * (h / nh)).astype(jnp.int32)
    xi = jnp.floor(jnp.arange(nw) * (w / nw)).astype(jnp.int32)
    return jnp.take(jnp.take(x, yi, axis=-3), xi, axis=-2)


def resize_flow(flow: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Bilinear align_corners=True resize + magnitude rescale
    (reference utils.py:346-354). flow: [..., H, W, 2]."""
    h, w = flow.shape[-3], flow.shape[-2]
    nh, nw = size
    out = resize_bilinear(flow, size, align_corners=True)
    sx = nw / float(w)
    sy = nh / float(h)
    return out * jnp.asarray([sx, sy], dtype=flow.dtype)


def resize_video(video: Optional[jnp.ndarray], size: Sequence[int],
                 mode: str = "bilinear", is_flow: bool = False) -> Optional[jnp.ndarray]:
    """Resize a video [..., T, H, W, C] frame-wise (reference utils.py:357-372)."""
    if video is None:
        return None
    if is_flow:
        return resize_flow(video, size)
    if mode == "bilinear":
        return resize_bilinear(video, size, align_corners=False)
    if mode == "nearest":
        return resize_nearest(video, size)
    raise ValueError(f"unknown resize mode {mode}")


# ---------------------------------------------------------------------------
# Pallas toggle
# ---------------------------------------------------------------------------

_PALLAS_DEFAULT = False


def set_pallas_enabled(flag: bool) -> None:
    global _PALLAS_DEFAULT
    _PALLAS_DEFAULT = flag


def _pallas_enabled() -> bool:
    return _PALLAS_DEFAULT
