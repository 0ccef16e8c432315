"""ROI-align as vectorized bilinear crop-and-pool (TPU-friendly, static shapes).

Reference: torchvision ``roi_align`` on the appearance pyramid
(src/modules/appearance_encoder/appearance_encoder.py:67-70, pool 7x7,
spatial_scale 1/4). torchvision's adaptive sampling_ratio (-1) picks a
data-dependent number of samples per bin — not expressible with static XLA
shapes — so we use a fixed 2x2 sample grid per bin (the common detectron
setting), aligned=False coordinate semantics.

Box format here is (x1, y1, x2, y2) in input-image pixels. NOTE the reference
passes boxes as (x_l, x_r, y_t, y_b) — i.e. torchvision interprets its x2 as
y1 — an apparent bug we do not reproduce; there are no pretrained weights to
stay bit-compatible with, and correct ROIs strictly dominate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c2m_tpu.ops.warp import bilinear_sample


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, output_size: int,
              spatial_scale: float, sampling_ratio: int = 2) -> jnp.ndarray:
    """features: [B, H, W, C]; boxes: [B, N, 4] (x1,y1,x2,y2) image pixels.

    Returns [B, N, output_size, output_size, C].
    """
    b, h, w, c = features.shape
    n = boxes.shape[1]
    s = sampling_ratio
    out = output_size

    x1 = boxes[..., 0] * spatial_scale
    y1 = boxes[..., 1] * spatial_scale
    x2 = boxes[..., 2] * spatial_scale
    y2 = boxes[..., 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)   # torchvision clamps roi size to >= 1
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out

    # Sample positions: for bin i, samples at x1 + (i + (k+0.5)/s) * bin_w.
    grid = (jnp.arange(out * s) + 0.5) / s  # positions in units of bins
    sx = x1[..., None] + grid[None, None, :] * bin_w[..., None]   # [B, N, out*s]
    sy = y1[..., None] + grid[None, None, :] * bin_h[..., None]

    def sample_one(feat, sx_n, sy_n):
        # feat [H, W, C]; sx_n/sy_n [out*s] -> [out*s, out*s, C]
        xx = jnp.broadcast_to(sx_n[None, :], (out * s, out * s))
        yy = jnp.broadcast_to(sy_n[:, None], (out * s, out * s))
        return bilinear_sample(feat, xx, yy, padding="zeros")

    sampled = jax.vmap(lambda feat, sxs, sys: jax.vmap(
        lambda a, bb: sample_one(feat, a, bb))(sxs, sys))(features, sx, sy)
    # [B, N, out*s, out*s, C] -> average each s x s sample block
    sampled = sampled.reshape(b, n, out, s, out, s, c)
    return sampled.mean(axis=(3, 5))
