"""Forward-splat occlusion map (scatter-add of bilinear weights).

Reference: ``get_corresponding_map`` / ``get_occlusion_map``
(src/utils/ops.py:205-275). Given a flow field, every source pixel is
displaced by its flow and its unit mass is bilinearly splatted onto the four
surrounding integer pixels of the *target* grid; the accumulated (clamped)
mass is a soft visibility map — 0 means occluded/not-written, 1 visible.

The reference corner naming is inverted (x1 = floor, x0 = floor+1); the math
below follows the same weights: for corner c, weight = (1-|x-cx|)(1-|y-cy|),
zeroed when the raw corner falls outside the image.

This is the "hard part" scatter-add with duplicate indices (SURVEY.md §7);
the jnp version lowers to XLA scatter-add. No gradient flows through it in
the reference (torch.no_grad, ops.py:271-273) — we mirror that with
stop_gradient so the op is off the autodiff path entirely.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def corresponding_map(coords: jnp.ndarray) -> jnp.ndarray:
    """Splat unit mass at float target ``coords`` onto the integer grid.

    coords: [B, H, W, 2] un-normalized (x, y) pixel coordinates.
    Returns [B, H, W, 1] accumulated bilinear mass.
    """
    b, h, w, _ = coords.shape
    x = coords[..., 0].reshape(b, -1)
    y = coords[..., 1].reshape(b, -1)

    x_f = jnp.floor(x)           # reference "x1"
    y_f = jnp.floor(y)
    x_c = x_f + 1.0              # reference "x0"
    y_c = y_f + 1.0

    def clamp_x(v):
        return jnp.clip(v, 0.0, w - 1.0)

    def clamp_y(v):
        return jnp.clip(v, 0.0, h - 1.0)

    corners = []
    for cx, cy in ((x_c, y_c), (x_c, y_f), (x_f, y_c), (x_f, y_f)):
        cxc, cyc = clamp_x(cx), clamp_y(cy)
        invalid = (cx != cxc) | (cy != cyc)
        wgt = (1.0 - jnp.abs(x - cxc)) * (1.0 - jnp.abs(y - cyc))
        wgt = jnp.where(invalid, 0.0, wgt)
        idx = (cxc + cyc * w).astype(jnp.int32)
        corners.append((idx, wgt))

    indices = jnp.concatenate([c[0] for c in corners], axis=1)  # [B, 4HW]
    values = jnp.concatenate([c[1] for c in corners], axis=1)

    out = jnp.zeros((b, h * w), dtype=coords.dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], indices.shape)
    out = out.at[batch_idx, indices].add(values, mode="drop")
    return out.reshape(b, h, w, 1)


def occlusion_map(flow: jnp.ndarray, use_pallas: Optional[bool] = None
                  ) -> jnp.ndarray:
    """Soft occlusion map from a flow field (reference ops.py:263-275).

    flow: [B, H, W, 2] pixels -> [B, H, W, 1] in [0, 1]; 0 = occluded.
    Non-differentiable by design (reference computes it under no_grad).

    On TPU the splat runs as the gather/scatter-free MXU hat-contraction
    kernel (ops/pallas/splat_kernel.py — numerically identical, fp32);
    elsewhere (and under interpret-mode tests) the XLA scatter-add path.
    """
    flow = jax.lax.stop_gradient(flow)
    b, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    base = jnp.stack([jnp.broadcast_to(xs[None, :], (h, w)),
                      jnp.broadcast_to(ys[:, None], (h, w))], axis=-1)
    coords = base[None] + flow
    if use_pallas is None:
        # lane-aligned maps whose height the kernel's 128-row banding covers
        # exactly; anything else takes the scatter path
        use_pallas = (jax.default_backend() == "tpu" and w % 128 == 0
                      and (h <= 128 or h % 128 == 0))
    if use_pallas:
        from c2m_tpu.ops.pallas import splat_kernel
        corr = splat_kernel.corresponding_map(coords)
    else:
        corr = corresponding_map(coords)
    return jnp.clip(corr, 0.0, 1.0)


def clip_mask(mask: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Binarize a soft mask (reference dense_motion.py:155-159)."""
    return jnp.where(mask > threshold, jnp.ones_like(mask), jnp.zeros_like(mask))


def get_edges(instance: jnp.ndarray) -> jnp.ndarray:
    """Instance boundary mask (reference ops.py:278-284; unused in the main
    path, kept for API parity). instance: [..., H, W, C] -> float edges."""
    e = jnp.zeros_like(instance, dtype=bool)
    dx = instance[..., :, 1:, :] != instance[..., :, :-1, :]
    e = e.at[..., :, 1:, :].set(e[..., :, 1:, :] | dx)
    e = e.at[..., :, :-1, :].set(e[..., :, :-1, :] | dx)
    dy = instance[..., 1:, :, :] != instance[..., :-1, :, :]
    e = e.at[..., 1:, :, :].set(e[..., 1:, :, :] | dy)
    e = e.at[..., :-1, :, :].set(e[..., :-1, :, :] | dy)
    return e.astype(jnp.float32)
