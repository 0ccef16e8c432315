"""Vectorized sparse-motion rasterization over padded object nodes.

Replaces the reference's serial Python loop over (object x timestep) pairs
(``DenseMotionNetwork.generate_sparse_motion``, dense_motion.py:94-153) — the
single biggest structural change of the TPU build (SURVEY.md §7). The
reference iterates nodes in order and overwrites overlapping pixels with the
later object's flow ("last object wins"); we reproduce that with a fully
vectorized winner-takes-last composition:

1. build all object masks at once:      obj[b,n]   = (instance[b] == id[b,n])
2. warp every mask by its affine:        warped[b,n,t] (vmapped bilinear)
3. winner per pixel = argmax_n (n+1)*covered  — last node wins ties, exactly
   the reference's overwrite order (PyG batches keep within-graph node order)
4. gather the winning theta per pixel and evaluate its affine *flow field
   pointwise* — per-object dense flows are never materialized.

All outputs are stop_gradient'ed: the reference detaches ``sparse_motion_bw``
(dense_motion.py:143) and every other consumer path is non-differentiable
(binary masks, no_grad splat), so the rasterizer is entirely off the autodiff
path, matching reference gradient flow (GNN gradients come only from the
theta losses, SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from c2m_tpu.ops import splat
from c2m_tpu.ops.warp import affine_grid, grid_sample_normalized

# A bilinear sample of a {0,1} mask equals exactly 1 only in the interior;
# the reference tests ``warped == 1`` (dense_motion.py:137). We allow for
# float rounding in the 4-term interpolation.
_INTERIOR_EPS = 1e-5


def _theta_rows(theta6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 2, 3] (same as reference theta.view(2, 3))."""
    return theta6.reshape(*theta6.shape[:-1], 2, 3)


def _pointwise_affine_flow(theta6: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Flow at every pixel from per-pixel affine coefficients.

    theta6: [..., H, W, 6] -> flow [..., H, W, 2] in pixels. Matches
    ``affine_grid (align_corners=False base) - linspace(-1,1) base`` scaled by
    (size-1)/2 (reference dense_motion.py:161-168's mixed conventions).
    """
    dtype = theta6.dtype
    bx_acf = (2.0 * jnp.arange(w, dtype=dtype) + 1.0) / w - 1.0       # [-1,1) acf
    by_acf = (2.0 * jnp.arange(h, dtype=dtype) + 1.0) / h - 1.0
    bx_ac1 = jnp.linspace(-1.0, 1.0, w, dtype=dtype) if w > 1 else -jnp.ones((1,), dtype)
    by_ac1 = jnp.linspace(-1.0, 1.0, h, dtype=dtype) if h > 1 else -jnp.ones((1,), dtype)
    bx = bx_acf[None, :]
    by = by_acf[:, None]
    gx = theta6[..., 0] * bx + theta6[..., 1] * by + theta6[..., 2]
    gy = theta6[..., 3] * bx + theta6[..., 4] * by + theta6[..., 5]
    fx = (gx - bx_ac1[None, :]) * ((w - 1.0) / 2.0)
    fy = (gy - by_ac1[:, None]) * ((h - 1.0) / 2.0)
    return jnp.stack([fx, fy], axis=-1)


def _interp_matrix(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear interpolation matrix for source positions ``pos`` [..., M]:
    out[..., m, i] = zeros-padded bilinear weight of source index i at
    pos[..., m]. Exactly grid_sample(align_corners=False, zeros) weights:
    max(0, 1 - |pos - i|), which also reproduces the partial border weights.
    """
    idx = jnp.arange(size, dtype=pos.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - idx))


def _separable_coords(thetas: jnp.ndarray, h: int, w: int):
    """Axis-aligned affine -> acf source pixel coords per axis.
    thetas [B, N, T, 6] -> px [B, N, T, W], py [B, N, T, H]."""
    dtype = thetas.dtype
    bx = (2.0 * jnp.arange(w, dtype=dtype) + 1.0) / w - 1.0
    by = (2.0 * jnp.arange(h, dtype=dtype) + 1.0) / h - 1.0
    # normalized sample coords, then acf pixel coords
    gx = thetas[..., 0, None] * bx + thetas[..., 2, None]     # [B, N, T, W]
    gy = thetas[..., 4, None] * by + thetas[..., 5, None]     # [B, N, T, H]
    px = ((gx + 1.0) * w - 1.0) * 0.5
    py = ((gy + 1.0) * h - 1.0) * 0.5
    return px, py


def _warp_masks_separable(obj_f: jnp.ndarray, thetas: jnp.ndarray
                          ) -> jnp.ndarray:
    """Warp all object masks by *axis-aligned* affines as two dense matmuls —
    MXU-native, zero gathers (the TPU rewrite of the reference's per-object
    grid_sample loop). Exact for thetas with zero off-diagonals, which GT
    thetas always have ([sx, 0, dx, 0, sy, dy], cityscapes.py:159).

    obj_f: [B, N, H, W]; thetas: [B, N, T, 6] -> warped [B, N, T, H, W].
    """
    b, n, h, w = obj_f.shape
    px, py = _separable_coords(thetas, h, w)
    kx = _interp_matrix(px, w)                                 # [B, N, T, W, W]
    ky = _interp_matrix(py, h)                                 # [B, N, T, H, H]
    tmp = jnp.einsum("bnji,bntxi->bntjx", obj_f, kx,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("bntyj,bntjx->bntyx", ky, tmp,
                      preferred_element_type=jnp.float32)


def _winner_separable_scan(obj_f: jnp.ndarray, thetas: jnp.ndarray,
                           valid: jnp.ndarray, interior_eps: float
                           ) -> jnp.ndarray:
    """Winner map for axis-aligned thetas WITHOUT materializing the full
    [B, N, T, H, W] warped stack: scan over nodes, carrying only the running
    winner. At 512x1024 the batched path's interp matrices alone are
    [B, N, T, W, W] ~ 1 GB; here peak extra memory is one node's
    [B, T, H, W] warp (the train-fit requirement, VERDICT r2 #1).
    Exactly the same winner as max(rank * covered) since later nodes
    overwrite earlier ones on ties — identical to winner-takes-last.
    """
    b, n, h, w = obj_f.shape
    t = thetas.shape[2]
    px, py = _separable_coords(thetas, h, w)                   # [B,N,T,W/H]

    def body(winner, xs):
        mask, px_n, py_n, valid_n, rank = xs                   # [B,H,W],[B,T,W],[B,T,H]
        kx = _interp_matrix(px_n, w)                           # [B, T, W, W]
        ky = _interp_matrix(py_n, h)                           # [B, T, H, H]
        tmp = jnp.einsum("bji,btxi->btjx", mask, kx,
                         preferred_element_type=jnp.float32)
        warped = jnp.einsum("btyj,btjx->btyx", ky, tmp,
                            preferred_element_type=jnp.float32)
        covered = (warped >= (1.0 - interior_eps)) & valid_n[:, None, None, None]
        return jnp.where(covered, rank, winner), None

    ranks = jnp.arange(1, n + 1, dtype=jnp.int32)
    init = jnp.zeros((b, t, h, w), jnp.int32)
    winner, _ = jax.lax.scan(
        body, init,
        (jnp.moveaxis(obj_f, 1, 0), jnp.moveaxis(px, 1, 0),
         jnp.moveaxis(py, 1, 0), jnp.moveaxis(valid, 1, 0), ranks))
    return winner


def _occ_out_coords(thetas: jnp.ndarray, h: int, w: int, sign: float):
    """Forward-splat target coords per node for axis-aligned thetas.

    The rasterized flow at a pixel of node k is the pointwise affine flow
    (``_pointwise_affine_flow``); forward-splatting displaces each source
    pixel to ``x + sign*fx(x)`` — separable per axis when the theta
    off-diagonals are zero. sign=+1 splats ``sparse_motion_bw`` (occ_fw),
    sign=-1 splats ``sparse_motion_fw = -flow_fw`` (occ_bw).

    thetas: [B, N, T, 6] -> ox [B, N, T, W], oy [B, N, T, H] (fp32).
    """
    th = thetas.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    bx_acf = (2.0 * xs + 1.0) / w - 1.0
    by_acf = (2.0 * ys + 1.0) / h - 1.0
    bx_ac1 = (jnp.linspace(-1.0, 1.0, w) if w > 1
              else -jnp.ones((1,), jnp.float32))
    by_ac1 = (jnp.linspace(-1.0, 1.0, h) if h > 1
              else -jnp.ones((1,), jnp.float32))
    gx = th[..., 0, None] * bx_acf + th[..., 2, None]          # [B, N, T, W]
    gy = th[..., 4, None] * by_acf + th[..., 5, None]          # [B, N, T, H]
    fx = (gx - bx_ac1) * ((w - 1.0) / 2.0)
    fy = (gy - by_ac1) * ((h - 1.0) / 2.0)
    return xs + sign * fx, ys + sign * fy


def occlusion_mass_separable(winner: jnp.ndarray, thetas: jnp.ndarray,
                             sign: float) -> jnp.ndarray:
    """Forward-splat visibility mass of a rasterized piecewise-affine flow —
    exactly ``splat.corresponding_map(base + flow)`` — as per-node banded
    hat matmuls (axis-aligned thetas only; the hot path at use_gt_training /
    use_gt_eval, where the XLA/Pallas scatter splat costs ~17 ms per
    512x1024 map vs ~0.4 ms here).

    The bilinear splat weight at integer out-pixel (p, o) from source (y, x)
    is hat(oy(y)-p)*hat(ox(x)-o) (out-of-image corners get zero — which the
    [0, size) hat matrix encodes for free since hat support is < 1), so the
    mass restricted to node k's region factorizes:
        mass_k = Sy_k^T @ mask_k @ Sx_k.
    Background pixels carry zero flow and splat onto themselves with weight
    one — their contribution IS the background mask.

    winner: [B, T, H, W] (or t-independent [B, H, W]) int, 0 = background;
    thetas: [B, N, T, 6] -> mass [B, T, H, W] fp32 (un-clipped).
    """
    n, t = thetas.shape[1:3]
    static_regions = winner.ndim == 3                          # occ_bw case
    if static_regions:
        b, h, w = winner.shape
    else:
        b, _, h, w = winner.shape
    ox, oy = _occ_out_coords(thetas, h, w, sign)

    def body(carry, xs_):
        mass, idx = carry
        ox_n, oy_n = xs_                                       # [B,T,W], [B,T,H]
        sx = _interp_matrix(ox_n, w)                           # [B, T, W, W]
        sy = _interp_matrix(oy_n, h)                           # [B, T, H, H]
        if static_regions:
            mask = (winner == idx).astype(jnp.float32)         # [B, H, W]
            tmp = jnp.einsum("byx,btxo->btyo", mask, sx,
                             preferred_element_type=jnp.float32)
        else:
            mask = (winner == idx).astype(jnp.float32)         # [B, T, H, W]
            tmp = jnp.einsum("btyx,btxo->btyo", mask, sx,
                             preferred_element_type=jnp.float32)
        mass = mass + jnp.einsum("btyp,btyo->btpo", sy, tmp,
                                 preferred_element_type=jnp.float32)
        return (mass, idx + 1), None

    bg = (winner == 0).astype(jnp.float32)
    if static_regions:
        bg = jnp.broadcast_to(bg[:, None], (b, t, h, w))
    (mass, _), _ = jax.lax.scan(
        body, (bg, jnp.int32(1)),
        (jnp.moveaxis(ox, 1, 0), jnp.moveaxis(oy, 1, 0)))
    return mass


def generate_sparse_motion(instance: jnp.ndarray,
                           inst_ids: jnp.ndarray,
                           node_mask: jnp.ndarray,
                           thetas: jnp.ndarray,
                           compute_fw: bool = True,
                           axis_aligned: bool = False,
                           use_pallas: Optional[bool] = None
                           ) -> Dict[str, jnp.ndarray]:
    """Rasterize per-object affine motions into sparse flow fields.

    Args:
      instance:  [B, H, W, 1] float instance-id map (last input frame).
      inst_ids:  [B, N] int instance id per node (0 = skip, reference
                 dense_motion.py:127-128).
      node_mask: [B, N] bool — False for padding nodes.
      thetas:    [B, N, T, 6] affine coefficients [sx, b, dx, c, sy, dy]
                 (rows of the 2x3 matrix), GT or GNN-predicted.
      compute_fw: also produce the forward sparse flow.
      axis_aligned: promise that theta off-diagonals are zero (always true
                 for GT thetas) -> mask warps run as dense interpolation-
                 matrix matmuls on the MXU instead of vmapped gathers.

    Returns dict with ``sparse_motion_bw``/``sparse_motion_fw`` [B, T, H, W, 2],
    ``sparse_motion_bin`` [B, T, H, W, 1], ``sparse_occ_bw``/``sparse_occ_fw``
    [B, T, H, W, 1] (binarized forward-splat visibility).
    """
    b, h, w, _ = instance.shape
    n = inst_ids.shape[1]
    t = thetas.shape[2]
    dtype = thetas.dtype

    valid = node_mask & (inst_ids != 0)                                # [B, N]
    obj = (instance[:, None, :, :, 0] == inst_ids[:, :, None, None].astype(instance.dtype))
    obj = jnp.where(valid[:, :, None, None], obj, False)               # [B, N, H, W]
    obj_f = obj.astype(dtype)

    # Warp every object mask by its per-timestep affine: [B, N, T, H, W].
    interior_eps = _INTERIOR_EPS
    warped = None
    if axis_aligned:
        if b * n * t * h * w > (1 << 27):
            # big maps (512x1024 long-horizon): node-scanned winner, never
            # materializing [B, N, T, H, W] or the [B, N, T, W, W] interp
            # matrices (peak ~1.5 GB at config 5 otherwise)
            winner_bw = _winner_separable_scan(obj_f, thetas, valid,
                                               interior_eps)
        else:
            warped = _warp_masks_separable(obj_f, thetas)
    else:
        def warp_gather(masks, th):
            def warp_one(mask_hw, theta6):
                grid = affine_grid(_theta_rows(theta6), h, w)
                return grid_sample_normalized(mask_hw[..., None], grid,
                                              padding="zeros")[..., 0]

            warp_nt = jax.vmap(jax.vmap(warp_one, in_axes=(None, 0)),
                               in_axes=(0, 0))
            return jax.vmap(warp_nt)(masks, th)            # [B, N, T, H, W]

        from c2m_tpu.ops.pallas import maskwarp_banded, maskwarp_kernel
        tpu = jax.default_backend() == "tpu"
        # the full hat contraction is O((H*W)^2) per warp — a clear win at
        # the 128x256 operating point (717 -> 38 ms measured) but
        # quadratically worse at 512x1024, where it is size-gated off
        quad_ok = (w % 128 == 0 and h % 8 == 0
                   and b * n * t * (h * w) ** 2 <= 2e12)
        # use_pallas=False must mean NO pallas (the golden gather path);
        # auto (None) prefers the QUADRATIC hat contraction where it is
        # gated on — measured FASTER than the banded window kernel at the
        # 128x256 operating point (38.2 vs 44.4 ms, tools/bench_raster.py:
        # one big MXU contraction beats per-tile window DMAs at small
        # maps) — and the banded kernel (O(H*W * window)) where the
        # quadratic's O((H*W)^2) cost is size-gated off (512x1024: banded
        # 745 ms vs gather 6151 ms)
        if use_pallas is True or (use_pallas is None and tpu and quad_ok):
            # gather-free MXU kernels share identical hat math, but the
            # interior test needs headroom for f32 matmul accumulation
            # order, so the eps is PATH-DEPENDENT: boundary pixels with
            # warped mass in (1-1e-4, 1-1e-5) may flip `covered` between
            # the pallas and gather paths (tests/test_raster.py's
            # cross-path test bounds the effect). use_pallas=True forces
            # this kernel (tests pin it under an interpret-mode patch).
            warped = maskwarp_kernel.warp_masks(obj_f, thetas)
            interior_eps = 1e-4
        elif (use_pallas is None and tpu
                and maskwarp_banded.supported(h, w)):
            # banded window kernel when every tile's source span fits its
            # prefetched window (true for the GNN's near-axis-aligned
            # thetas); runtime cond falls back to the gather for outlier
            # thetas, so exactness is unconditional.
            # Hat-from-absolute-coords costs ~f32 eps at coord magnitude
            # (~6e-5 at W=1024) -> the relaxed interior eps.
            th2 = thetas.reshape(b * n, t, 6).astype(jnp.float32)
            yb, xb, ok = maskwarp_banded.plan_windows(th2, h, w)
            warped = jax.lax.cond(
                ok,
                lambda: maskwarp_banded.warp_masks(obj_f, thetas, yb, xb),
                lambda: warp_gather(obj_f, thetas))
            interior_eps = 1e-4
        else:
            warped = warp_gather(obj_f, thetas)
    if warped is not None:
        covered = warped >= (1.0 - interior_eps)
        covered = covered & valid[:, :, None, None, None]
        node_rank = jnp.arange(1, n + 1,
                               dtype=jnp.int32)[None, :, None, None, None]
        winner_bw = jnp.max(jnp.where(covered, node_rank, 0), axis=1)  # [B, T, H, W]

    # Select the winning node's theta per pixel via a one-hot contraction
    # over the (tiny) node axis — a per-pixel N-way select the TPU runs as
    # dense math; jnp.take_along_axis lowers to an XLA gather that is >10x
    # slower at these shapes (tools/bench_resample_variants.py).
    win_idx = jnp.maximum(winner_bw - 1, 0)                            # [B, T, H, W]
    theta_txy = jnp.transpose(thetas, (0, 2, 1, 3))                    # [B, T, N, 6]
    node_iota = jnp.arange(n, dtype=jnp.int32)
    onehot_bw = (win_idx[..., None] == node_iota).astype(dtype)        # [B, T, H, W, N]
    theta_win = jnp.einsum("bthwn,btnc->bthwc", onehot_bw, theta_txy)  # [B, T, H, W, 6]
    flow_all = _pointwise_affine_flow(theta_win, h, w)                 # [B, T, H, W, 2]
    has_bw = (winner_bw > 0)[..., None]
    sparse_bw = jnp.where(has_bw, flow_all, 0.0)
    sparse_bin = has_bw.astype(dtype)

    # Forward: flow attached at the *unwarped* object mask, negated
    # (dense_motion.py:139-140). Winner over the static masks is t-independent.
    winner_fw = jnp.max(
        jnp.where(obj & valid[:, :, None, None],
                  jnp.arange(1, n + 1, dtype=jnp.int32)[None, :, None, None], 0),
        axis=1)                                                        # [B, H, W]
    winf_idx = jnp.maximum(winner_fw - 1, 0)
    onehot_fw = (winf_idx[..., None] == node_iota).astype(dtype)       # [B, H, W, N]
    theta_win_fw = jnp.einsum("bhwn,btnc->bthwc", onehot_fw, theta_txy)
    flow_fw_all = _pointwise_affine_flow(theta_win_fw, h, w)
    has_fw = (winner_fw > 0)[:, None, :, :, None]
    sparse_fw = jnp.where(has_fw, -flow_fw_all, 0.0)

    # Occlusion maps by forward splat of the *other* direction's flow
    # (dense_motion.py:147-152), binarized at 0.5. Axis-aligned thetas:
    # the splat factorizes into per-node banded hat matmuls over the winner
    # regions (occlusion_mass_separable) — same math, no scatter.
    if axis_aligned:
        occ_bw = splat.clip_mask(jnp.clip(
            occlusion_mass_separable(winner_fw, thetas, sign=-1.0),
            0.0, 1.0))[..., None]
        occ_fw = splat.clip_mask(jnp.clip(
            occlusion_mass_separable(winner_bw, thetas, sign=1.0),
            0.0, 1.0))[..., None]
    else:
        occ_bw = splat.clip_mask(
            splat.occlusion_map(sparse_fw.reshape(b * t, h, w, 2))).reshape(b, t, h, w, 1)
        occ_fw = splat.clip_mask(
            splat.occlusion_map(sparse_bw.reshape(b * t, h, w, 2))).reshape(b, t, h, w, 1)

    out = {
        "sparse_motion_bw": jax.lax.stop_gradient(sparse_bw),
        "sparse_motion_bin": jax.lax.stop_gradient(sparse_bin),
        "sparse_occ_bw": jax.lax.stop_gradient(occ_bw),
        "sparse_occ_fw": jax.lax.stop_gradient(occ_fw),
        # winner node per pixel (0 = background): lets consumers rebuild
        # piecewise-affine warps without re-gathering (see
        # warp_video_separable)
        "winner_bw": jax.lax.stop_gradient(winner_bw),
    }
    if compute_fw:
        out["sparse_motion_fw"] = jax.lax.stop_gradient(sparse_fw)
    return out


def warp_video_separable(src: jnp.ndarray, thetas: jnp.ndarray,
                         winner: jnp.ndarray) -> jnp.ndarray:
    """Warp a frame by the rasterized sparse flow — exactly
    ``resample(src_rep, sparse_motion_bw)`` — as per-object separable
    matmuls composed by the winner map. Valid for axis-aligned thetas
    (the reference's test-time setting, use_gt_eval=True).

    The composite of the rasterizer's flow convention with ``resample``'s
    sampling convention collapses to plain acf-grid sampling of the object's
    affine: sx = ((gx+1)W-1)/2 with gx = t0*bx_acf + t2 — so each object's
    warp is two interpolation-matrix matmuls (border semantics = clamped
    sample positions), and background pixels take the identity affine
    (resample at zero flow is NOT the identity under the reference's mixed
    align_corners conventions — the identity-theta warp reproduces it).

    src: [B, H, W, C]; thetas: [B, N, T, 6]; winner: [B, T, H, W] int
    (0 = background) -> [B, T, H, W, C]. Avoids the full-res XLA gather
    (measured ~2 GB/s effective — tools/bench_resample_variants.py).
    """
    b, h, w, c = src.shape
    n, t = thetas.shape[1:3]
    dtype = src.dtype

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    bx = (2.0 * xs + 1.0) / w - 1.0
    by = (2.0 * ys + 1.0) / h - 1.0
    gx = thetas[..., 0, None] * bx + thetas[..., 2, None]  # [B, N, T, W]
    gy = thetas[..., 4, None] * by + thetas[..., 5, None]  # [B, N, T, H]
    px_obj = ((gx + 1.0) * w - 1.0) * 0.5
    py_obj = ((gy + 1.0) * h - 1.0) * 0.5
    # background = resample at zero flow, which under the reference's mixed
    # align_corners conventions is sx = x*W/(W-1) - 0.5 (NOT the identity)
    px_bg = jnp.broadcast_to(xs * (w / max(w - 1.0, 1e-6)) - 0.5,
                             (b, 1, t, w))
    py_bg = jnp.broadcast_to(ys * (h / max(h - 1.0, 1e-6)) - 0.5,
                             (b, 1, t, h))
    px = jnp.clip(jnp.concatenate([px_bg, px_obj], axis=1), 0.0, w - 1.0)
    py = jnp.clip(jnp.concatenate([py_bg, py_obj], axis=1), 0.0, h - 1.0)

    def per_node(acc_and_idx, coords):
        acc, idx = acc_and_idx
        px_n, py_n = coords                                # [B,T,W], [B,T,H]
        # interp matrices built per node INSIDE the scan so peak memory is
        # one node's [B, T, W, W], not [B, N+1, T, W, W] (hundreds of MB at
        # 512x1024 for a viz-only stream — ADVICE r2)
        kx = _interp_matrix(px_n, w).astype(dtype)         # [B, T, W, W]
        ky = _interp_matrix(py_n, h).astype(dtype)         # [B, T, H, H]
        tmp = jnp.einsum("bjic,btxi->btjxc", src, kx,
                         preferred_element_type=jnp.float32)
        wn = jnp.einsum("btyj,btjxc->btyxc", ky, tmp,
                        preferred_element_type=jnp.float32).astype(dtype)
        acc = jnp.where((winner == idx)[..., None], wn, acc)
        return (acc, idx + 1), None

    init = jnp.zeros((b, t, h, w, c), dtype)
    (out, _), _ = jax.lax.scan(
        per_node, (init, jnp.int32(0)),
        (jnp.moveaxis(px, 1, 0), jnp.moveaxis(py, 1, 0)))
    return out
