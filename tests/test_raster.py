"""Rasterizer parity: vectorized winner-takes-last vs the reference's serial
per-object loop (dense_motion.py:94-153), simulated here with torch."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from c2m_tpu.ops.raster import generate_sparse_motion


def torch_reference_loop(instance, inst_ids, thetas, t_pred):
    """Direct transliteration of the reference loop for the test oracle."""
    b, h, w = instance.shape
    bw = torch.zeros(b, 2, t_pred, h, w)
    fw = torch.zeros(b, 2, t_pred, h, w)
    bin_ = torch.zeros(b, 1, t_pred, h, w)

    base_grid = torch.zeros([1, h, w, 2])
    lp = torch.linspace(-1, 1, w) if w > 1 else torch.Tensor([-1])
    base_grid[:, :, :, 0] = torch.ger(torch.ones(h), lp)
    lp = torch.linspace(-1, 1, h) if h > 1 else torch.Tensor([-1])
    base_grid[:, :, :, 1] = torch.ger(lp, torch.ones(w))

    def warp(theta, x):
        grid = F.affine_grid(theta.unsqueeze(0), x.size(), align_corners=False)
        flow = grid - base_grid
        flow = torch.cat([flow[..., 0:1] * ((w - 1.0) / 2.0),
                          flow[..., 1:2] * ((h - 1.0) / 2.0)], dim=-1)
        t_x = F.grid_sample(x, grid, align_corners=False)
        return t_x, flow.permute(0, 3, 1, 2)

    for batch_id in range(b):
        for n, inst_id in enumerate(inst_ids[batch_id]):
            if inst_id == 0:
                continue
            obj_mask = (instance[batch_id] == inst_id).float()[None]
            for t in range(t_pred):
                warped_obj, obj_flow = warp(
                    torch.from_numpy(thetas[batch_id, n, t]).view(2, 3),
                    obj_mask.unsqueeze(0))
                warped_obj = warped_obj[0]
                obj_flow = obj_flow[0]
                bw[batch_id, :, t] = torch.where(warped_obj == 1, obj_flow,
                                                 bw[batch_id, :, t])
                fw[batch_id, :, t] = torch.where(obj_mask == 1, obj_flow * -1,
                                                 fw[batch_id, :, t])
                bin_[batch_id, :, t] = torch.where(warped_obj == 1, warped_obj,
                                                   bin_[batch_id, :, t])
    return bw.numpy(), fw.numpy(), bin_.numpy()


def test_raster_matches_reference_loop():
    # Power-of-two sizes + integer-pixel translations make every sampling
    # coordinate exactly representable, so the reference's fragile
    # ``warped == 1`` boundary test is deterministic across backends.
    b, n, t, h, w = 2, 4, 3, 32, 64
    instance = np.zeros((b, h, w), np.float32)
    # Two rectangles per batch element (ids 26001, 24002); one empty slot; one id=0.
    instance[0, 4:12, 6:18] = 26001
    instance[0, 18:26, 40:56] = 24002
    instance[1, 8:20, 10:26] = 26001
    inst_ids = np.array([[26001, 24002, 0, 0], [26001, 0, 0, 0]], np.int32)
    node_mask = inst_ids != 0

    thetas = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (b, n, t, 1))
    # Integer-pixel translations keep the bilinear warp exactly binary so the
    # reference's ``warped == 1`` test is well-defined.
    thetas[0, 0, :, 2] = [2 * 2.0 / w, 4 * 2.0 / w, 8 * 2.0 / w]
    thetas[0, 1, :, 5] = [-2 * 2.0 / h, -4 * 2.0 / h, -4 * 2.0 / h]
    thetas[1, 0, :, 2] = [6 * 2.0 / w] * 3

    out = generate_sparse_motion(jnp.asarray(instance)[..., None],
                                 jnp.asarray(inst_ids), jnp.asarray(node_mask),
                                 jnp.asarray(thetas))
    ref_bw, ref_fw, ref_bin = torch_reference_loop(
        torch.from_numpy(instance), inst_ids, thetas, t)

    ours_bw = np.transpose(np.asarray(out["sparse_motion_bw"]), (0, 4, 1, 2, 3))
    ours_fw = np.transpose(np.asarray(out["sparse_motion_fw"]), (0, 4, 1, 2, 3))
    ours_bin = np.transpose(np.asarray(out["sparse_motion_bin"]), (0, 4, 1, 2, 3))

    # The reference's ``warped == 1`` interior test is 1-ulp fragile at the
    # warped object's boundary (torch's affine_grid arithmetic vs ours); the
    # spec we hold ourselves to: exact agreement everywhere except a <=1-px
    # shell around coverage boundaries, and tiny mismatch volume overall.
    def assert_interior_match(ours, ref, bin_ref):
        diff = np.abs(ours - ref) > 1e-4
        if not diff.any():
            return
        frac = diff.mean()
        assert frac < 0.005, f"mismatch fraction {frac}"
        # every mismatch must sit next to a coverage edge of the ref bin mask
        edge = np.zeros_like(bin_ref, bool)
        bmask = bin_ref > 0.5
        edge[..., 1:] |= bmask[..., 1:] != bmask[..., :-1]
        edge[..., :-1] |= bmask[..., 1:] != bmask[..., :-1]
        edge[..., 1:, :] |= bmask[..., 1:, :] != bmask[..., :-1, :]
        edge[..., :-1, :] |= bmask[..., 1:, :] != bmask[..., :-1, :]
        where = diff.any(axis=1)  # collapse the flow-channel axis
        assert np.all(edge[:, 0][where]), "mismatch off the coverage boundary"

    assert_interior_match(ours_bw, ref_bw, ref_bin)
    assert_interior_match(ours_fw, ref_fw, ref_bin)
    # fw attaches flow at the *unwarped* mask — exact instance-id equality,
    # no interpolation involved, so it must match everywhere.
    np.testing.assert_allclose(ours_fw, ref_fw, atol=1e-4)


def test_raster_overlap_last_wins():
    # Two objects overlap after warping; the later node must win, matching the
    # reference's sequential overwrite.
    h, w, t = 16, 16, 1
    instance = np.zeros((1, h, w), np.float32)
    instance[0, 2:6, 2:6] = 7      # node 0
    instance[0, 10:14, 2:6] = 9    # node 1
    inst_ids = np.array([[7, 9]], np.int32)
    thetas = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (1, 2, t, 1))
    # Move node 0 down by 8 px, node 1 stays: they collide at rows 10..13.
    # Backward-warp convention: theta maps output coords to source coords, so
    # a +dy in theta samples from above -> object appears shifted down.
    thetas[0, 0, 0, 5] = -8 * 2.0 / h
    out = generate_sparse_motion(jnp.asarray(instance)[..., None],
                                 jnp.asarray(inst_ids),
                                 jnp.asarray(inst_ids != 0),
                                 jnp.asarray(thetas))
    bw = np.asarray(out["sparse_motion_bw"])[0, 0]
    # In the collision zone node 1 must have overwritten node 0's flow: node 0
    # carries fy ~ -8 px, node 1 (identity theta) only the sub-pixel residue of
    # the reference's acf/ac1 grid-convention mismatch (|f| < 0.5).
    assert abs(bw[11, 3, 1]) < 0.5, bw[11, 3]
    bin_ = np.asarray(out["sparse_motion_bin"])[0, 0, ..., 0]
    assert bin_[11, 3] == 1.0


def test_occlusion_outputs_shapes():
    b, n, t, h, w = 1, 2, 2, 16, 24
    instance = np.zeros((b, h, w, 1), np.float32)
    instance[0, 4:8, 4:10, 0] = 5
    inst_ids = np.array([[5, 0]], np.int32)
    thetas = np.tile(np.array([1, 0, 0.25, 0, 1, 0], np.float32), (b, n, t, 1))
    out = generate_sparse_motion(jnp.asarray(instance), jnp.asarray(inst_ids),
                                 jnp.asarray(inst_ids != 0), jnp.asarray(thetas))
    assert out["sparse_occ_bw"].shape == (b, t, h, w, 1)
    assert out["sparse_occ_fw"].shape == (b, t, h, w, 1)
    assert set(np.unique(np.asarray(out["sparse_occ_bw"]))) <= {0.0, 1.0}


def test_separable_matches_gather_path():
    """The MXU matmul raster path must agree exactly with the gather path on
    axis-aligned thetas (arbitrary sub-pixel scale + translation)."""
    rng = np.random.RandomState(3)
    b, n, t, h, w = 2, 3, 2, 24, 40
    instance = np.zeros((b, h, w), np.float32)
    instance[0, 3:11, 5:17] = 26001
    instance[0, 14:20, 22:34] = 24002
    instance[1, 6:16, 8:24] = 25003
    inst_ids = np.array([[26001, 24002, 0], [25003, 0, 0]], np.int32)
    node_mask = inst_ids != 0
    thetas = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (b, n, t, 1))
    thetas[..., 0] = 1.0 + rng.randn(b, n, t) * 0.1     # sx
    thetas[..., 4] = 1.0 + rng.randn(b, n, t) * 0.1     # sy
    thetas[..., 2] = rng.randn(b, n, t) * 0.3           # dx (sub-pixel)
    thetas[..., 5] = rng.randn(b, n, t) * 0.3           # dy

    kwargs = dict(instance=jnp.asarray(instance)[..., None],
                  inst_ids=jnp.asarray(inst_ids),
                  node_mask=jnp.asarray(node_mask),
                  thetas=jnp.asarray(thetas))
    ref = generate_sparse_motion(**kwargs, axis_aligned=False)
    fast = generate_sparse_motion(**kwargs, axis_aligned=True)
    for key in ("sparse_motion_bw", "sparse_motion_fw", "sparse_motion_bin",
                "sparse_occ_bw", "sparse_occ_fw"):
        np.testing.assert_allclose(np.asarray(fast[key]), np.asarray(ref[key]),
                                   atol=1e-4, err_msg=key)


def test_warp_video_separable_matches_resample():
    """Preview fast path: per-object separable warps composed by the winner
    map == resample(src, sparse_motion_bw) exactly (axis-aligned thetas,
    border semantics, identity-affine background)."""
    import jax.numpy as jnp
    from c2m_tpu.ops.raster import generate_sparse_motion, warp_video_separable
    from c2m_tpu.ops.warp import resample

    rng = np.random.RandomState(31)
    b, n, t, h, w, c = 2, 4, 3, 16, 32, 3
    inst = np.zeros((b, h, w, 1), np.float32)
    ids = np.zeros((b, n), np.int32)
    for bi in range(b):
        for k in range(n):
            x1, y1 = 2 + 7 * k, 2 + 3 * k
            inst[bi, y1:y1 + 5, x1:x1 + 6, 0] = 50 + k
            ids[bi, k] = 50 + k
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 1 + rng.randn(b, n, t) * 0.1
    th[..., 4] = 1 + rng.randn(b, n, t) * 0.1
    th[..., 2] = rng.randn(b, n, t) * 0.2
    th[..., 5] = rng.randn(b, n, t) * 0.2
    mask = np.ones((b, n), bool)
    src = rng.rand(b, h, w, c).astype(np.float32)

    sparse = generate_sparse_motion(jnp.asarray(inst), jnp.asarray(ids),
                                    jnp.asarray(mask), jnp.asarray(th),
                                    compute_fw=False, axis_aligned=True)
    src_rep = jnp.repeat(jnp.asarray(src)[:, None], t, axis=1).reshape(
        b * t, h, w, c)
    sm = np.asarray(sparse["sparse_motion_bw"]).reshape(b * t, h, w, 2)
    want = np.asarray(resample(src_rep, jnp.asarray(sm))).reshape(
        b, t, h, w, c)
    got = np.asarray(warp_video_separable(jnp.asarray(src), jnp.asarray(th),
                                          sparse["winner_bw"]))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_winner_scan_matches_batched():
    """The node-scanned winner (512x1024 memory path) must equal the batched
    separable winner bit-for-bit — same interp matrices, same overwrite
    order, no [B, N, T, H, W] materialization."""
    from c2m_tpu.ops.raster import (_INTERIOR_EPS, _warp_masks_separable,
                                    _winner_separable_scan)

    rng = np.random.RandomState(11)
    b, n, t, h, w = 2, 5, 3, 24, 40
    inst = np.zeros((b, h, w), np.float32)
    ids = np.zeros((b, n), np.int32)
    for bi in range(b):
        for k in range(n - 1):  # leave one padding node
            x1, y1 = 2 + 6 * k, 2 + 3 * k
            inst[bi, y1:y1 + 8, x1:x1 + 9] = 70 + k  # overlapping boxes
            ids[bi, k] = 70 + k
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 1 + rng.randn(b, n, t) * 0.1
    th[..., 4] = 1 + rng.randn(b, n, t) * 0.1
    th[..., 2] = rng.randn(b, n, t) * 0.3
    th[..., 5] = rng.randn(b, n, t) * 0.3
    valid = jnp.asarray(ids != 0)

    obj = (inst[:, None] == ids[:, :, None, None].astype(np.float32))
    obj &= np.asarray(valid)[:, :, None, None]
    obj_f = jnp.asarray(obj.astype(np.float32))
    warped = _warp_masks_separable(obj_f, jnp.asarray(th))
    covered = (np.asarray(warped) >= 1.0 - _INTERIOR_EPS)
    covered &= np.asarray(valid)[:, :, None, None, None]
    rank = np.arange(1, n + 1, dtype=np.int32)[None, :, None, None, None]
    want = np.max(np.where(covered, rank, 0), axis=1)

    got = np.asarray(_winner_separable_scan(obj_f, jnp.asarray(th), valid,
                                            _INTERIOR_EPS))
    np.testing.assert_array_equal(got, want)


def test_occlusion_separable_matches_scatter_splat():
    """The axis-aligned occlusion maps (per-node banded hat matmuls,
    occlusion_mass_separable) must binarize identically to the scatter
    splat of the same rasterized flows (reference ops.py:263-275 path) —
    the hat matrix over [0, size) encodes the out-of-image corner zeroing
    for free, and zero-flow background splats onto itself."""
    from c2m_tpu.ops import splat
    from c2m_tpu.ops.raster import generate_sparse_motion

    rng = np.random.RandomState(3)
    b, n, t, h, w = 2, 5, 3, 48, 64
    inst = np.zeros((b, h, w, 1), np.float32)
    ids = np.zeros((b, n), np.int32)
    for bi in range(b):
        for k in range(n - 1):  # leave one padding node
            iid = 1000 + bi * 100 + k
            y, x = rng.randint(0, h - 12), rng.randint(0, w - 16)
            inst[bi, y:y + 12, x:x + 16, 0] = iid
            ids[bi, k] = iid
    mask = ids != 0
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 1.0 + rng.uniform(-0.2, 0.2, (b, n, t))
    th[..., 4] = 1.0 + rng.uniform(-0.2, 0.2, (b, n, t))
    th[..., 2] = rng.uniform(-0.3, 0.3, (b, n, t))
    th[..., 5] = rng.uniform(-0.3, 0.3, (b, n, t))

    out = generate_sparse_motion(jnp.asarray(inst), jnp.asarray(ids),
                                 jnp.asarray(mask), jnp.asarray(th),
                                 compute_fw=True, axis_aligned=True)
    ref_bw = splat.clip_mask(splat.occlusion_map(
        out["sparse_motion_fw"].reshape(b * t, h, w, 2),
        use_pallas=False)).reshape(b, t, h, w, 1)
    ref_fw = splat.clip_mask(splat.occlusion_map(
        out["sparse_motion_bw"].reshape(b * t, h, w, 2),
        use_pallas=False)).reshape(b, t, h, w, 1)
    np.testing.assert_array_equal(np.asarray(out["sparse_occ_bw"]),
                                  np.asarray(ref_bw))
    np.testing.assert_array_equal(np.asarray(out["sparse_occ_fw"]),
                                  np.asarray(ref_fw))
