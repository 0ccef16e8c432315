"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2m_tpu.ops.correlation import correlation


def test_correlation_pallas_matches_jnp():
    from unittest import mock
    from jax.experimental import pallas as pl
    import c2m_tpu.ops.pallas.correlation_kernel as ck

    rng = np.random.RandomState(0)
    a = rng.randn(2, 8, 12, 16).astype(np.float32)
    b = rng.randn(2, 8, 12, 16).astype(np.float32)

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        out = ck.correlation_pallas(jnp.asarray(a), jnp.asarray(b),
                                    max_displacement=4, stride=2)
    ref = correlation(jnp.asarray(a), jnp.asarray(b), max_displacement=4,
                      stride=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_warp_kernels_resample_matches_jnp(monkeypatch):
    """Fused Pallas warp (ops/pallas/warp_kernels.py) == jnp resample.

    Interpret mode on CPU; the same kernel lowers through Mosaic and was
    parity-checked on the real v5e (STATUS.md perf notes)."""
    import c2m_tpu.ops.pallas.warp_kernels as wk
    monkeypatch.setattr(wk, "_INTERPRET", True)
    from c2m_tpu.ops.warp import _resample_jnp

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))
    flow = jnp.asarray((rng.rand(2, 32, 128, 2) * 16 - 8).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 32, 128, 1).astype(np.float32))

    want = np.asarray(_resample_jnp(img, flow))
    np.testing.assert_allclose(np.asarray(wk.resample(img, flow)), want,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wk.resample_masked(img, flow, mask)),
                               want * np.asarray(mask), atol=1e-5)


def test_warp_kernels_fallback_unsupported_shape(monkeypatch):
    import c2m_tpu.ops.pallas.warp_kernels as wk
    monkeypatch.setattr(wk, "_INTERPRET", True)
    from c2m_tpu.ops.warp import _resample_jnp
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(1, 16, 48, 2).astype(np.float32))  # W%128 != 0
    flow = jnp.asarray(rng.rand(1, 16, 48, 2).astype(np.float32))
    np.testing.assert_allclose(np.asarray(wk.resample(img, flow)),
                               np.asarray(_resample_jnp(img, flow)), atol=1e-6)


def test_resample_use_pallas_flag(monkeypatch):
    """ops.warp.resample(use_pallas=True) routes through the real module
    (the round-1 dead import is gone)."""
    import c2m_tpu.ops.pallas.warp_kernels as wk
    monkeypatch.setattr(wk, "_INTERPRET", True)
    from c2m_tpu.ops import warp
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(1, 32, 128, 2).astype(np.float32))
    flow = jnp.asarray((rng.rand(1, 32, 128, 2) * 6 - 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(warp.resample(img, flow, use_pallas=True)),
        np.asarray(warp.resample(img, flow, use_pallas=False)), atol=1e-5)


def test_splat_kernel_matches_scatter():
    """MXU hat-contraction splat (ops/pallas/splat_kernel.py) == the XLA
    scatter-add path, including out-of-image drops and border partial mass.
    Interpret mode on CPU; parity + perf on the real v5e in STATUS.md."""
    from unittest import mock
    from jax.experimental import pallas as pl
    import c2m_tpu.ops.pallas.splat_kernel as sk
    from c2m_tpu.ops import splat

    rng = np.random.RandomState(7)
    flow = jnp.asarray((rng.rand(3, 16, 128, 2) * 20 - 10).astype(np.float32))
    ref = splat.occlusion_map(flow, use_pallas=False)

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = splat.occlusion_map(flow, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_splat_kernel_nonmultiple_chunk():
    """Point-count padding (P % 2048 != 0) contributes zero mass."""
    from unittest import mock
    from jax.experimental import pallas as pl
    from c2m_tpu.ops import splat

    rng = np.random.RandomState(8)
    flow = jnp.asarray((rng.rand(2, 9, 130, 2) * 6 - 3).astype(np.float32))
    ref = splat.occlusion_map(flow, use_pallas=False)
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = splat.occlusion_map(flow, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_maskwarp_kernel_matches_gather():
    """General-affine mask warp (ops/pallas/maskwarp_kernel.py) == the
    vmapped grid_sample gather path (zeros padding), shears included."""
    from unittest import mock
    from jax.experimental import pallas as pl
    import c2m_tpu.ops.pallas.maskwarp_kernel as mw
    from c2m_tpu.ops.warp import affine_grid, grid_sample_normalized

    rng = np.random.RandomState(11)
    b, n, t, h, w = 2, 3, 2, 16, 128
    obj = (rng.rand(b, n, h, w) > 0.7).astype(np.float32)
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 1 + rng.randn(b, n, t) * 0.1
    th[..., 4] = 1 + rng.randn(b, n, t) * 0.1
    th[..., 1] = rng.randn(b, n, t) * 0.05
    th[..., 3] = rng.randn(b, n, t) * 0.05
    th[..., 2] = rng.randn(b, n, t) * 0.2
    th[..., 5] = rng.randn(b, n, t) * 0.2

    def warp_one(mask_hw, theta6):
        grid = affine_grid(theta6.reshape(2, 3), h, w)
        return grid_sample_normalized(mask_hw[..., None], grid,
                                      padding="zeros")[..., 0]

    ref = jax.vmap(jax.vmap(jax.vmap(warp_one, in_axes=(None, 0)),
                            in_axes=(0, 0)), in_axes=(0, 0))(
        jnp.asarray(obj), jnp.asarray(th))

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = mw.warp_masks(jnp.asarray(obj), jnp.asarray(th))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_raster_pallas_path_matches_gather_path():
    """generate_sparse_motion(use_pallas=True) == the gather path end-to-end
    (winner composition, flows, occlusion) on a general-affine raster."""
    from unittest import mock
    from jax.experimental import pallas as pl
    from c2m_tpu.ops.raster import generate_sparse_motion

    rng = np.random.RandomState(12)
    b, n, t, h, w = 2, 4, 3, 16, 128
    inst = np.zeros((b, h, w, 1), np.float32)
    ids = np.zeros((b, n), np.int32)
    for bi in range(b):
        for k in range(n):
            x1, y1 = 8 + 24 * k, 2 + 3 * k
            inst[bi, y1:y1 + 6, x1:x1 + 12, 0] = 100 + k
            ids[bi, k] = 100 + k
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 1 + rng.randn(b, n, t) * 0.05
    th[..., 4] = 1 + rng.randn(b, n, t) * 0.05
    th[..., 1] = rng.randn(b, n, t) * 0.03
    th[..., 2] = rng.randn(b, n, t) * 0.1
    th[..., 5] = rng.randn(b, n, t) * 0.1
    mask = np.ones((b, n), bool)

    args = (jnp.asarray(inst), jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(th))
    ref = generate_sparse_motion(*args, compute_fw=True, use_pallas=False)

    orig = pl.pallas_call

    def interp_call(*args_, **kwargs):
        kwargs["interpret"] = True
        return orig(*args_, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = generate_sparse_motion(*args, compute_fw=True, use_pallas=True)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-4, err_msg=k)

def test_resample_onehot_matches_jnp():
    """The MXU hat-matmul resample path (ops/warp._resample_onehot) is exact
    vs the golden-tested gather path, arbitrary (large) flows included."""
    from c2m_tpu.ops.warp import _resample_jnp, _resample_onehot

    rng = np.random.RandomState(21)
    img = jnp.asarray(rng.rand(3, 32, 64, 5).astype(np.float32))
    flow = jnp.asarray((rng.rand(3, 32, 64, 2) * 80 - 40).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_resample_onehot(img, flow)),
                               np.asarray(_resample_jnp(img, flow)), atol=1e-5)


def test_splat_kernel_height_guard():
    """h > 128 with h % 128 != 0 is outside the kernel's row banding — the
    occlusion_map guard must route it to the scatter path, and the kernel
    itself must refuse it rather than drop rows."""
    from c2m_tpu.ops.pallas import splat_kernel

    flow = jnp.zeros((1, 160, 256, 2))
    coords = jnp.zeros((1, 160, 256, 2))
    with pytest.raises(AssertionError):
        splat_kernel.corresponding_map(coords)
    # the default dispatch on CPU (and for this shape anywhere) is scatter
    from c2m_tpu.ops import splat
    out = splat.occlusion_map(flow)
    assert bool(jnp.isfinite(out).all())


def test_maskwarp_banded_matches_gather():
    """Banded window kernel (ops/pallas/maskwarp_banded.py) == the vmapped
    grid_sample gather for general affines whose spans fit the windows —
    the high-res (512x1024) general-raster path. Interpret mode on CPU."""
    from unittest import mock
    from jax.experimental import pallas as pl
    from c2m_tpu.ops.pallas import maskwarp_banded as mb
    from c2m_tpu.ops.raster import _theta_rows
    from c2m_tpu.ops.warp import affine_grid, grid_sample_normalized

    rng = np.random.RandomState(5)
    b, n, t, h, w = 1, 2, 2, 64, 512
    assert mb.supported(h, w)
    masks = np.zeros((b, n, h, w), np.float32)
    masks[0, 0, 10:40, 60:200] = 1.0
    masks[0, 1, 25:60, 300:480] = 1.0
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 1.0 + rng.randn(b, n, t) * 0.2   # sx
    th[..., 4] = 1.0 + rng.randn(b, n, t) * 0.2   # sy
    th[..., 1] = rng.randn(b, n, t) * 0.05        # shear terms: general,
    th[..., 3] = rng.randn(b, n, t) * 0.05        # near-axis-aligned
    th[..., 2] = rng.randn(b, n, t) * 0.4
    th[..., 5] = rng.randn(b, n, t) * 0.4
    thj = jnp.asarray(th)
    mj = jnp.asarray(masks)

    yb, xb, ok = mb.plan_windows(thj.reshape(b * n, t, 6), h, w)
    assert bool(ok), "crafted thetas must fit the windows"

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = np.asarray(mb.warp_masks(mj, thj, yb, xb))

    def warp_one(mask_hw, theta6):
        grid = affine_grid(_theta_rows(theta6), h, w)
        return grid_sample_normalized(mask_hw[..., None], grid,
                                      padding="zeros")[..., 0]

    want = np.asarray(jax.vmap(jax.vmap(
        jax.vmap(warp_one, in_axes=(None, 0)), in_axes=(0, 0)))(mj, thj))
    # hat built from absolute pixel coords: f32 eps at coord magnitude
    # (~3e-5 at W=512) — why the raster relaxes interior_eps on this path
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_maskwarp_banded_nontrivial_windows():
    """Windows that actually slide (H=256, W=1024: 8x4 window blocks):
    translations push different tiles onto different source blocks."""
    from unittest import mock
    from jax.experimental import pallas as pl
    from c2m_tpu.ops.pallas import maskwarp_banded as mb
    from c2m_tpu.ops.raster import _theta_rows
    from c2m_tpu.ops.warp import affine_grid, grid_sample_normalized

    b, n, t, h, w = 1, 1, 2, 256, 1024
    masks = np.zeros((b, n, h, w), np.float32)
    masks[0, 0, 40:200, 100:900] = 1.0
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 0.8
    th[..., 4] = 1.2
    th[..., 1] = 0.02
    th[..., 3] = -0.03
    th[..., 2] = [0.5, -0.7]
    th[..., 5] = [-0.4, 0.6]
    thj = jnp.asarray(th)
    mj = jnp.asarray(masks)
    yb, xb, ok = mb.plan_windows(thj.reshape(b * n, t, 6), h, w)
    assert bool(ok)
    assert len(np.unique(np.asarray(yb))) > 1      # windows actually move
    assert len(np.unique(np.asarray(xb))) > 1

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = np.asarray(mb.warp_masks(mj, thj, yb, xb))

    def warp_one(mask_hw, theta6):
        grid = affine_grid(_theta_rows(theta6), h, w)
        return grid_sample_normalized(mask_hw[..., None], grid,
                                      padding="zeros")[..., 0]

    want = np.asarray(jax.vmap(jax.vmap(
        jax.vmap(warp_one, in_axes=(None, 0)), in_axes=(0, 0)))(mj, thj))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_maskwarp_banded_span_verdict():
    """plan_windows flags thetas whose source span exceeds the window (big
    rotation/shear) so the caller's lax.cond takes the gather path."""
    from c2m_tpu.ops.pallas import maskwarp_banded as mb
    h, w = 256, 1024
    th = np.zeros((1, 1, 6), np.float32)
    th[..., 0] = 1.0
    th[..., 4] = 1.0
    _, _, ok = mb.plan_windows(jnp.asarray(th), h, w)
    assert bool(ok)
    th[..., 3] = 2.0   # huge shear: sy spans far beyond one window
    _, _, ok = mb.plan_windows(jnp.asarray(th), h, w)
    assert not bool(ok)


def test_maskwarp_banded_small_operating_point():
    """Round 3: win_sizes shrinks the window to (16, 128) at the 128x256
    operating point so the banded kernel is SUPPORTED there — measured
    SLOWER than the quadratic hat contraction (44.4 vs 38.2 ms,
    tools/bench_raster.py: per-tile window DMAs dominate at small maps),
    so the raster auto-route keeps the quadratic kernel at this size; the
    banded kernel carries 512x1024 where the quadratic is gated off. This
    test pins the small-size parity + plan fit for GNN-like thetas."""
    from unittest import mock
    from jax.experimental import pallas as pl
    from c2m_tpu.ops.pallas import maskwarp_banded as mb
    from c2m_tpu.ops.raster import _theta_rows
    from c2m_tpu.ops.warp import affine_grid, grid_sample_normalized

    h, w = 128, 256
    assert mb.win_sizes(h, w) == (16, 128)
    assert mb.supported(h, w)
    # 512x1024 keeps round 3's measured configuration
    assert mb.win_sizes(512, 1024) == (32, 256)

    rng = np.random.RandomState(7)
    b, n, t = 1, 3, 2
    masks = np.zeros((b, n, h, w), np.float32)
    masks[0, 0, 10:50, 20:90] = 1.0
    masks[0, 1, 60:110, 100:220] = 1.0
    masks[0, 2, 30:70, 150:250] = 1.0
    th = np.zeros((b, n, t, 6), np.float32)
    th[..., 0] = 1.0 + rng.randn(b, n, t) * 0.05   # GNN-like: near-identity
    th[..., 4] = 1.0 + rng.randn(b, n, t) * 0.05
    th[..., 1] = rng.randn(b, n, t) * 0.01
    th[..., 3] = rng.randn(b, n, t) * 0.01
    th[..., 2] = rng.randn(b, n, t) * 0.3
    th[..., 5] = rng.randn(b, n, t) * 0.3
    thj = jnp.asarray(th)
    mj = jnp.asarray(masks)

    yb, xb, ok = mb.plan_windows(thj.reshape(b * n, t, 6), h, w)
    assert bool(ok), "GNN-like thetas must fit the (16, 128) windows"

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = np.asarray(mb.warp_masks(mj, thj, yb, xb))

    def warp_one(mask_hw, theta6):
        grid = affine_grid(_theta_rows(theta6), h, w)
        return grid_sample_normalized(mask_hw[..., None], grid,
                                      padding="zeros")[..., 0]

    want = np.asarray(jax.vmap(jax.vmap(
        jax.vmap(warp_one, in_axes=(None, 0)), in_axes=(0, 0)))(mj, thj))
    np.testing.assert_allclose(got, want, atol=1e-4)
