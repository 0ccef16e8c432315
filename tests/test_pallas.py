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
