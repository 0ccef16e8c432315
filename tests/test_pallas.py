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
