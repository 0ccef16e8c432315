"""Reflect-pad conv correctness: nn/layers.Conv(padding_mode="reflect")
against a hand-built jnp.pad(reflect)+VALID conv, and Conv3d's folded
lowering against torch ReflectionPad3d+conv3d.

(These tests were written for an implicit border-strip reflect conv that
was reverted after measuring: the DUS strip replacement is NOT done in
place by XLA — bench bytes 42.6->56.6 GB, 790->655 f/s — and in isolation
dus 1.405 ms ~= explicit reflect 1.424 ms vs the 0.419 ms zero-pad floor,
tools/bench_pad2.py. They remain as semantics pins for the explicit path.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c2m_tpu.nn.layers import Conv, Conv3d


def _explicit(x, variables, k, p):
    kern = variables["params"]["Conv_0"]["kernel"]
    bias = variables["params"]["Conv_0"]["bias"]
    xp = jnp.pad(x, [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)],
                 mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@pytest.mark.parametrize("shape,k", [
    ((2, 9, 11, 5), 3),
    ((1, 8, 8, 3), 3),
    ((2, 7, 9, 4), 7),     # 7x7 pad 3: H=7 > 2p=6 boundary case
    ((1, 16, 12, 6), 5),
])
def test_conv_reflect_implicit_matches_explicit(shape, k):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    conv = Conv(4, k, 1, k // 2, "reflect")
    variables = conv.init(jax.random.PRNGKey(1), x)
    got = conv.apply(variables, x)
    want = _explicit(x, variables, (k, k), (k // 2, k // 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_conv_reflect_small_map_fallback():
    # H == 2p: torch-style reflect degrades to edge padding where reflect
    # is impossible (_pad_spatial)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 20, 3), jnp.float32)
    conv = Conv(2, 7, 1, 3, "reflect")
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (1, 6, 20, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_conv3d_reflect_matches_torch_semantics():
    # Conv3d's time-folded 2D lowering vs torch ReflectionPad3d + conv3d
    torch = pytest.importorskip("torch")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 9, 11, 3),
                          jnp.float32)
    conv = Conv3d(4, 3, 1, 1, "reflect")
    variables = conv.init(jax.random.PRNGKey(1), x)
    got = np.asarray(conv.apply(variables, x))

    kern = np.asarray(variables["params"]["Conv_0"]["kernel"])
    bias = np.asarray(variables["params"]["Conv_0"]["bias"])
    kt, c = 3, 3
    # folded layout: [kh, kw, kt*C, F] with kt-major channel order ->
    # torch [F, C, kt, kh, kw]
    w = kern.reshape(3, 3, kt, c, -1)
    tw = torch.tensor(w).permute(4, 3, 2, 0, 1)  # F, C, kt, kh, kw
    tx = torch.tensor(np.asarray(x)).permute(0, 4, 1, 2, 3)
    pad = torch.nn.ReflectionPad3d(1)
    ty = torch.nn.functional.conv3d(pad(tx), tw, torch.tensor(bias))
    want = ty.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
