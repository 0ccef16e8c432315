"""Space-to-depth conv reformulation exactness (nn/s2d.py).

Every routine must EQUAL its plain-layout counterpart — these are layout
transforms of the same math (the TPU lane-filling path for full-res
thin-channel stages; see tools/roofline.py for why)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c2m_tpu.nn import s2d


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def _plain_conv(x, w, bias, padding, mode):
    from c2m_tpu.nn.layers import _pad_spatial
    xp = _pad_spatial(x, [(padding, padding), (padding, padding)],
                      mode if mode != "zeros" else "constant")
    y = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias if bias is not None else y


def test_roundtrip():
    x = _rand((2, 8, 12, 5))
    np.testing.assert_array_equal(np.asarray(s2d.from_s2d(s2d.to_s2d(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("k,mode", [(3, "reflect"), (3, "zeros"),
                                    (7, "reflect"), (7, "zeros"),
                                    (5, "reflect")])
def test_conv_s2d_exact(k, mode):
    b, h, w_, c, co = 2, 16, 24, 3, 4
    x = _rand((b, h, w_, c), seed=k)
    w = _rand((k, k, c, co), seed=k + 10) * 0.3
    bias = _rand((co,), seed=k + 20)
    want = _plain_conv(x, w, bias, k // 2, mode)
    got = s2d.from_s2d(s2d.conv_s2d(s2d.to_s2d(x), w, bias, k // 2, mode))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,mode", [(3, "reflect"), (3, "zeros"),
                                    (7, "reflect"), (5, "zeros")])
def test_conv_s2d_single_exact(k, mode):
    b, h, w_, c, co = 2, 16, 24, 3, 4
    x = _rand((b, h, w_, c), seed=k)
    w = _rand((k, k, c, co), seed=k + 10) * 0.3
    bias = _rand((co,), seed=k + 20)
    want = _plain_conv(x, w, bias, k // 2, mode)
    got = s2d.from_s2d(
        s2d.conv_s2d_single(s2d.to_s2d(x), w, bias, k // 2, mode))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["reflect", "zeros"])
def test_downconv_s2d_exact(mode):
    b, h, w_, c, co = 2, 16, 24, 3, 6
    x = _rand((b, h, w_, c), seed=3)
    w = _rand((4, 4, c, co), seed=13) * 0.3
    bias = _rand((co,), seed=23)
    from c2m_tpu.nn.layers import _pad_spatial
    xp = _pad_spatial(x, [(1, 1), (1, 1)],
                      mode if mode != "zeros" else "constant")
    want = jax.lax.conv_general_dilated(
        xp, w, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = s2d.downconv_s2d(s2d.to_s2d(x), w, bias, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_upsample2x_to_s2d_exact():
    from c2m_tpu.ops.warp import resize_bilinear
    x = _rand((2, 9, 13, 4), seed=5)
    want = resize_bilinear(x, (18, 26), align_corners=False)
    got = s2d.from_s2d(s2d.upsample2x_to_s2d(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_mean_pool_s2d_bitwise():
    """mean_pool_s2d == bilinear 2x downsample (torch align_corners=False),
    bitwise — the arithmetic replicates resize_bilinear's generic path."""
    from c2m_tpu.ops.warp import resize_bilinear
    for dtype in (jnp.float32, jnp.bfloat16):
        x = _rand((3, 10, 14, 5), seed=11).astype(dtype)
        want = resize_bilinear(x, (5, 7), align_corners=False)
        got = s2d.mean_pool_s2d(s2d.to_s2d(x))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_decoder_s2d_stage_matches_plain():
    """The decoder's s2d up-stage (UpBlock2dS2d + phase-mean instead of
    UpBlock2d + bilinear half-resize, models/dense_motion.py) equals the
    plain path on one variable tree — the pyramid extension of the tail's
    exactness guarantee."""
    import flax.linen as nn
    from c2m_tpu.nn import s2d_blocks as sb
    from c2m_tpu.nn.layers import UpBlock2d
    from c2m_tpu.ops.warp import resize_bilinear

    x = _rand((4, 8, 12, 6), seed=21)

    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = UpBlock2d(5, 3, 1, 1, "reflect", name="up")(x, train=False)
            return resize_bilinear(y, (x.shape[1], x.shape[2]),
                                    align_corners=False)

    class S2dPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            ys = sb.UpBlock2dS2d(5, 3, "reflect", name="up")(x, train=False)
            return s2d.mean_pool_s2d(ys)

    variables = Plain().init(jax.random.PRNGKey(0), x)
    want = Plain().apply(variables, x)
    got = S2dPath().apply(variables, x)   # same tree — param names match
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_norm_reshape_exact_stats():
    """InstanceNorm on the phase-split 5D view == InstanceNorm on the plain
    tensor (per-original-channel stats; the phase axis joins the spatial
    reduction)."""
    from c2m_tpu.nn.layers import InstanceNorm
    x = _rand((2, 8, 12, 6), seed=7)
    m = InstanceNorm(affine=False)
    want = m.apply({}, x)
    s = s2d.to_s2d(x)
    got5 = m.apply({}, s2d.norm_nd_s2d(s))
    got = s2d.from_s2d(s2d.denorm_nd_s2d(got5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["reflect", "zeros"])
@pytest.mark.parametrize("shape", [(2, 6, 9, 5), (1, 5, 5, 3), (2, 12, 7, 4)])
def test_fused_up_conv_matches_s2d_reference(mode, shape):
    """fused_up_conv (composite upsample-folded kernel + exact border
    strips) == the reference s2d path conv_s2d_single(upsample2x_to_s2d)
    — which tests already pin to the plain UpBlock conv."""
    x = _rand(shape, seed=3)
    w = _rand((3, 3, shape[-1], 7), seed=4) * 0.3
    bias = _rand((7,), seed=5)
    want = s2d.conv_s2d_single(s2d.upsample2x_to_s2d(x), w, bias, 1, mode)
    got = s2d.fused_up_conv(x, w, bias, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_up_conv_small_fallback():
    x = _rand((1, 3, 4, 2), seed=9)
    w = _rand((3, 3, 2, 4), seed=10)
    want = s2d.conv_s2d_single(s2d.upsample2x_to_s2d(x), w, None, 1, "reflect")
    got = s2d.fused_up_conv(x, w, None, "reflect")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
