"""Frames-to-depth (f2d) reformulation exactness (nn/f2d.py).

Frame independence makes every per-frame 2D op exact on the f2d form —
these tests pin the conv (incl. stride/padding modes), the norm views and
the roundtrip against the plain path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c2m_tpu.nn import f2d


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def test_roundtrip():
    x = _rand((8, 6, 10, 5))
    np.testing.assert_array_equal(
        np.asarray(f2d.from_f2d(f2d.to_f2d(x, 4), 4)), np.asarray(x))


@pytest.mark.parametrize("k,mode,stride,g", [
    (3, "reflect", 1, 4), (3, "zeros", 1, 2), (7, "reflect", 1, 4),
    (4, "zeros", 2, 4),
])
def test_conv_f2d_exact(k, mode, stride, g):
    from c2m_tpu.nn.layers import _pad_spatial
    bt, h, w_, c, co = 8, 12, 16, 3, 5
    pad = 1 if k == 4 else k // 2
    x = _rand((bt, h, w_, c), seed=k)
    w = _rand((k, k, c, co), seed=k + 10) * 0.3
    bias = _rand((co,), seed=k + 20)
    xp = _pad_spatial(x, [(pad, pad), (pad, pad)],
                      mode if mode != "zeros" else "constant")
    want = jax.lax.conv_general_dilated(
        xp, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = f2d.from_f2d(
        f2d.conv_f2d(f2d.to_f2d(x, g), w, bias, g, pad, mode, stride), g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_spatial_ops_commute():
    """Upsample/resize are per-frame ops: applying them to the f2d form IS
    applying them per frame."""
    from c2m_tpu.ops.warp import resize_bilinear
    x = _rand((8, 6, 10, 3), seed=3)
    want = resize_bilinear(x, (12, 20), align_corners=False)
    got = f2d.from_f2d(
        resize_bilinear(f2d.to_f2d(x, 4), (12, 20), align_corners=False), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_batchnorm_view_exact_stats():
    import flax.linen as nn
    x = _rand((8, 6, 10, 4), seed=5)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = bn.init(jax.random.PRNGKey(0), x)
    want, st = bn.apply(v, x, mutable=["batch_stats"])
    xf = f2d.to_f2d(x, 4)
    got5, stf = bn.apply(v, f2d.norm_nd_f2d(xf, 4), mutable=["batch_stats"])
    got = f2d.from_f2d(f2d.denorm_nd_f2d(got5), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stf["batch_stats"]["mean"]),
        np.asarray(st["batch_stats"]["mean"]), atol=1e-6)


def test_instance_norm_f2d_exact():
    from c2m_tpu.nn.layers import InstanceNorm
    x = _rand((8, 6, 10, 4), seed=7)
    m = InstanceNorm()
    v = m.init(jax.random.PRNGKey(0), x)
    v = {"params": {"scale": _rand((4,), 1) + 2.0, "bias": _rand((4,), 2)}}
    want = m.apply(v, x)
    got = f2d.from_f2d(
        f2d.instance_norm_f2d(f2d.to_f2d(x, 4), 4, v["params"]["scale"],
                              v["params"]["bias"]), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
