"""s2d model-block exactness + param-tree compatibility (nn/s2d_blocks.py).

Two properties matter:
1. Each s2d block EQUALS its plain counterpart given the same variables.
2. The param trees are identical (paths, shapes, AND init values) so
   checkpoints and optimizer labels are path-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c2m_tpu.nn import s2d
from c2m_tpu.nn import s2d_blocks as sb
from c2m_tpu.nn.layers import (Conv, Conv3d, SameBlock2d, SameBlock3d,
                               UpBlock2d, fold_time)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def _tree_paths(tree):
    return {"/".join(str(k.key) for k in path): v.shape
            for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_concat_split_s2d_roundtrip():
    a = s2d.to_s2d(_rand((2, 8, 12, 5), 1))
    b = s2d.to_s2d(_rand((2, 8, 12, 3), 2))
    cat = sb.concat_s2d([a, b])
    # equals to_s2d of the plain concat
    want = s2d.to_s2d(jnp.concatenate(
        [s2d.from_s2d(a), s2d.from_s2d(b)], axis=-1))
    np.testing.assert_array_equal(np.asarray(cat), np.asarray(want))
    a2, b2 = sb.split_s2d(cat, [5, 3])
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b))


@pytest.mark.parametrize("kt,pad_t", [(3, 1), (3, 0), (1, 0)])
def test_conv3d_s2d_single_exact(kt, pad_t):
    b, t, h, w_, c, co = 2, 6, 8, 12, 3, 4
    v = _rand((b, t, h, w_, c), seed=kt)
    plain = Conv3d(co, (kt, 3, 3), 1, (pad_t, 1, 1), "reflect")
    vars_ = plain.init(jax.random.PRNGKey(0), v)
    want = plain.apply(vars_, v)
    kernel = vars_["params"]["Conv_0"]["kernel"]
    bias = vars_["params"]["Conv_0"]["bias"]
    vs = s2d.to_s2d(v.reshape(b * t, h, w_, c)).reshape(
        b, t, h // 2, w_ // 2, 4 * c)
    got5 = sb.conv3d_s2d_single(vs, kernel, bias, kt, 3, pad_t, "reflect")
    t_out = got5.shape[1]
    got = s2d.from_s2d(got5.reshape(b * t_out, h // 2, w_ // 2, 4 * co)
                       ).reshape(b, t_out, h, w_, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_convs2d_param_tree_and_output_match_conv():
    x = _rand((2, 16, 24, 6), 3)
    plain = Conv(8, 3, 1, 1, "reflect")
    mod = sb.ConvS2d(8, 3, "reflect")
    vp = plain.init(jax.random.PRNGKey(7), x)
    vs = mod.init(jax.random.PRNGKey(7), s2d.to_s2d(x))
    assert _tree_paths(vp) == _tree_paths(vs)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(vp)[0],
            jax.tree_util.tree_flatten_with_path(vs)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), pa
    want = plain.apply(vp, x)
    got = s2d.from_s2d(mod.apply(vp, s2d.to_s2d(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_upblock_s2d_matches_plain():
    x = _rand((4, 8, 12, 6), 5)
    plain = UpBlock2d(8, 3, 1, 1, "reflect")
    mod = sb.UpBlock2dS2d(8, 3, "reflect")
    vp = plain.init(jax.random.PRNGKey(11), x, train=False)
    vs = mod.init(jax.random.PRNGKey(11), x, train=False)
    assert _tree_paths(vp) == _tree_paths(vs)
    want = plain.apply(vp, x, train=False)
    got = s2d.from_s2d(mod.apply(vp, x, train=False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # train mode: batch stats from the 5D view equal the plain stats
    want_t, wstats = plain.apply(vp, x, train=True,
                                 mutable=["batch_stats"])
    got_t, gstats = mod.apply(vp, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(s2d.from_s2d(got_t)),
                               np.asarray(want_t), atol=1e-5, rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(wstats)[0],
            jax.tree_util.tree_flatten_with_path(gstats)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_sameblock2d_s2d_matches_plain():
    x = _rand((3, 16, 24, 3), 9)
    plain = SameBlock2d(8, 7, 1, 3, padding_mode="reflect")
    mod = sb.SameBlock2dS2d(8, 7, "reflect")
    vp = plain.init(jax.random.PRNGKey(13), x)
    vs = mod.init(jax.random.PRNGKey(13), s2d.to_s2d(x))
    assert _tree_paths(vp) == _tree_paths(vs)
    want = plain.apply(vp, x)
    got = s2d.from_s2d(mod.apply(vp, s2d.to_s2d(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_downblock_s2din_matches_plain():
    from c2m_tpu.nn.layers import DownBlock2d
    x = _rand((3, 16, 24, 6), 21)
    plain = DownBlock2d(8, 4, 2, 1, "reflect")
    mod = sb.DownBlock2dS2dIn(8, "reflect")
    vp = plain.init(jax.random.PRNGKey(23), x, train=False)
    vs = mod.init(jax.random.PRNGKey(23), s2d.to_s2d(x), train=False)
    assert _tree_paths(vp) == _tree_paths(vs)
    want = plain.apply(vp, x, train=False)
    got = mod.apply(vp, s2d.to_s2d(x), train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sameblock3d_s2d_matches_plain():
    b, t, h, w_, c = 2, 5, 8, 12, 4
    v = _rand((b, t, h, w_, c), 15)
    plain = SameBlock3d(6, 3, 1, 1, padding_mode="reflect")
    mod = sb.SameBlock3dS2d(6, (3, 3, 3), 1, "reflect")
    vp = plain.init(jax.random.PRNGKey(17), v, train=False)
    vs_in = s2d.to_s2d(v.reshape(b * t, h, w_, c)).reshape(
        b, t, h // 2, w_ // 2, 4 * c)
    vs = mod.init(jax.random.PRNGKey(17), vs_in, train=False)
    assert _tree_paths(vp) == _tree_paths(vs)
    want = plain.apply(vp, v, train=False)
    got5 = mod.apply(vp, vs_in, train=False)
    got = s2d.from_s2d(got5.reshape(b * t, h // 2, w_ // 2, -1)
                       ).reshape(b, t, h, w_, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_upblock2d_auto_fused_path_matches_plain(monkeypatch):
    """UpBlock2d auto-routes through the fused upsample+conv at big output
    sizes (layers.py _upfuse_gate). Patch the gate open and check the fused
    route equals the plain route on the SAME variables — eval output, train
    output, and the BatchNorm batch stats."""
    x = _rand((3, 6, 10, 5), 17)
    blk = UpBlock2d(7, 3, 1, 1, "reflect")
    v = blk.init(jax.random.PRNGKey(2), x, train=False)  # gate off: plain
    want_e = blk.apply(v, x, train=False)
    want_t, wstats = blk.apply(v, x, train=True, mutable=["batch_stats"])

    monkeypatch.setattr(sb, "UPFUSE_MIN_PIXELS", 1)
    v2 = blk.init(jax.random.PRNGKey(2), x, train=False)  # fused route
    assert _tree_paths(v) == _tree_paths(v2)
    got_e = blk.apply(v, x, train=False)
    got_t, gstats = blk.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=1e-5, rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(wstats)[0],
            jax.tree_util.tree_flatten_with_path(gstats)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
