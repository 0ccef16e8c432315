"""SiamRPN++ tracker host-logic tests (anchors, subwindow crop, xcorr)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2m_tpu.models.siamrpn import (TrackConfig, generate_anchors,
                                    get_subwindow, xcorr_depthwise)


def test_anchor_grid():
    cfg = TrackConfig()
    score_size = (cfg.instance_size - cfg.exemplar_size) // cfg.stride + 1 + cfg.base_size
    assert score_size == 25
    anchors = generate_anchors(cfg, score_size)
    assert anchors.shape == (5 * 25 * 25, 4)
    # centers span the strided grid around 0
    assert anchors[:, 0].min() == -(25 // 2) * 8
    assert anchors[:, 0].max() == (25 // 2) * 8
    # each ratio block has constant w/h
    block = 25 * 25
    for a in range(5):
        w = anchors[a * block:(a + 1) * block, 2]
        h = anchors[a * block:(a + 1) * block, 3]
        assert len(np.unique(w)) == 1 and len(np.unique(h)) == 1


def test_get_subwindow_padding():
    img = np.zeros((50, 60, 3), np.uint8)
    img[:, :, 0] = 100
    avg = img.mean(axis=(0, 1))
    # crop centered near the corner -> needs padding, filled with channel avg
    patch = get_subwindow(img, (2.0, 2.0), model_sz=32, original_sz=32,
                          avg_chans=avg)
    assert patch.shape == (32, 32, 3)
    assert abs(patch[0, 0, 0] - avg[0]) < 1.0     # padded corner
    assert patch[-1, -1, 0] == 100                 # interior
    # no-pad crop returns exact pixels
    patch2 = get_subwindow(img, (30.0, 25.0), model_sz=16, original_sz=16,
                           avg_chans=avg)
    assert np.all(patch2[..., 0] == 100)


def test_xcorr_depthwise_matches_manual():
    rng = np.random.RandomState(0)
    s = rng.randn(2, 9, 9, 4).astype(np.float32)
    k = rng.randn(2, 3, 3, 4).astype(np.float32)
    out = np.asarray(xcorr_depthwise(jnp.asarray(s), jnp.asarray(k)))
    assert out.shape == (2, 7, 7, 4)
    for b in range(2):
        for c in range(4):
            for y in range(7):
                for x in range(7):
                    ref = np.sum(s[b, y:y + 3, x:x + 3, c] * k[b, :, :, c])
                    assert abs(out[b, y, x, c] - ref) < 1e-4


@pytest.mark.skipif(not os.environ.get("C2M_HEAVY_TESTS"),
                    reason="ResNet-50 init heavy on 1-core CPU")
def test_siamrpn_model_shapes():
    from c2m_tpu.models.siamrpn import SiamRPNpp
    model = SiamRPNpp()
    zt = jnp.zeros((1, 127, 127, 3))
    xt = jnp.zeros((1, 255, 255, 3))
    variables = model.init(jax.random.PRNGKey(0), zt, xt)
    cls, loc = model.apply(variables, zt, xt)
    assert cls.shape == (1, 25, 25, 10)
    assert loc.shape == (1, 25, 25, 20)
