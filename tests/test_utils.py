"""Host-utility tests: flow colorization, HTML gallery, native region IoU,
FID math, checkpoint round-trip."""

import os

import numpy as np
import pytest


def test_flow_color_basic():
    from c2m_tpu.utils.flow_color import flow_to_color, flow_video_to_color
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:4, :, 0] = 5.0
    img = flow_to_color(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # zero flow saturates to white-ish (rad=0 -> col = 1 - 0 = 1)
    assert img[6, 6].min() > 200
    vid = flow_video_to_color(np.stack([flow, -flow]))
    assert vid.shape == (2, 8, 8, 3)
    # opposite flows get different hues
    assert np.abs(vid[0, 0, 0].astype(int) - vid[1, 0, 0].astype(int)).max() > 50


def test_html_gallery(tmp_path):
    from c2m_tpu.utils.html import HTMLGallery
    g = HTMLGallery(str(tmp_path), "t", refresh=1)
    g.add_header("epoch 1")
    g.add_images(["a.png"], ["gen"], ["a.png"])
    g.save()
    html = open(tmp_path / "index.html").read()
    assert "epoch 1" in html and "a.png" in html and "refresh" in html


def test_native_region():
    from c2m_tpu.native import polygon_iou, rect_iou, rect_iou_matrix
    assert abs(rect_iou((0, 0, 2, 2), (1, 1, 2, 2)) - 1 / 7) < 1e-9
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    assert abs(polygon_iou(sq, sq + 1.0) - 1 / 7) < 1e-9
    # clockwise input handled
    assert abs(polygon_iou(sq[::-1], sq + 1.0) - 1 / 7) < 1e-9
    m = rect_iou_matrix(np.array([[0, 0, 2, 2.]]),
                        np.array([[1, 1, 2, 2.], [0, 0, 2, 2.]]))
    np.testing.assert_allclose(m, [[1 / 7, 1.0]], atol=1e-9)


def test_fid_math():
    from c2m_tpu.eval.fid import compute_fid
    rng = np.random.RandomState(0)
    a = rng.randn(500, 16)
    # identical distributions -> ~0; shifted -> ~|shift|^2
    assert compute_fid(a, a.copy()) < 1e-6
    b = a + 3.0
    fid = compute_fid(a, b)
    assert abs(fid - 9.0 * 16) < 5.0


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from c2m_tpu.config import tiny_config
    from c2m_tpu.train.state import TrainState, build_optimizer
    from c2m_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from flax import core

    cfg = tiny_config()
    params = dict({"c2m": {"w": jnp.ones((3,))},
                              "netd_image": {"w": jnp.zeros((2,))}})
    tx = build_optimizer(cfg)
    state = TrainState(step=jnp.asarray(5), params=params,
                       opt_state=tx.init(params),
                       batch_stats={"c2m": {"m": jnp.ones((1,))}},
                       spectral={}, apply_fn=None, tx=tx)
    save_checkpoint(str(tmp_path), state, epoch=2, epoch_iter=7)
    blank = state.replace(step=jnp.asarray(0),
                          params=jax.tree.map(jnp.zeros_like, params))
    restored, epoch, it = load_checkpoint(str(tmp_path), blank)
    assert (epoch, it) == (2, 7)
    assert int(restored.step) == 5
    np.testing.assert_array_equal(np.asarray(restored.params["c2m"]["w"]),
                                  np.ones((3,)))
