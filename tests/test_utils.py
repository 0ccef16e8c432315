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


def test_multihost_bootstrap(monkeypatch):
    """setup_jax forms the global mesh from env (the torch.distributed.run
    analogue, reference src/train.py:141-159): explicit coordinator triple,
    guarded repeat calls, and a hard failure when triggered but broken."""
    import jax
    import c2m_tpu.utils.jax_setup as js

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setattr(js, "_DISTRIBUTED_DONE", False)

    # not triggered: no env -> no-op
    monkeypatch.delenv("C2M_MULTIHOST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert js.maybe_init_distributed() is False and calls == []

    # explicit coordinator triple (generic cluster)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    assert js.maybe_init_distributed() is True
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 2, "process_id": 1}]
    # repeat call: guarded no-op
    assert js.maybe_init_distributed() is True and len(calls) == 1

    # TPU-pod autodetect mode: C2M_MULTIHOST=1 alone
    monkeypatch.setattr(js, "_DISTRIBUTED_DONE", False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    monkeypatch.setenv("C2M_MULTIHOST", "1")
    assert js.maybe_init_distributed() is True
    assert calls[-1] == {"coordinator_address": None,
                         "num_processes": None, "process_id": None}

    # triggered but failing (not already-initialized) must raise
    monkeypatch.setattr(js, "_DISTRIBUTED_DONE", False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: (_ for _ in ()).throw(
                            RuntimeError("coordinator unreachable")))
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        js.maybe_init_distributed()

    # already-initialized by the host app: treated as success
    monkeypatch.setattr(js, "_DISTRIBUTED_DONE", False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: (_ for _ in ()).throw(
                            RuntimeError("already initialized")))
    assert js.maybe_init_distributed() is True


def test_loader_shards_follow_process_env(monkeypatch):
    """Two faked processes select disjoint, complete host shards — the exact
    indices the Trainer wires from jax.process_index()/process_count()
    (train/trainer.py:52-55)."""
    import jax
    from c2m_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    seen = {}
    for pid in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        dl = DataLoader(_DS(), batch_size=1, shuffle=False, drop_last=False,
                        host_id=jax.process_index(),
                        num_hosts=jax.process_count())
        seen[pid] = [int(b["x"][0, 0]) for b in dl]
    assert set(seen[0]).isdisjoint(set(seen[1]) - {0})  # only the wrap pad repeats
    # union covers the dataset; pad wraps index 0 onto the short host
    assert set(seen[0]) | set(seen[1]) == set(range(7))
    assert len(seen[0]) == len(seen[1]) == 4
