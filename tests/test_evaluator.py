"""Evaluator metric tests: detection F1/accuracy parity with the reference's
sklearn-over-paired-lists semantics (src/evaluator/evaluator.py:295-298), and
end-to-end finite FID/FVD through converted (random-init, clearly synthetic)
Inception/I3D weights (VERDICT r1 #5/#6)."""

import numpy as np
import pytest

import jax

from c2m_tpu.config import tiny_config
from c2m_tpu.eval.evaluator import Evaluator


def _mini_batch(b=4, h=64, w=128, t=6, n_max=4, tpred=5):
    rng = np.random.RandomState(0)
    batch = {
        "video": rng.rand(b, t, h, w, 3).astype(np.float32),
        "targets_theta": np.tile(
            np.array([1, 0, 0, 0, 1, 0], np.float32), (b, n_max, tpred, 1)),
        "node_mask": np.zeros((b, n_max), bool),
        "num_real_nodes": np.ones((b,), np.int32),
        "nodes_x": np.zeros((b, n_max, 23), np.float32),
        "rois_target_last": np.zeros((b, n_max, 4), np.float32),
    }
    batch["node_mask"][:, 0] = True
    batch["rois_target_last"][:, 0] = [20, 10, 60, 40]  # x1 y1 x2 y2
    return batch


def _mini_out(b=4, h=64, w=128, n_max=4, tpred=5):
    rng = np.random.RandomState(1)
    return {
        "generated": rng.rand(b, tpred, h, w, 3).astype(np.float32),
        "thetas": np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32),
                          (b, n_max, tpred, 1)),
        "click_mask": np.eye(b, n_max, dtype=np.float32) * 0
        + np.eye(1, n_max, dtype=np.float32),  # click node 0 everywhere
    }


def _evaluator(tmp_path, detector=None):
    cfg = tiny_config(h=64, w=128, num_predicted=5, max_objects=4,
                      batch_size=4)
    return Evaluator(cfg, model=None, variables=None,
                     job_dir=str(tmp_path), detector=detector)


def test_detection_f1_accuracy_sklearn_parity(tmp_path):
    """gt found on clips 0/1/3, pred found on clips 0/3 -> paired lists
    gt=[1,1,1], pred=[1,1]+pad[0]; sklearn f1=0.8, accuracy=2/3."""
    hit = np.array([19, 9, 61, 41, 0.9, 0.9, 2.0], np.float32)
    calls = {"n": 0}

    def detector(images):
        calls["n"] += 1
        if calls["n"] == 1:                      # GT frames
            return [[hit], [hit], None, [hit]]
        return [[hit], None, [hit], [hit]]       # generated frames

    ev = _evaluator(tmp_path, detector=detector)
    batch, out = _mini_batch(), _mini_out()
    ev.fetch_metrics_data(batch, out)
    results = ev.generate_metrics()

    from sklearn.metrics import accuracy_score, f1_score
    assert results["detection_f1"] == pytest.approx(
        f1_score([1, 1, 1], [1, 1, 0]))
    assert results["detection_accuracy"] == pytest.approx(
        accuracy_score([1, 1, 1], [1, 1, 0]))
    assert results["gt_detection"] == 3
    assert results["pred_detection"] == 2
    assert results["detection_mse"] >= 0.0
    path = ev.write_metrics(results)
    text = open(path).read()
    assert "detection_f1" in text and "detection_accuracy" in text


def test_fid_fvd_finite_with_converted_random_weights(tmp_path, monkeypatch):
    """Random-init torch Inception/I3D -> converters -> Evaluator produces
    finite fid/fvd (weights clearly random; proves the plumbing end-to-end)."""
    torch = pytest.importorskip("torch")
    from tests.torch_i3d import I3DTrunk
    from tests.torch_inception import InceptionV3Trunk
    from tools.convert_i3d import convert as convert_i3d
    from tools.convert_inception import convert as convert_inception

    torch.manual_seed(0)
    p, s = convert_inception(InceptionV3Trunk().state_dict())
    inc_path = tmp_path / "inception_rand.npz"
    np.savez(inc_path, params=np.asarray(p, dtype=object),
             batch_stats=np.asarray(s, dtype=object))
    p, s = convert_i3d(I3DTrunk().state_dict())
    i3d_path = tmp_path / "i3d_rand.npz"
    np.savez(i3d_path, params=np.asarray(p, dtype=object),
             batch_stats=np.asarray(s, dtype=object))
    monkeypatch.setenv("INCEPTION_WEIGHTS", str(inc_path))
    monkeypatch.setenv("I3D_WEIGHTS", str(i3d_path))

    ev = _evaluator(tmp_path)
    ev.detector = None
    batch, out = _mini_batch(b=2), _mini_out(b=2)
    ev.fetch_metrics_data(batch, out)
    results = ev.generate_metrics()
    assert np.isfinite(results["fid"]), results
    assert np.isfinite(results["fvd"]), results
    assert np.isfinite(results["trajectory_mse_theta"])
