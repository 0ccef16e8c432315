"""s2d full-res tail (train_params.s2d_tail) parity at the model level.

The 512x1024 long-horizon hot path pays a 4x lane-padding tax on its
full-res C<=32 tensors; s2d_tail runs the decoder's final_up/final_fuse/
heads and the generator's entry/exit segments on the space-to-depth form
(nn/s2d_blocks.py — measured 2.4x at that size, tools/bench_s2d.py). These
tests pin:

- identical parameter trees between s2d and plain modes (checkpoints
  transfer both ways);
- eval-mode outputs/losses EQUAL the plain path;
- composition with scan_frames (the long-horizon train configuration).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c2m_tpu.config import Config
from c2m_tpu.data.synthetic import make_batch
from c2m_tpu.train.model import C2MTrainModel
from c2m_tpu.train.state import create_train_state
from c2m_tpu.train.step import make_eval_step, make_train_step

HEAVY = os.environ.get("C2M_HEAVY_TESTS") == "1"


def _cfg(s2d: bool, scan: int = 0) -> Config:
    cfg = Config()
    cfg.dataset_params.dataset = "synthetic"
    cfg.dataset_params.max_objects = 6
    cfg.train_params.input_size = [64, 128]
    cfg.train_params.num_predicted_frames = 4
    cfg.train_params.batch_size = 2
    cfg.train_params.dtype = "float32"
    cfg.train_params.s2d_tail = s2d
    cfg.train_params.scan_frames = scan
    cfg.train_params.remat = True
    cfg.test_params.input_size = [64, 128]
    cfg.test_params.num_predicted_frames = 4
    return cfg.validate()


@pytest.fixture(scope="module")
def states():
    cfg0, cfg1 = _cfg(False), _cfg(True)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg0, seed=0).items()}
    key = jax.random.PRNGKey(0)
    s0 = create_train_state(cfg0, C2MTrainModel(cfg0), key, batch)
    s1 = create_train_state(cfg1, C2MTrainModel(cfg1), key, batch)
    return cfg0, cfg1, batch, s0, s1


def test_param_trees_identical(states):
    _, _, _, s0, s1 = states
    import jax.tree_util as jtu
    k0 = [(jtu.keystr(k), v.shape)
          for k, v in jtu.tree_leaves_with_path(s0.params)]
    k1 = [(jtu.keystr(k), v.shape)
          for k, v in jtu.tree_leaves_with_path(s1.params)]
    assert k0 == k1
    # init VALUES are identical too (path-keyed param RNG)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(s0.params),
                              jtu.tree_leaves_with_path(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_losses_and_frames_match_plain(states):
    cfg0, cfg1, batch, s0, s1 = states
    s1v = s1.replace(params=s0.params, batch_stats=s0.batch_stats,
                     spectral=s0.spectral)
    rng = jax.random.PRNGKey(7)
    out0, ld0 = make_eval_step(cfg0)(s0, batch, rng)
    out1, ld1 = make_eval_step(cfg1)(s1v, batch, rng)
    assert set(ld0) == set(ld1)
    for k in ld0:
        np.testing.assert_allclose(float(ld1[k]), float(ld0[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    # 2e-5: the fused up-conv (nn/s2d.fused_up_conv) folds the bilinear
    # upsample into the conv kernel — mathematically exact, but the fp32
    # summation order differs from the sequential upsample+conv
    np.testing.assert_allclose(np.asarray(out1["generated"]),
                               np.asarray(out0["generated"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1["dense_motion_bw"]),
                               np.asarray(out0["dense_motion_bw"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out1["occlusion_bw"]),
                               np.asarray(out0["occlusion_bw"]), atol=2e-5)


def test_s2d_composes_with_scan_frames(states):
    """The long-horizon train configuration: scan_frames + s2d_tail together.
    Eval-mode must still equal the plain folded path."""
    cfg0, _, batch, s0, _ = states
    cfg_sc = _cfg(True, scan=2)
    key = jax.random.PRNGKey(0)
    s_sc = create_train_state(cfg_sc, C2MTrainModel(cfg_sc), key, batch)
    s_scv = s_sc.replace(params=s0.params, batch_stats=s0.batch_stats,
                         spectral=s0.spectral)
    rng = jax.random.PRNGKey(7)
    out0, ld0 = make_eval_step(cfg0)(s0, batch, rng)
    out1, ld1 = make_eval_step(cfg_sc)(s_scv, batch, rng)
    for k in ld0:
        np.testing.assert_allclose(float(ld1[k]), float(ld0[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(out1["generated"]),
                               np.asarray(out0["generated"]), atol=1e-5)


def test_s2d_pyramid_stages_match_plain(states, monkeypatch):
    """The decoder's fused UP-STAGE path (UpBlock2dS2d with the
    upsample-folded conv kernel + exact phase-mean half-resize, gated by
    upfuse_auto at the 2x-upsampled size) equals the plain path. At 64x128
    the gate is normally off — compute the plain baseline first, then patch
    the gate open so every fuse stage takes the fused path (the gate is
    size-automatic since round 3, no longer keyed on s2d_tail)."""
    from c2m_tpu.nn import s2d_blocks
    cfg0, cfg1, batch, s0, _ = states
    key = jax.random.PRNGKey(0)
    s1 = create_train_state(cfg1, C2MTrainModel(cfg1), key, batch)
    s1v = s1.replace(params=s0.params, batch_stats=s0.batch_stats,
                     spectral=s0.spectral)
    rng = jax.random.PRNGKey(7)
    out0, ld0 = make_eval_step(cfg0)(s0, batch, rng)  # gate off: plain path
    monkeypatch.setattr(s2d_blocks, "UPFUSE_MIN_PIXELS", 1)
    out1, ld1 = make_eval_step(cfg1)(s1v, batch, rng)
    for k in ld0:
        np.testing.assert_allclose(float(ld1[k]), float(ld0[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(out1["generated"]),
                               np.asarray(out0["generated"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["dense_motion_bw"]),
                               np.asarray(out0["dense_motion_bw"]), atol=1e-4)


@pytest.mark.skipif(not HEAVY, reason="set C2M_HEAVY_TESTS=1")
def test_train_step_s2d_runs_close_to_plain(states):
    cfg0, cfg1, batch, s0, s1 = states
    rng = jax.random.PRNGKey(3)
    _, m0 = make_train_step(cfg0, donate=False)(s0, batch, rng)
    _, m1 = make_train_step(cfg1, donate=False)(s1, batch, rng)
    t0, t1 = float(m0["total_gen"]), float(m1["total_gen"])
    assert np.isfinite(t1)
    # train-mode BN stats over the 5D phase view are exact, so the step
    # objective should match the plain path tightly
    assert abs(t1 - t0) / (1.0 + abs(t0)) < 0.01, (t0, t1)
