"""End-to-end model smoke tests: init, forward, one train step, inference.

This is the minimum end-to-end slice of SURVEY.md §7 step 6 (64x128, batch 1,
GT-theta rasterization, preprocessed flows) plus the GAN heads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2m_tpu.config import tiny_config
from c2m_tpu.data.synthetic import make_batch
from c2m_tpu.train.model import C2MTrainModel
from c2m_tpu.train.state import create_train_state, param_labels
from c2m_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def cfg():
    c = tiny_config(h=64, w=128, num_predicted=5, max_objects=4, batch_size=1)
    c.train_params.dtype = "float32"
    return c


@pytest.fixture(scope="module")
def batch(cfg):
    return {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=3).items()}


@pytest.fixture(scope="module")
def state(cfg, batch):
    model = C2MTrainModel(cfg)
    return create_train_state(cfg, model, jax.random.PRNGKey(0), batch)


def test_param_groups(state):
    labels = param_labels(state.params)
    flat = set()
    import flax.traverse_util as tu
    for path, label in tu.flatten_dict(labels).items():
        flat.add(label)
    assert flat == {"gen", "gnn", "d_image", "d_video", "frozen"}


def test_forward_shapes(cfg, state, batch):
    tp = cfg.train_params
    h, w = tp.input_size
    b = tp.batch_size
    (out, loss_dict, ldi, ldv), _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats,
         "spectral": state.spectral},
        batch, train=True, rngs={"sample": jax.random.PRNGKey(1)},
        mutable=["batch_stats", "spectral"])
    tpred = tp.num_predicted_frames
    assert out["generated"].shape == (b, tpred, h, w, 3)
    assert out["dense_motion_bw"].shape == (b, tpred, h, w, 2)
    assert out["occlusion_bw"].shape == (b, tpred, h, w, 1)
    assert out["mu"].shape == (b, 1024)
    assert out["thetas"].shape[1:] == (4, tpred, 6)
    gen = np.asarray(out["generated"])
    assert gen.min() >= 0.0 and gen.max() <= 1.0
    for key in ("flow_reconstruction", "warped", "kl", "ssim", "reconstruction",
                "perceptual", "occlusion_bw", "translation", "scale",
                "rotation", "g_gan_image", "feature_matching_image",
                "g_gan_video", "feature_matching_video"):
        assert key in loss_dict, key
        assert np.isfinite(float(loss_dict[key])), key
    assert np.isfinite(float(ldi["d_real"])) and np.isfinite(float(ldv["d_fake"]))


def test_click_theta_clamped_to_gt(cfg, state, batch):
    """The clicked node's theta must equal GT exactly (the click contract)."""
    (out, *_), _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats,
         "spectral": state.spectral},
        batch, train=True, rngs={"sample": jax.random.PRNGKey(7)},
        mutable=["batch_stats", "spectral"])
    click = np.asarray(out["click_mask"])            # [B, N]
    thetas = np.asarray(out["thetas"])
    gt = np.asarray(batch["targets_theta"])
    for b in range(click.shape[0]):
        n = int(np.argmax(click[b]))
        assert click[b, n] == 1.0
        np.testing.assert_allclose(thetas[b, n], gt[b, n], atol=1e-6)


def test_train_step_updates_params(cfg, state, batch):
    step = make_train_step(cfg, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_gen"]))
    # gen params move
    k0 = jax.tree_util.tree_leaves(state.params["c2m"])[0]
    k1 = jax.tree_util.tree_leaves(new_state.params["c2m"])[0]
    assert not np.allclose(np.asarray(k0), np.asarray(k1))
    # frozen vgg params do not
    v0 = jax.tree_util.tree_leaves(state.params["vgg"])[0]
    v1 = jax.tree_util.tree_leaves(new_state.params["vgg"])[0]
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    # second step also works (donated buffers etc.)
    new_state2, metrics2 = step(new_state, batch, jax.random.PRNGKey(2))
    assert int(new_state2.step) == 2


def test_inference(cfg, state, batch):
    b = cfg.train_params.batch_size
    n = cfg.dataset_params.max_objects
    z_m = jax.random.normal(jax.random.PRNGKey(3), (b, 1024))
    click = jax.nn.one_hot(jnp.zeros((b,), jnp.int32), n)
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats,
         "spectral": state.spectral},
        batch, z_m, click, method="inference",
        rngs={"sample": jax.random.PRNGKey(4)})
    assert out["generated"].shape == (b, cfg.train_params.num_predicted_frames,
                                      *cfg.train_params.input_size, 3)
    assert np.isfinite(np.asarray(out["generated"])).all()


def test_decoder_without_appearance_consumes_every_fuse():
    """use_appearance_feature=False parity quirk: each up stage's input is
    the POST-FUSE tensor (reference motion_autoencoder.py:134-135
    ``up_input = out``). Regression for a stale-x bug where every non-last
    fuse output was dead code on this path: perturbing an early sparse
    pyramid level must change the decoder output."""
    from c2m_tpu.config import DenseMotionDecoderParams
    from c2m_tpu.models.dense_motion import DenseMotionDecoder

    p = DenseMotionDecoderParams(in_channel=8, out_channel=4,
                                 block_expansion=4, max_expansion=16,
                                 num_up_blocks=3,
                                 use_appearance_feature=False,
                                 use_feature_resample=False)
    dec = DenseMotionDecoder(p, 1, 2, sparse_down=3)
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.randn(1, 2, 2, 2, 8).astype(np.float32))
    sm = jnp.asarray(rs.randn(1, 2, 32, 32, 2).astype(np.float32))
    so = jnp.asarray(rs.randn(1, 2, 32, 32, 1).astype(np.float32))
    sp = {f"enco_sparse_{m}": jnp.asarray(
        rs.randn(1, 2, 32 // 2 ** (m + 1), 32 // 2 ** (m + 1),
                 4 * 2 ** m).astype(np.float32)) for m in range(3)}
    variables = dec.init(jax.random.PRNGKey(0), {}, sp, sm, so, z,
                         train=False)
    out0 = dec.apply(variables, {}, sp, sm, so, z, train=False)
    # perturb the FIRST consumed (non-last) fuse level
    sp2 = dict(sp)
    sp2["enco_sparse_2"] = sp["enco_sparse_2"] + 1.0
    out1 = dec.apply(variables, {}, sp2, sm, so, z, train=False)
    d = np.abs(np.asarray(out1["dense_motion"]) -
               np.asarray(out0["dense_motion"])).max()
    assert np.isfinite(np.asarray(out0["dense_motion"])).all()
    assert d > 1e-6, "early fuse output is dead — stale up-stage input"
