"""Every shipped YAML config parses into the typed schema and carries the
settings the driver configs name (BASELINE.json: 128x256 journal training,
KITTI clips, 512x1024 long-horizon). The KITTI config must key the
generator's warped-image branch off dataset_params.dataset (reference:
src/modules/generator.py KITTI path; src/datasets/dataset.py:6,28-29)."""

import glob
import os

import jax
import pytest

from c2m_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_parses(path):
    cfg = Config.from_yaml(path)
    h, w = cfg.train_params.input_size
    assert h % 64 == 0 and w % 64 == 0  # 6 stride-2 stages in the encoders
    assert cfg.dataset_params.dataset in ("cityscapes", "kitti", "mvtid",
                                          "synthetic")
    lw = cfg.train_params.loss_weights
    for k in ("reconstruction", "kl", "perceptual", "g_gan_image"):
        assert hasattr(lw, k)


def test_kitti_config_enables_generator_branch():
    from c2m_tpu.models.c2m import C2MGenerator
    cfg = Config.from_yaml(os.path.join(REPO, "configs", "c2m_kitti.yaml"))
    assert cfg.dataset_params.dataset == "kitti"
    assert cfg.train_params.input_size == (128, 256) or \
        tuple(cfg.train_params.input_size) == (128, 256)

    # Build the generator from the config with no explicit dataset kwarg:
    # the KITTI warped-image encoder branch must come up (its params exist).
    from c2m_tpu.data.synthetic import make_batch
    import jax.numpy as jnp

    cfg.train_params.input_size = (64, 128)  # keep the init cheap
    cfg.test_params.input_size = (64, 128)
    cfg.dataset_params.max_objects = 4
    cfg.train_params.batch_size = 1
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=1, seed=0).items()}
    variables = jax.eval_shape(
        lambda b: model.init({"params": jax.random.PRNGKey(0),
                              "sample": jax.random.PRNGKey(1)}, b,
                             train=False), batch)
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    # the KITTI warped-image encoder branch (first_warped/down_warped_*)
    assert any("first_warped" in n for n in names), sorted(names)[:20]


def test_journal_config_matches_reference_operating_point():
    cfg = Config.from_yaml(
        os.path.join(REPO, "configs", "c2m_journal_cityscapes.yaml"))
    assert tuple(cfg.train_params.input_size) == (128, 256)
    assert cfg.train_params.batch_size == 3
    assert cfg.test_params.batch_size == 12
    assert cfg.train_params.num_predicted_frames == 5
    assert cfg.test_params.use_gt_eval is True


def test_long_horizon_config_fits_single_chip_settings():
    cfg = Config.from_yaml(
        os.path.join(REPO, "configs", "c2m_long_horizon.yaml"))
    assert tuple(cfg.train_params.input_size) == (512, 1024)
    assert cfg.train_params.num_predicted_frames == 10
    # The settings that make the train step fit 15.75 GB HBM (STATUS round 3)
    assert cfg.train_params.remat is True
    assert cfg.train_params.scan_frames == 2
    assert cfg.train_params.s2d_tail is True
