"""Serving artifact round-trip: export -> load from disk -> outputs equal the
direct model.apply. No model code is needed at load time (StableHLO only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from c2m_tpu import serving
from c2m_tpu.config import shrink_model, tiny_config
from c2m_tpu.data.synthetic import make_batch


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = shrink_model(tiny_config(h=64, w=128, num_predicted=5,
                                   max_objects=4, batch_size=2))
    from c2m_tpu.models.c2m import C2MGenerator
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    out_dir = str(tmp_path_factory.mktemp("artifact"))
    serving.export_artifact(out_dir, cfg, variables, batch_sizes=(1, 2),
                            platforms=("cpu",))
    return cfg, model, dict(variables), batch, out_dir


def test_roundtrip_matches_direct_apply(setup):
    cfg, model, variables, batch, out_dir = setup
    served = serving.ServingModel(out_dir)
    b = batch["video"].shape[0]
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(1),
                                     (b, serving.z_dim(cfg))))
    click = np.eye(cfg.dataset_params.max_objects, dtype=np.float32)[:b] * 0
    rng = jax.random.PRNGKey(2)

    got = served({k: np.asarray(v) for k, v in batch.items()}, z, click, rng)
    # golden = the JITTED apply: the exported StableHLO reproduces the jitted
    # program exactly; eager op-by-op apply differs at bf16 rounding level
    # (different fusion), which is not what serving replaces
    want = jax.jit(lambda v, bt, zz, ck, r: model.apply(
        v, bt, zz, ck, cfg.test_params.use_gt_eval, method="inference",
        rngs={"sample": r}))(variables, batch, jnp.asarray(z),
                             jnp.asarray(click), rng)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            atol=2e-5, rtol=2e-5, err_msg=k)


def test_bucket_padding(setup):
    cfg, model, variables, batch, out_dir = setup
    served = serving.ServingModel(out_dir)
    # 1-element request lands in the b=1 bucket exactly
    assert served.bucket_for(1) == 1
    assert served.bucket_for(2) == 2
    with pytest.raises(ValueError):
        served.bucket_for(3)

    one = {k: np.asarray(v)[:1] for k, v in batch.items()}
    z = np.zeros((1, serving.z_dim(cfg)), np.float32)
    click = np.zeros((1, cfg.dataset_params.max_objects), np.float32)
    out = served(one, z, click, jax.random.PRNGKey(0))
    assert out["generated"].shape[0] == 1
    assert np.isfinite(np.asarray(out["generated"], np.float32)).all()

    # output filter: only the requested keys are fetched/returned
    sel = served(one, z, click, jax.random.PRNGKey(0),
                 outputs=("generated",))
    assert set(sel) == {"generated"}
    np.testing.assert_array_equal(np.asarray(sel["generated"], np.float32),
                                  np.asarray(out["generated"], np.float32))
    with pytest.raises(KeyError):
        served(one, z, click, jax.random.PRNGKey(0), outputs=("nope",))


def test_variables_roundtrip(tmp_path):
    tree = {"params": {"a": {"w": np.ones((2, 3), np.float32)},
                       "b": np.arange(4, dtype=np.int32)},
            "batch_stats": {"a": {"mean": np.zeros(3, jnp.bfloat16)}}}
    path = str(tmp_path / "v.npz")
    serving._save_variables(path, tree)
    back = serving._load_variables(path)
    assert back["params"]["a"]["w"].dtype == np.float32
    assert back["batch_stats"]["a"]["mean"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(back["params"]["b"], tree["params"]["b"])
