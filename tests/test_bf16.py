"""bf16 compute-tail parity: the whole train-mode objective computed with
train_params.dtype=bfloat16 (generator stack AND the loss tail — both
discriminators + the frozen VGG, train/model.py setup) must reproduce the
fp32 objective to bf16 round-off. Params/BN stats stay fp32 either way;
loss reductions accumulate fp32 (losses.py), so the loss VALUES keep their
precision even when the feature maps are bf16.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2m_tpu.config import tiny_config
from c2m_tpu.data.synthetic import make_batch
from c2m_tpu.train.model import C2MTrainModel
from c2m_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def cfg32():
    c = tiny_config(h=64, w=128, num_predicted=5, max_objects=4, batch_size=1)
    c.train_params.dtype = "float32"
    return c


@pytest.fixture(scope="module")
def batch(cfg32):
    return {k: jnp.asarray(v) for k, v in make_batch(cfg32, seed=3).items()}


def _losses(cfg, variables, batch, rng):
    model = C2MTrainModel(cfg)
    (out, loss_gen, ld_img, ld_vid), _ = model.apply(
        variables, batch, train=True, rngs={"sample": rng},
        mutable=["batch_stats", "spectral"])
    flat = dict(loss_gen)
    flat.update({f"d_image/{k}": v for k, v in ld_img.items()})
    flat.update({f"d_video/{k}": v for k, v in ld_vid.items()})
    return {k: float(v) for k, v in flat.items()}


def test_bf16_tail_matches_fp32(cfg32, batch):
    rng = jax.random.PRNGKey(0)
    model32 = C2MTrainModel(cfg32)
    state = create_train_state(cfg32, model32, rng, batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "spectral": state.spectral}

    cfg16 = copy.deepcopy(cfg32)
    cfg16.train_params.dtype = "bfloat16"

    sample = jax.random.PRNGKey(1)
    l32 = _losses(cfg32, variables, batch, sample)
    l16 = _losses(cfg16, variables, batch, sample)

    assert set(l16) == set(l32)
    for k, v32 in l32.items():
        v16 = l16[k]
        assert np.isfinite(v16), k
        # bf16 has ~3 decimal digits; after deep conv stacks + norms a
        # relative tolerance of ~15% (plus a small absolute floor for
        # near-zero regularizers) is the expected round-off envelope
        assert abs(v16 - v32) <= 0.15 * abs(v32) + 2e-2, (k, v32, v16)
