"""Panoptic-DeepLab structure + post-processing tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2m_tpu.models.panoptic_deeplab import LABEL_DIVISOR, postprocess


def test_postprocess_groups_instances():
    h, w = 32, 48
    semantic = np.zeros((h, w, 19), np.float32)
    semantic[..., 0] = 5.0                      # road everywhere
    semantic[4:12, 6:18, 13] = 10.0             # car blob A
    semantic[20:28, 30:42, 13] = 10.0           # car blob B
    center = np.zeros((h, w, 1), np.float32)
    center[8, 12, 0] = 1.0                      # center A
    center[24, 36, 0] = 1.0                     # center B
    offset = np.zeros((h, w, 2), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    # pixels of blob A vote for center A, blob B for center B
    offset[..., 0] = np.where(yy < 16, 8 - yy, 24 - yy)
    offset[..., 1] = np.where(yy < 16, 12 - xx, 36 - xx)

    sem, inst = postprocess(semantic, center, offset)
    assert sem[8, 12] == 13 and sem[0, 0] == 0
    a = inst[8, 12]
    b = inst[24, 36]
    assert a != 0 and b != 0 and a != b
    assert a // LABEL_DIVISOR == 13 and b // LABEL_DIVISOR == 13
    assert np.all(inst[sem == 0] == 0)
    # each blob uniformly labeled
    assert len(np.unique(inst[4:12, 6:18])) == 1
    assert len(np.unique(inst[20:28, 30:42])) == 1


def test_postprocess_no_centers():
    semantic = np.zeros((16, 16, 19), np.float32)
    semantic[..., 2] = 1.0
    sem, inst = postprocess(semantic, np.zeros((16, 16, 1), np.float32),
                            np.zeros((16, 16, 2), np.float32))
    assert np.all(inst == 0)


@pytest.mark.skipif(not os.environ.get("C2M_HEAVY_TESTS"),
                    reason="HRNet-48 init heavy on 1-core CPU")
def test_panoptic_model_shapes():
    from c2m_tpu.models.panoptic_deeplab import PanopticDeepLab
    model = PanopticDeepLab()
    x = jnp.zeros((1, 128, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["semantic"].shape == (1, 128, 256, 19)
    assert out["center"].shape == (1, 128, 256, 1)
    assert out["offset"].shape == (1, 128, 256, 2)
