"""upfirdn2d / bias_act / get_edges / labels parity checks."""

import numpy as np
import jax.numpy as jnp

from c2m_tpu.ops.splat import get_edges
from c2m_tpu.ops.upfirdn import bias_act, upfirdn2d
from c2m_tpu.data.labels import THING_TRAINIDS, id_to_trainid


def test_upfirdn_identity():
    x = np.random.RandomState(0).randn(1, 6, 8, 3).astype(np.float32)
    k = np.zeros((1, 1), np.float32); k[0, 0] = 1.0
    y = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k)))
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_upfirdn_updown():
    x = np.ones((1, 4, 4, 2), np.float32)
    k = np.ones((2, 2), np.float32) / 4.0
    y = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=2, down=2,
                             pad=(1, 0)))
    assert y.shape == (1, 4, 4, 2)


def test_bias_act():
    x = jnp.asarray([-1.0, 1.0])
    y = np.asarray(bias_act(x, act="lrelu"))
    np.testing.assert_allclose(y, [-0.2 * 2 ** 0.5, 2 ** 0.5], atol=1e-6)
    y = np.asarray(bias_act(x, bias=jnp.asarray(1.0), act="relu", clamp=2.0))
    np.testing.assert_allclose(y, [0.0, 2.0], atol=1e-6)


def test_get_edges():
    inst = np.zeros((1, 8, 8, 1), np.float32)
    inst[0, 2:5, 2:5, 0] = 7
    e = np.asarray(get_edges(jnp.asarray(inst)))[0, ..., 0]
    assert e[2, 2] == 1.0 and e[3, 3] == 0.0 and e[0, 0] == 0.0


def test_labels():
    assert THING_TRAINIDS == (11, 12, 13, 14, 15, 16, 17, 18)
    arr = np.array([[7, 26, 0]], np.uint8)
    np.testing.assert_array_equal(id_to_trainid(arr), [[0, 13, 255]])
