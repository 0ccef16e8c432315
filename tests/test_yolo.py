"""YOLOv3 structure + NMS + darknet-loader coverage tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2m_tpu.eval.yolov3 import non_max_suppression


def test_nms_basic():
    pred = np.zeros((4, 85), np.float32)
    # two overlapping boxes of the same class, one below conf threshold,
    # one separate box of another class
    pred[0] = [50, 50, 20, 20, 0.9] + [0] * 80
    pred[0, 5] = 0.9
    pred[1] = [52, 52, 20, 20, 0.8] + [0] * 80
    pred[1, 5] = 0.8
    pred[2] = [50, 50, 20, 20, 0.3] + [0] * 80   # below threshold
    pred[3] = [200, 200, 30, 30, 0.7] + [0] * 80
    pred[3, 7] = 0.95
    out = non_max_suppression(pred, conf_thresh=0.5, nms_thresh=0.4)
    assert out is not None and len(out) == 2
    classes = sorted(int(r[6]) for r in out)
    assert classes == [0, 2]


def test_nms_empty():
    pred = np.zeros((3, 85), np.float32)
    assert non_max_suppression(pred) is None


@pytest.mark.skipif(not os.environ.get("C2M_HEAVY_TESTS"),
                    reason="YOLOv3 init heavy on 1-core CPU")
def test_darknet_loader_exact_coverage(tmp_path):
    """A synthetic blob sized from the architecture must load with every
    float consumed exactly once and land in the right-shaped slots."""
    from c2m_tpu.eval.yolov3 import YoloV3, _conv_block_order, load_darknet_weights
    model = YoloV3()
    x = jnp.zeros((1, 416, 416, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # size the blob by walking the declared order
    total = 0
    import flax.traverse_util as tu
    flat = tu.flatten_dict(variables["params"])
    for scope, has_bn in _conv_block_order():
        key = (*scope, "Conv_0", "kernel") if has_bn else (*scope, "kernel")
        kh, kw, ci, co = flat[key].shape
        total += co * (4 if has_bn else 1) + co * ci * kh * kw
    blob = np.arange(total, dtype=np.float32)
    path = tmp_path / "fake.weights"
    with open(path, "wb") as f:
        np.zeros(5, np.int32).tofile(f)
        blob.tofile(f)
    loaded = load_darknet_weights(variables, str(path))
    # the first backbone conv's bn bias gets the first 32 floats
    bn = loaded["params"]["backbone"]["ConvBL_0"]["BatchNorm_0"]
    np.testing.assert_array_equal(bn["bias"], np.arange(32, dtype=np.float32))
