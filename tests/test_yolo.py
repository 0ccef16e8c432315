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


def test_detect_cli_geometry():
    """pad_to_square_resize/rescale_boxes invert each other (the reference
    detect.py pad->resize->rescale_boxes chain, yolo_v3/utils/utils.py)."""
    from tools.yolo_detect import pad_to_square_resize, rescale_boxes
    img = np.random.RandomState(0).rand(100, 160, 3).astype(np.float32)
    x, geom = pad_to_square_resize(img, 64)
    assert x.shape == (64, 64, 3) and geom == ((160 - 100) // 2, 0, 160)
    # a box spanning the full original image maps to the padded band rows
    model_box = np.array([[0.0, 64 * 30 / 160, 64.0, 64 * 130 / 160]])
    back = rescale_boxes(model_box, geom, 64)
    np.testing.assert_allclose(back, [[0, 0, 160, 100]], atol=1e-6)


def test_detect_cli_end_to_end(tmp_path):
    """The standalone CLI runs a (random-init) YoloV3 over a folder and
    writes per-image txt + annotated png (reference detect.py contract)."""
    import subprocess
    import sys
    import jax
    from PIL import Image
    from c2m_tpu.eval.yolov3 import YoloV3

    model = YoloV3()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 96, 3)), train=False)
    np.savez(tmp_path / "w.npz",
             params=np.asarray(variables["params"], dtype=object),
             batch_stats=np.asarray(variables["batch_stats"], dtype=object))
    src = tmp_path / "imgs"
    src.mkdir()
    Image.fromarray(np.full((40, 60, 3), 128, np.uint8)).save(src / "a.png")
    out = tmp_path / "out"
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/yolo_detect.py", "--image-folder", str(src),
         "--weights", str(tmp_path / "w.npz"), "--img-size", "96",
         "--out", str(out)], cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "a.txt").exists() and (out / "a.png").exists()


def test_preprocess_mvtid_layout(tmp_path):
    """MVTID resize driver: six (split x kind) jobs, size-suffixed dirs,
    BICUBIC frames / NEAREST maps (reference src/preprocess_mvtid.py:63-75)."""
    from PIL import Image
    from tools.preprocess_mvtid import enumerate_tasks, run

    root = tmp_path
    for split in ("train", "val"):
        for sub, fname in (("leftImg8bit_sequence", "f_000001.jpg"),
                           ("segmasks", "f_000001_gtFine_labelIds.png"),
                           ("instances", "f_000001_gtFine_instanceIds.png")):
            d = root / sub / split / "seq0"
            d.mkdir(parents=True, exist_ok=True)
            arr = np.zeros((32, 64, 3), np.uint8)
            arr[:16] = 200  # top half bright: survives NEAREST exactly
            img = Image.fromarray(arr if fname.endswith(".jpg")
                                  else arr[..., 0])
            img.save(d / fname)

    tasks = enumerate_tasks(str(root), 16, 32)
    assert len(tasks) == 6
    modes = {t[2] for t in tasks}
    assert modes == {"bicubic", "nearest"}
    n = run(str(root), 16, 32, workers=2)
    assert n == 6
    out = root / "leftImg8bit_sequence_16x32" / "train" / "seq0" / "f_000001.jpg"
    assert out.exists()
    lab = np.asarray(Image.open(
        root / "segmasks_16x32" / "val" / "seq0" /
        "f_000001_gtFine_labelIds.png"))
    assert lab.shape == (16, 32)
    assert set(np.unique(lab)) == {0, 200}  # NEAREST: no new label values
