"""Cityscapes evaluator parity tests: hand-computed IoU/iIoU/AP on crafted
label maps, pinning the benchmark rules of
cityscapesScripts/evaluation/evalPixelLevelSemanticLabeling.py and
evalInstanceLevelSemanticLabeling.py (see c2m_tpu/eval/cityscapes_eval.py
docstrings for the rule-by-rule citations). Pure numpy — no jax."""

import json
import math

import numpy as np
import pytest

from c2m_tpu.eval import cityscapes_eval as ce

A_CAR = ce.AVG_INSTANCE_SIZE["car"]


def _pixel_fixture():
    """4x4 crafted pair. gt: one void px, 7 road px, 8 car px.
    pred: road everywhere except a 2x2 correct car corner and one bicycle."""
    gt = np.full((4, 4), 7, np.uint8)
    gt[0, 0] = 0                      # void (unlabeled)
    gt[2:, :] = 26                    # car
    pred = np.full((4, 4), 7, np.uint8)
    pred[2:, 2:] = 26
    pred[3, 0] = 33                   # bicycle
    return pred, gt


def test_pixel_level_class_and_category_iou():
    pred, gt = _pixel_fixture()
    res = ce.evaluate_pixel_level([(pred, gt)])
    cs = res["classScores"]
    # road: tp=7, fn=0, fp=3 (car px predicted road; the void row never
    # contributes fp)
    assert cs["road"] == pytest.approx(7 / 10)
    assert cs["car"] == pytest.approx(4 / 8)
    # bicycle appears only as a wrong prediction: fp=1 -> IoU 0, not NaN
    assert cs["bicycle"] == 0.0
    assert math.isnan(cs["person"]) and math.isnan(cs["sky"])
    assert res["averageScoreClasses"] == pytest.approx(
        (7 / 10 + 0.5 + 0.0) / 3)
    cat = res["categoryScores"]
    assert cat["flat"] == pytest.approx(7 / 10)
    # vehicle: tp = conf[26,26]+conf[26,33] (both ids in-category) = 5,
    # fn = 8-5, fp = 0
    assert cat["vehicle"] == pytest.approx(5 / 8)
    assert math.isnan(cat["human"])
    assert res["averageScoreCategories"] == pytest.approx(
        (7 / 10 + 5 / 8) / 2)


def test_pixel_level_instance_weighted_iiou():
    pred, gt = _pixel_fixture()
    inst = gt.astype(np.int32).copy()
    inst[2:, :3] = 26001              # 6-px car instance, 2 px predicted car
    inst[2:, 3:] = 26002              # 2-px car instance, fully correct
    res = ce.evaluate_pixel_level([(pred, gt)], instance_gts=[inst])
    # weights avg/6 and avg/2: tpw = 2A/6+2A/2 = 4A/3, fnw = 4A/6 = 2A/3
    # -> 2/3, strictly above the unweighted 0.5 because the small instance
    # is perfect and weighs 3x the big one per pixel
    assert res["classInstScores"]["car"] == pytest.approx(2 / 3)
    # bicycle: zero weighted tp/fn but 1 fp pixel -> 0.0
    assert res["classInstScores"]["bicycle"] == 0.0
    assert math.isnan(res["classInstScores"]["person"])
    # category vehicle: the bicycle px lies in the category mask ->
    # catTp = 3*A/6 + 2*A/2 = 3A/2, catFn = A/2, fp = 0
    assert res["categoryInstScores"]["vehicle"] == pytest.approx(3 / 4)
    assert math.isnan(res["categoryInstScores"]["human"])
    assert res["averageScoreInstClasses"] == pytest.approx((2 / 3 + 0.0) / 2)


def test_confusion_matrix_rejects_trainids():
    gt = np.zeros((2, 2), np.uint8)
    gt[0, 0] = 255                    # trainId ignore value, not a label id
    with pytest.raises(ValueError, match="unknown gt"):
        ce.confusion_matrix(np.zeros((2, 2), np.uint8), gt)
    with pytest.raises(ValueError, match="unknown predicted"):
        ce.confusion_matrix(np.full((2, 2), 200, np.uint8),
                            np.zeros((2, 2), np.uint8))


def _square_pred(h, w, rows, cols, label_id=26, conf=0.9):
    mask = np.zeros((h, w), bool)
    mask[rows, cols] = True
    return {"mask": mask, "label_id": label_id, "confidence": conf}


def test_instance_ap_perfect_match():
    gt = np.full((20, 20), 7, np.int32)
    gt[:10, :10] = 26001              # 100 px >= minRegionSize
    pred = _square_pred(20, 20, slice(0, 10), slice(0, 10))
    res = ce.evaluate_instance_level([gt], [[pred]])
    assert res["classes"]["car"]["ap"] == pytest.approx(1.0)
    assert res["allAp"] == pytest.approx(1.0)      # other classes all NaN
    assert res["allAp50%"] == pytest.approx(1.0)


def test_instance_ap_partial_overlap_steps_at_iou():
    gt = np.full((20, 20), 7, np.int32)
    gt[:10, :10] = 26001
    pred = _square_pred(20, 20, slice(0, 10), slice(0, 8))   # IoU 0.8
    res = ce.evaluate_instance_level([gt], [[pred]])
    # matched (AP 1) for the 6 thresholds strictly below 0.8, a hard FN +
    # an un-ignored FP (AP 0) at 0.8 and above
    assert res["classes"]["car"]["ap"] == pytest.approx(0.6)
    assert res["classes"]["car"]["ap50%"] == pytest.approx(1.0)
    assert res["allAp"] == pytest.approx(0.6)


def test_instance_ap_duplicate_group_and_void_rules():
    # image A: two identical-mask predictions on one gt -> the weaker is an
    # FP at full recall, which the step integration prices at AP 1.0
    a = np.full((20, 20), 7, np.int32)
    a[:10, :10] = 26001
    preds_a = [_square_pred(20, 20, slice(0, 10), slice(0, 10), conf=0.9),
               _square_pred(20, 20, slice(0, 10), slice(0, 10), conf=0.5)]
    # image B: a car *group* region (bare id < 1000) and a void region;
    # predictions covered by either are ignored, not false positives
    b = np.full((20, 20), 7, np.int32)
    b[:10, :] = 26                    # group
    b[10:, :] = 4                     # static -> void
    preds_b = [_square_pred(20, 20, slice(0, 10), slice(0, 10), conf=0.8),
               _square_pred(20, 20, slice(10, 20), slice(0, 10), conf=0.7)]
    res = ce.evaluate_instance_level([a, b], [preds_a, preds_b])
    assert res["classes"]["car"]["ap"] == pytest.approx(1.0)
    assert res["allAp"] == pytest.approx(1.0)


def test_instance_ap_small_gt_is_ignore_region():
    # one scorable gt + one sub-minRegionSize gt; the prediction sitting on
    # the small one is ignored (not FP), the missed big one is a hard FN
    gt = np.full((20, 20), 7, np.int32)
    gt[:10, :10] = 26001              # 100 px, scorable
    gt[15:18, 15:18] = 26002          # 9 px < 100 -> filtered
    pred_small = _square_pred(20, 20, slice(15, 18), slice(15, 18), conf=0.9)
    res = ce.evaluate_instance_level([gt], [[pred_small]])
    # no scored prediction survives, but gt exists -> AP 0, not NaN
    assert res["classes"]["car"]["ap"] == 0.0
    assert res["allAp"] == 0.0


def test_instance_ap_no_gt_is_nan_not_zero():
    gt = np.full((20, 20), 7, np.int32)   # no car instances anywhere
    res = ce.evaluate_instance_level([gt], [[]])
    assert math.isnan(res["classes"]["car"]["ap"])
    assert math.isnan(res["allAp"])


def test_cli_end_to_end(tmp_path):
    """Both CLI modes over the upstream on-disk conventions."""
    from PIL import Image
    import importlib
    evaluate_cityscapes = importlib.import_module("tools.evaluate_cityscapes")

    gt_dir = tmp_path / "gtFine" / "val" / "city"
    pred_dir = tmp_path / "results"
    gt_dir.mkdir(parents=True)
    pred_dir.mkdir()
    pred, gt = _pixel_fixture()
    inst = gt.astype(np.int32).copy()
    inst[2:, :3], inst[2:, 3:] = 26001, 26002
    stem = "city_000000_000019"
    Image.fromarray(gt).save(gt_dir / f"{stem}_gtFine_labelIds.png")
    Image.fromarray(inst).save(gt_dir / f"{stem}_gtFine_instanceIds.png")
    Image.fromarray(pred).save(pred_dir / f"{stem}_pred.png")

    out = tmp_path / "pixel.json"
    rc = evaluate_cityscapes.main([
        "pixel", "--gt-dir", str(tmp_path / "gtFine"),
        "--pred-dir", str(pred_dir), "--out", str(out)])
    assert rc == 0
    res = json.loads(out.read_text())
    assert res["classScores"]["car"] == pytest.approx(0.5)
    assert res["classInstScores"]["car"] == pytest.approx(2 / 3)

    # instance mode: 20x20 image, one perfect car prediction
    gt20 = np.full((20, 20), 7, np.int32)
    gt20[:10, :10] = 26001
    stem2 = "city_000001_000019"
    Image.fromarray(gt20).save(gt_dir / f"{stem2}_gtFine_instanceIds.png")
    mask = np.zeros((20, 20), np.uint8)
    mask[:10, :10] = 255
    Image.fromarray(mask).save(pred_dir / f"{stem2}_mask0.png")
    (pred_dir / f"{stem2}_pred.txt").write_text(
        f"{stem2}_mask0.png 26 0.9\n")
    # keep pixel-mode gt out of the instance glob: move to its own tree
    inst_gt_dir = tmp_path / "inst_gt"
    inst_gt_dir.mkdir()
    Image.fromarray(gt20).save(
        inst_gt_dir / f"{stem2}_gtFine_instanceIds.png")
    out2 = tmp_path / "inst.json"
    rc = evaluate_cityscapes.main([
        "instance", "--gt-dir", str(inst_gt_dir),
        "--pred-dir", str(pred_dir), "--out", str(out2)])
    assert rc == 0
    res2 = json.loads(out2.read_text())
    assert res2["allAp"] == pytest.approx(1.0)
    assert res2["classes"]["car"]["ap50%"] == pytest.approx(1.0)
