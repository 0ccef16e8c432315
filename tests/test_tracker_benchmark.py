"""Tracker OPE metric tests with a fake tracker."""

import numpy as np

from c2m_tpu.eval.tracker_benchmark import (evaluate_tracker, precision_curve,
                                            success_curve)


class PerfectTracker:
    def __init__(self, gt):
        self.gt = gt
        self.i = 0

    def init(self, img, bbox):
        self.i = 0

    def track(self, img):
        self.i += 1
        return {"bbox": self.gt[self.i], "best_score": 1.0}


def test_perfect_tracker_scores_one():
    gt = [[10 + i, 20, 30, 40] for i in range(5)]
    frames = [np.zeros((64, 64, 3), np.uint8)] * 5
    res = evaluate_tracker(PerfectTracker(gt), [{"frames": frames, "gt": gt}])
    assert res["precision@20"] == 1.0
    assert res["success_auc"] > 0.95


def test_curves_shapes():
    pred = [[0, 0, 10, 10], [5, 5, 10, 10]]
    gt = [[0, 0, 10, 10], [0, 0, 10, 10]]
    sc = success_curve(pred, gt)
    pc = precision_curve(pred, gt)
    assert sc[0] == 1.0 and sc[-1] <= 0.5
    assert pc[-1] == 1.0
