"""Trajectory generation logic on crafted data (VERDICT r2 #7).

Pins the reference's thresholds and matching semantics
(trajectory_generation_scripts/test_cityscapes.py:99-105,
generate_trajectory_cityscapes.py:121-260) as implemented by
tools/generate_trajectories.py, with a scripted tracker so no SiamRPN
weights are involved: the score<0.95 kill rule, the class-matched
IoU-coverage>=0.8 instance matching, and the 9-frame completeness rule,
down to the expected txt rows.
"""

import numpy as np

from tools.generate_trajectories import (COVER_THRESH, SCORE_THRESH,
                                         TRACK_LEN, extract_instances,
                                         match_instance, track_clip)


def _write_instance_map(tmp_path, arr, name="map.png"):
    from PIL import Image
    p = tmp_path / name
    Image.fromarray(arr.astype(np.int32), mode="I").save(p)
    return str(p)


def _square_map(h, w, boxes):
    """boxes: [(iid, x, y, bw, bh)] painted in order (later wins)."""
    arr = np.zeros((h, w), np.int32)
    for iid, x, y, bw, bh in boxes:
        arr[y:y + bh, x:x + bw] = iid
    return arr


class ScriptedTracker:
    """Returns a pre-scripted (score, bbox) per frame."""

    def __init__(self, script):
        self.script = list(script)
        self.i = 0

    def track(self, frame):
        score, bbox = self.script[self.i]
        self.i += 1
        return {"best_score": score, "bbox": bbox}


def _frame_instances(h, w, boxes):
    """[(mask, bbox, cls, iid)] in extract_instances' format."""
    out = []
    for iid, x, y, bw, bh in boxes:
        mask = np.zeros((h, w), np.float32)
        mask[y:y + bh, x:x + bw] = 1.0
        # extract_instances-style bbox: x, y, xmax-xmin, ymax-ymin
        out.append((mask, [float(x), float(y), float(bw - 1), float(bh - 1)],
                    iid // 1000, iid))
    return out


def test_reference_thresholds():
    # the constants ARE the reference's (test_cityscapes.py:99,
    # generate_trajectory_cityscapes.py:169, :205)
    assert SCORE_THRESH == 0.95
    assert COVER_THRESH == 0.8
    assert TRACK_LEN == 9


def test_extract_instances_filters_and_hood(tmp_path):
    h, w = 64, 128
    arr = _square_map(h, w, [(26001, 10, 10, 20, 12),   # car instance
                             (24, 40, 10, 10, 10),      # raw class id <= 1000
                             (25002, 5, 55, 30, 8)])    # in the hood band
    path = _write_instance_map(tmp_path, arr)
    inst = extract_instances(path)
    # 25002 starts at row 55 >= 64*800/1024 = 50 -> fully zeroed; 24 filtered
    assert [iid for (_, _, _, iid) in inst] == [26001]
    mask, bbox, cls, iid = inst[0]
    assert cls == 26
    assert bbox == [10.0, 10.0, 19.0, 11.0]  # xmax-xmin, ymax-ymin
    assert mask.sum() == 20 * 12


def test_match_instance_class_and_coverage():
    h, w = 64, 128
    frame = _frame_instances(h, w, [(26001, 10, 10, 20, 12),
                                    (24001, 60, 10, 20, 12)])
    # exact box over the car -> coverage 1.0, class 26 matches
    assert match_instance(frame, [10, 10, 20, 12], 26) == 0
    # class mismatch (person vs the car's position) -> no match
    assert match_instance(frame, [10, 10, 20, 12], 25) == -1
    # covering box < 80% of the mask -> dropped
    assert match_instance(frame, [10, 10, 10, 12], 26) == -1
    # 80%+ coverage passes (16/20 columns = 0.8)
    assert match_instance(frame, [10, 10, 16, 12], 26) == 0
    # two same-class candidates: best (coverage, area) wins
    frame2 = _frame_instances(h, w, [(26001, 10, 10, 8, 8),
                                     (26002, 30, 10, 20, 12)])
    assert match_instance(frame2, [28, 8, 24, 16], 26) == 1


def test_track_clip_score_kill_and_completeness():
    h, w = 64, 128
    # object drifts right 2 px/frame; instance maps follow it
    inst_lists = [_frame_instances(h, w, [(26001, 10 + 2 * f, 10, 20, 12)])
                  for f in range(TRACK_LEN)]
    frames = [np.zeros((h, w, 3), np.uint8)] * TRACK_LEN

    def good_script(frame0, bbox):
        return ScriptedTracker([(0.99, [10 + 2 * f, 10, 20, 12])
                                for f in range(1, TRACK_LEN)])

    tracks = track_clip(frames, inst_lists, good_script)
    assert set(tracks) == {26001}
    rows = tracks[26001]
    assert len(rows) == TRACK_LEN
    # row 0 is the seed instance bbox; later rows are the MATCHED instance
    # bboxes (not the tracker output), formatted x,y,w,h,iid
    assert rows[0] == "10.0,10.0,19.0,11.0,26001"
    assert rows[3] == "16.0,10.0,19.0,11.0,26001"
    for r in rows:
        parts = r.split(",")
        assert len(parts) == 5 and parts[-1] == "26001"

    # score dips below 0.95 at frame 4 -> track dropped entirely
    def dipping_script(frame0, bbox):
        scripts = [(0.99, [10 + 2 * f, 10, 20, 12])
                   for f in range(1, TRACK_LEN)]
        scripts[3] = (0.9499, scripts[3][1])
        return ScriptedTracker(scripts)

    assert track_clip(frames, inst_lists, dipping_script) == {}

    # degenerate bbox -> dropped
    def degenerate_script(frame0, bbox):
        scripts = [(0.99, [10 + 2 * f, 10, 20, 12])
                   for f in range(1, TRACK_LEN)]
        scripts[5] = (0.99, [0, 0, 0, 0])
        return ScriptedTracker(scripts)

    assert track_clip(frames, inst_lists, degenerate_script) == {}

    # instance vanishes at frame 6 -> match fails -> 9-frame rule drops it
    maps_vanish = [list(fr) for fr in inst_lists]
    maps_vanish[6] = []
    assert track_clip(frames, maps_vanish, good_script) == {}


def test_track_clip_rematch_follows_instance_id_switches():
    """The matched iid per frame is written even when it differs from the
    seed (the reference writes the per-frame matched instance,
    generate_trajectory_cityscapes.py:204-260)."""
    h, w = 64, 128
    inst_lists = []
    for f in range(TRACK_LEN):
        iid = 26001 if f < 5 else 26002   # id switches mid-track
        inst_lists.append(_frame_instances(h, w, [(iid, 10, 10, 20, 12)]))
    frames = [np.zeros((h, w, 3), np.uint8)] * TRACK_LEN

    def steady(frame0, bbox):
        return ScriptedTracker([(0.99, [10, 10, 20, 12])] * (TRACK_LEN - 1))

    tracks = track_clip(frames, inst_lists, steady)
    rows = tracks[26001]
    assert rows[4].endswith(",26001")
    assert rows[5].endswith(",26002")
