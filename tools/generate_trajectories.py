#!/usr/bin/env python
"""Object trajectory generation: instance extraction -> SiamRPN++ tracking ->
instance re-matching -> per-object trajectory txts.

Consolidates the reference's three-stage glue
(trajectory_generation_scripts/{generate_json,test,generate_trajectory}_cityscapes.py)
into one CLI with the same semantics:

- clips: consecutive 30-frame groups per city dir; the first 9 frames are the
  tracked window (generate_json_cityscapes.py:17-33, generate_trajectory:205)
- objects: instance ids > 1000 in the first frame's *_gtFine_instanceIds.png,
  rows >= 800 (full-res 1024) zeroed (ego-vehicle hood, :83-85)
- tracking: SiamRPN++ per object; a track is dropped when best_score < 0.95
  or the bbox degenerates (test_cityscapes.py:99-105)
- matching: per frame, tracked bbox vs instance masks — class must match and
  bbox must cover >= 0.8 of the mask; best candidate by coverage
  (generate_trajectory:153-181); only full 9-frame tracks are kept
- output: <out>/<city>/<stem>_<iid>.txt with "x,y,w,h,iid" per frame in
  full-res coordinates — exactly what the training loader consumes
  (c2m_tpu/data/cityscapes.py load_scene_nodes).

Weights: --weights npz from tools/convert_siamrpn.py; random init tracks are
garbage (clearly warned).
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIP_LEN = 30
TRACK_LEN = 9
SCORE_THRESH = 0.95
COVER_THRESH = 0.8
HOOD_ROW_FRAC = 800 / 1024  # rows below this fraction are zeroed


def list_clips(images_root):
    clips = []
    for city in sorted(os.listdir(images_root)):
        frames = sorted(os.listdir(os.path.join(images_root, city)))
        for j in range(len(frames) // CLIP_LEN):
            clip = [os.path.join(images_root, city, f)
                    for f in frames[j * CLIP_LEN:(j + 1) * CLIP_LEN]]
            clips.append((city, clip[:TRACK_LEN]))
    return clips


def instance_path(instance_root, city, image_path, instance_suffix):
    name = os.path.basename(image_path).replace("leftImg8bit.png",
                                                instance_suffix)
    return os.path.join(instance_root, city, name)


def extract_instances(inst_file):
    """[(mask, bbox(x,y,w,h), cls, iid)] from an instance map."""
    arr = np.array(Image.open(inst_file))
    if arr.ndim == 3:
        arr = arr[..., 0]
    arr = arr.copy()
    arr[int(arr.shape[0] * HOOD_ROW_FRAC):] = 0
    out = []
    for iid in np.unique(arr):
        if iid <= 1000:
            continue
        mask = (arr == iid).astype(np.float32)
        ys, xs = np.nonzero(mask)
        tx = xs.max() - xs.min()
        ty = ys.max() - ys.min()
        if tx > 0 and ty > 0:
            out.append((mask, [float(xs.min()), float(ys.min()),
                               float(tx), float(ty)], int(iid) // 1000,
                        int(iid)))
    return out


def bbox_covers(mask_src, bbox_tgt):
    h, w = mask_src.shape
    x, y, tw, th = bbox_tgt
    cover = np.zeros_like(mask_src)
    cover[max(int(y), 0):max(int(y + th), 0),
          max(int(x), 0):max(int(x + tw), 0)] = 1
    denom = mask_src.sum()
    return float((cover * mask_src).sum() / denom) if denom else 0.0


def match_instance(instances, bbox_tgt, cls_tgt, cover_thresh=COVER_THRESH):
    """generate_trajectory:153-181 — best coverage >= 0.8 with class match."""
    best_idx, best = -1, (cover_thresh, -1.0)
    for i, (mask, bbox, cls, _) in enumerate(instances):
        if cls != cls_tgt or not np.all(np.array(bbox[2:]) > 0):
            continue
        cov = bbox_covers(mask, bbox_tgt)
        if cov >= cover_thresh:
            area = cov * mask.sum()
            if (cov, area) > best:
                best, best_idx = (cov, area), i
    return best_idx


def track_clip(frames, inst_lists, make_tracker, score_thresh=SCORE_THRESH,
               cover_thresh=COVER_THRESH, track_len=TRACK_LEN):
    """Track every first-frame instance through the clip and re-match.

    The testable core of the reference's three-stage glue
    (trajectory_generation_scripts/test_cityscapes.py:99-105 +
    generate_trajectory_cityscapes.py:121-260):
    - a track dies when best_score < score_thresh or the bbox degenerates;
    - each tracked bbox is re-matched to the frame's instances (class match +
      coverage >= cover_thresh, best by (coverage, area)); the MATCHED
      instance bbox/iid is what gets written, not the raw tracker box;
    - only complete track_len-frame tracks are kept (9-frame rule).

    frames: list of HxWx3 uint8 arrays; inst_lists: per-frame
    ``extract_instances`` output; make_tracker: (frame, bbox) -> object with
    ``.track(frame) -> {"best_score", "bbox"}``.
    Returns {iid: [row_str, ...]} with "x,y,w,h,iid" rows.
    """
    tracks = {}
    for mask, bbox, cls, iid in inst_lists[0]:
        tracker = make_tracker(frames[0], bbox)
        boxes = [bbox]
        ok = True
        for f in range(1, track_len):
            out = tracker.track(frames[f])
            if out["best_score"] < score_thresh or \
                    np.all(np.array(out["bbox"]) <= 0):
                ok = False
                break
            boxes.append(out["bbox"])
        if not ok:
            continue
        rows = [f"{','.join(f'{v}' for v in bbox)},{iid}"]
        for f in range(1, track_len):
            idx = match_instance(inst_lists[f], boxes[f], cls, cover_thresh)
            if idx < 0:
                ok = False
                break
            m_bbox = inst_lists[f][idx][1]
            m_iid = inst_lists[f][idx][3]
            rows.append(f"{','.join(f'{v}' for v in m_bbox)},{m_iid}")
        if ok and len(rows) == track_len:
            tracks[iid] = rows
    return tracks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-root", required=True,
                    help="full-res leftImg8bit sequence dir (one subdir per city)")
    ap.add_argument("--instance-root", required=True)
    ap.add_argument("--instance-suffix", default="gtFine_instanceIds.png")
    ap.add_argument("--out", required=True, help="tracking txt output root")
    ap.add_argument("--weights", default=None, help="SiamRPN++ weights npz")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--score-thresh", type=float, default=SCORE_THRESH,
                    help="track-kill threshold (reference 0.95, "
                         "test_cityscapes.py:99-105); relax only for "
                         "random-init smoke runs")
    ap.add_argument("--cover-thresh", type=float, default=COVER_THRESH,
                    help="instance-matching coverage (reference 0.8, "
                         "generate_trajectory_cityscapes.py:153-181)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from c2m_tpu.models.siamrpn import SiamRPNpp, SiamRPNTracker

    model = SiamRPNpp()
    probe_t = jnp.zeros((1, 127, 127, 3))
    probe_s = jnp.zeros((1, 255, 255, 3))
    variables = model.init(jax.random.PRNGKey(0), probe_t, probe_s)
    if args.weights:
        data = np.load(args.weights, allow_pickle=True)
        variables = {"params": data["params"].item(),
                     "batch_stats": data["batch_stats"].item()}
    else:
        print("WARNING: random-init tracker — convert pysot weights for real use")

    clips = list_clips(args.images_root)
    if args.limit:
        clips = clips[:args.limit]
    kept = 0
    for ci, (city, clip) in enumerate(clips):
        inst_lists = [extract_instances(
            instance_path(args.instance_root, city, p, args.instance_suffix))
            for p in clip]
        frames = [np.array(Image.open(p).convert("RGB")) for p in clip]
        stem = os.path.basename(clip[0])[:-16]  # strip _leftImg8bit.png

        def make_tracker(frame0, bbox):
            tracker = SiamRPNTracker(model, variables)
            tracker.init(frame0, bbox)
            return tracker

        tracks = track_clip(frames, inst_lists, make_tracker,
                            score_thresh=args.score_thresh,
                            cover_thresh=args.cover_thresh)
        for iid, rows in tracks.items():
            out_dir = os.path.join(args.out, city)
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, f"{stem}_{iid}.txt"), "w") as fh:
                fh.write("\n".join(rows))
            kept += 1
        print(f"[{ci + 1}/{len(clips)}] {stem}: kept so far {kept}", flush=True)


if __name__ == "__main__":
    main()
