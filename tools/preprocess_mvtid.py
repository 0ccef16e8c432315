#!/usr/bin/env python
"""MVTID dataset resize driver (reference: src/preprocess_mvtid.py:19-86).

Enumerates the reference's six fixed jobs — {train,val} x {frames (*.jpg,
BICUBIC), label maps (*_gtFine_labelIds.png, NEAREST), instance maps
(*_gtFine_instanceIds.png, NEAREST)} — from the MVTID layout
``<dataroot>/{leftImg8bit_sequence,segmasks,instances}/<split>/<seq>/...``
into size-suffixed copies ``leftImg8bit_sequence_<H>x<W>/...`` etc.
(the directory names dataset.py's MVTID loader consumes). The generic
single-directory resizer is tools/preprocess_images.py; this is the layout
glue the reference keeps in a separate script.

  python tools/preprocess_mvtid.py --dataroot <dir> --height 64 --width 128
"""

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor

from PIL import Image

# (source subdir, filename glob, destination prefix, resample mode)
JOBS = [
    ("leftImg8bit_sequence", "*.jpg", "leftImg8bit_sequence", "bicubic"),
    ("segmasks", "*_gtFine_labelIds.png", "segmasks", "nearest"),
    ("instances", "*_gtFine_instanceIds.png", "instances", "nearest"),
]
SPLITS = ("train", "val")


def enumerate_tasks(dataroot: str, height: int, width: int):
    """Yield (src, dst, resample) for every file of every job; destination
    keeps the reference's ``<prefix>_<H>x<W>/<split>/<seq>/<file>`` shape."""
    tasks = []
    for split in SPLITS:
        for subdir, pattern, prefix, resample in JOBS:
            src_root = os.path.join(dataroot, subdir, split)
            dst_root = os.path.join(dataroot, f"{prefix}_{height}x{width}",
                                    split)
            for src in sorted(glob.glob(os.path.join(src_root, "*", pattern))):
                seq = os.path.basename(os.path.dirname(src))
                dst = os.path.join(dst_root, seq, os.path.basename(src))
                tasks.append((src, dst, resample))
    return tasks


def run(dataroot: str, height: int, width: int, workers: int = 6) -> int:
    tasks = enumerate_tasks(dataroot, height, width)

    def work(t):
        src, dst, resample = t
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        mode = Image.BICUBIC if resample == "bicubic" else Image.NEAREST
        Image.open(src).resize((width, height), mode).save(dst)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(work, tasks))
    return len(tasks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--workers", type=int, default=6)
    args = ap.parse_args()
    n = run(args.dataroot, args.height, args.width, args.workers)
    print(f"resized {n} files under {args.dataroot}")


if __name__ == "__main__":
    main()
