#!/usr/bin/env python
"""Resize/copy raw frames + maps to the training resolution.

Reference: src/preprocess_city.py:11-78 — threaded resize of
leftImg8bit_sequence frames (BICUBIC) and semantic/instance maps (NEAREST) to
256x128-style training copies.

  python tools/preprocess_images.py --src <dir> --dst <dir> --height 128 \
      --width 256 [--nearest] [--workers 6]
"""

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--nearest", action="store_true",
                    help="NEAREST resampling (label/instance maps)")
    ap.add_argument("--workers", type=int, default=6)
    args = ap.parse_args()

    tasks = []
    for root, _, files in os.walk(args.src):
        for f in sorted(files):
            if f.endswith(".png") or f.endswith(".jpg"):
                src = os.path.join(root, f)
                dst = os.path.join(args.dst, os.path.relpath(src, args.src))
                tasks.append((src, dst))

    resample = Image.NEAREST if args.nearest else Image.BICUBIC

    def work(pair):
        src, dst = pair
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        Image.open(src).resize((args.width, args.height), resample).save(dst)

    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        list(pool.map(work, tasks))
    print(f"resized {len(tasks)} files -> {args.dst}")


if __name__ == "__main__":
    main()
