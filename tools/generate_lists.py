#!/usr/bin/env python
"""Build datalists from the tracking output directory.

Reference: src/generate_lists.py:14-18 — one line per clip that has at least
one tracked object, named by the clip's first frame.

  python tools/generate_lists.py --tracking-root <dir> --out cityscapes_train.txt
"""

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracking-root", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    names = sorted(set(
        "/".join(path.split("/")[-2:]).rsplit("_", 1)[0] + "_leftImg8bit.png"
        for path in glob.glob(os.path.join(args.tracking_root, "*", "*.txt"))))
    with open(args.out, "w") as f:
        f.write("\n".join(names))
    print(f"wrote {len(names)} entries to {args.out}")


if __name__ == "__main__":
    main()
