#!/usr/bin/env python
"""Convert KITTI-360 semantic/instance rasters to cityscapes-trainId maps.

Reference: src/kitti2cityscapes_semantic.py — the KITTI-360 label table
(ids 34-44 extend the cityscapes ids: garage->building(2), gate->fence(4),
smallpole->pole(5), the rest ignore; data/labels.py
KITTI360_ID_TO_TRAINID) and the conversion driver (:118-149). Writes the
`train_semantic_segmask/` + `train_instance/` trees the resize step
(tools/preprocess_images.py) and the Kitti dataset then consume
(src/datasets/kitti.py:271-306).

Parity quirks kept deliberately:
- thing pixels (trainId 11..18, the hardcoded thing_list :121) renumber as
  ``trainId * 1000 + (instance % (semantic_id * 1000))`` — the modulo
  divisor is the SEMANTIC id (:144), exact for KITTI-360's
  ``semanticId*1000 + k`` instance encoding;
- non-thing pixels write the bare trainId into the instance raster (:146);
- ids absent from the table keep 0 in the semantic output (the reference
  composites per-label masks onto ``zeros_like`` :138);
- the FIRST path component under ``leftImg8bit_sequence`` is dropped on
  output (the reference splits its absolute path at fixed depth,
  :127-129): ``<seq>/<d1>/<d2>/<d3>/semantic/f.png`` ->
  ``<seq>/train_semantic_segmask/<d2>/<d3>/image_02/data/f.png``.

Usage:
  python tools/kitti2cityscapes_semantic.py --root <dataset_root> \
      [--glob '*/*/*/semantic/*.png'] [--out <dir>]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from c2m_tpu.data.labels import KITTI360_ID_TO_TRAINID  # noqa: E402

LABEL_DIVISOR = 1000
# the reference's hardcoded thing trainIds (:121), NOT the hasInstances col
THING_TRAINIDS = frozenset(range(11, 19))


def _luts():
    """(trainId LUT, is-thing LUT, modulo-divisor LUT) over semantic ids."""
    tid = np.zeros(256, np.uint8)          # unmapped ids keep 0 (quirk)
    thing = np.zeros(256, bool)
    div = np.ones(256, np.int64)
    for lid, t in KITTI360_ID_TO_TRAINID.items():
        tid[lid] = t
        if t in THING_TRAINIDS:
            thing[lid] = True
            div[lid] = lid * LABEL_DIVISOR
    return tid, thing, div


def convert_pair(semantic: np.ndarray, instance: np.ndarray):
    """One (semantic, instance) raster pair -> (trainId map, instance map).

    Vectorized equivalent of the reference's per-label mask loop
    (src/kitti2cityscapes_semantic.py:138-146).
    """
    tid_lut, thing_lut, div_lut = _luts()
    sem = np.asarray(semantic)
    inst = np.asarray(instance).astype(np.int64)
    new_sem = tid_lut[sem].astype(sem.dtype, copy=False)
    tid = tid_lut[sem].astype(np.int32)
    renum = (tid.astype(np.int64) * LABEL_DIVISOR
             + inst % div_lut[sem]).astype(np.int32)
    new_inst = np.where(thing_lut[sem], renum, tid)
    return new_sem, new_inst


def convert_tree(root: Path, glob: str, out: Path | None = None) -> int:
    from PIL import Image

    seq = root / "leftImg8bit_sequence"
    if not seq.is_dir():
        raise SystemExit(f"{seq} not found")
    out = out or seq
    files = sorted(seq.glob(glob))
    if not files:
        raise SystemExit(f"no semantic pngs under {seq}/{glob}")
    n = 0
    for sem_f in files:
        inst_f = Path(str(sem_f).replace("semantic", "instance"))
        rel = sem_f.relative_to(seq)
        # drop the first dir + the trailing 'semantic' dir (reference
        # path-depth parity; see module docstring)
        mid = rel.parts[1:-2]
        sem_dir = out / "train_semantic_segmask" / Path(*mid) / "image_02" / "data"
        inst_dir = out / "train_instance" / Path(*mid) / "image_02" / "data"
        sem_dir.mkdir(parents=True, exist_ok=True)
        inst_dir.mkdir(parents=True, exist_ok=True)
        semantic = np.array(Image.open(sem_f))
        instance = np.array(Image.open(inst_f))
        new_sem, new_inst = convert_pair(semantic, instance)
        Image.fromarray(new_sem).save(sem_dir / sem_f.name)
        Image.fromarray(new_inst, mode="I").save(inst_dir / inst_f.name)
        n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", required=True,
                    help="dataset root containing leftImg8bit_sequence/")
    ap.add_argument("--glob", default="*/*/*/semantic/*.png",
                    help="semantic-png glob under leftImg8bit_sequence/")
    ap.add_argument("--out", default=None,
                    help="output base (default: leftImg8bit_sequence/)")
    args = ap.parse_args(argv)
    n = convert_tree(Path(args.root), args.glob,
                     Path(args.out) if args.out else None)
    print(f"converted {n} semantic/instance pairs")


if __name__ == "__main__":
    main()
