#!/usr/bin/env python
"""Semantic + instance map generation with Panoptic-DeepLab (HRNet-48).

Reference: panoptic_deeplab/tools/generate_segmentation.py:133-306 — runs
inference over leftImg8bit_sequence frames, writes ``*_ssmask.png`` semantic
trainId maps and ``*_gtFine_instanceIds.png`` 32-bit instance maps (thing
classes 11..18, label_divisor 1000).

  python tools/generate_segmentation.py --images-root <dir> --out-semantic
      <dir> --out-instance <dir> [--weights panoptic.npz] [--size 1024 2048]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-root", required=True)
    ap.add_argument("--out-semantic", required=True)
    ap.add_argument("--out-instance", required=True)
    ap.add_argument("--weights", default=None,
                    help="npz from tools/convert_panoptic.py; random init "
                         "produces garbage maps (conversion required)")
    ap.add_argument("--size", type=int, nargs=2, default=None,
                    help="resize input to H W before inference")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from c2m_tpu.models.panoptic_deeplab import PanopticDeepLab, postprocess
    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()

    model = PanopticDeepLab()
    probe_hw = tuple(args.size) if args.size else (512, 1024)
    probe = jnp.zeros((1, *probe_hw, 3))
    variables = model.init(jax.random.PRNGKey(0), probe, train=False)
    if args.weights:
        data = np.load(args.weights, allow_pickle=True)
        variables = {"params": data["params"].item(),
                     "batch_stats": data["batch_stats"].item()}
    else:
        print("WARNING: random-init segmenter — convert weights for real use")

    apply_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))

    paths = []
    for root, _, files in os.walk(args.images_root):
        for f in sorted(files):
            if f.endswith("leftImg8bit.png"):
                paths.append(os.path.join(root, f))
    if args.limit:
        paths = paths[:args.limit]

    for i, path in enumerate(paths):
        img = Image.open(path).convert("RGB")
        if args.size:
            img = img.resize((args.size[1], args.size[0]), Image.BICUBIC)
        x = (np.asarray(img, np.float32) / 255.0 - MEAN) / STD
        out = jax.device_get(apply_fn(variables, jnp.asarray(x)[None]))
        sem, inst = postprocess(out["semantic"][0], out["center"][0],
                                out["offset"][0])
        rel = os.path.relpath(path, args.images_root)
        sem_path = os.path.join(args.out_semantic,
                                rel.replace("leftImg8bit.png", "ssmask.png"))
        inst_path = os.path.join(args.out_instance,
                                 rel.replace("leftImg8bit.png",
                                             "gtFine_instanceIds.png"))
        os.makedirs(os.path.dirname(sem_path), exist_ok=True)
        os.makedirs(os.path.dirname(inst_path), exist_ok=True)
        Image.fromarray(sem.astype(np.uint8)).save(sem_path)
        Image.fromarray(inst.astype(np.int32), mode="I").save(inst_path)
        print(f"[{i + 1}/{len(paths)}] {rel}", flush=True)


if __name__ == "__main__":
    main()
