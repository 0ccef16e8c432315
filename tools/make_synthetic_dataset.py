#!/usr/bin/env python
"""Write a synthetic Cityscapes-layout dataset to disk.

Produces the exact directory/file contract the reference consumes
(config/c2m_journal_cityscapes.yaml:4-30; README.md:50-78): resized RGB frame
sequences, `*_ssmask.png` semantic maps, `*_gtFine_instanceIds.png` 32-bit
instance maps, per-object trajectory txts, backward/forward `.flow` +
occlusion pngs, and datalists. Used by integration tests and as a smoke
fixture (the reference's debug datalist points at real data we don't ship).

Usage: python tools/make_synthetic_dataset.py --root /tmp/c2m_data \
          [--clips 4] [--height 128] [--width 256] [--frames 6]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c2m_tpu.config import Config  # noqa: E402
from c2m_tpu.data.cityscapes import TRAJ_FULL_H, TRAJ_FULL_W  # noqa: E402
from c2m_tpu.data.flow_io import write_flow  # noqa: E402
from c2m_tpu.data.synthetic import make_batch  # noqa: E402


def save_png(path, arr, mode=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr, mode=mode).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    ap.add_argument("--max-objects", type=int, default=8)
    args = ap.parse_args()

    cfg = Config()
    cfg.dataset_params.max_objects = args.max_objects
    cfg.train_params.input_size = [args.height, args.width]
    cfg.train_params.num_predicted_frames = args.frames - cfg.train_params.num_input_frames
    cfg.validate()
    dp = cfg.dataset_params
    h, w = args.height, args.width

    for split in args.splits:
        pre = split
        names = []
        for ci in range(args.clips):
            batch = make_batch(cfg, batch_size=1, seed=1000 * (split == "val") + ci)
            city = "synthcity"
            base_frame = 19 + ci * 30
            stem_of = lambda i, tail: f"{city}/{city}_{ci:06d}_{base_frame + i:06d}_{tail}"
            names.append(f"{city}/{city}_{ci:06d}_{base_frame:06d}_leftImg8bit.png")

            video = batch["video"][0]
            inst = batch["instance_mask"][0]
            bg = batch["bg_mask"][0]
            fg = batch["fg_mask"][0]
            for i in range(args.frames):
                rgb = (video[i] * 255).astype(np.uint8)
                save_png(os.path.join(args.root, getattr(dp, f"{pre}_images_path"),
                                      stem_of(i, "leftImg8bit.png")), rgb)
                # semantic trainId map from the one-hot channels
                seg = np.argmax(bg[i], axis=-1).astype(np.uint8)
                fg_any = fg[i].max(axis=-1) > 0
                seg[fg_any] = np.argmax(fg[i], axis=-1)[fg_any] + 11
                save_png(os.path.join(args.root, getattr(dp, f"{pre}_segmasks_path"),
                                      stem_of(i, dp.segmask_suffix)), seg)
                save_png(os.path.join(args.root, getattr(dp, f"{pre}_instances_path"),
                                      stem_of(i, dp.instance_suffix)),
                         inst[i, ..., 0].astype(np.int32), mode="I")
                if i >= 1:
                    write_flow(os.path.join(args.root, getattr(dp, f"{pre}_bw_of_path"),
                                            stem_of(i, dp.bw_of_suffix)),
                               batch["target_bw_of"][0, i - 1])
                    occ = (batch["target_bw_occ"][0, i - 1, ..., 0] * 255).astype(np.uint8)
                    save_png(os.path.join(args.root, getattr(dp, f"{pre}_bw_occ_path"),
                                          stem_of(i, dp.bw_occ_suffix)), occ)
                    fw = batch.get("target_fw_of")
                    if fw is None:
                        # always write fw too so use_fw_of configs work
                        from c2m_tpu.ops.raster import generate_sparse_motion
                        import jax.numpy as jnp
                        sp = generate_sparse_motion(
                            jnp.asarray(batch["instance_mask"][:, 0]),
                            jnp.asarray(batch["inst_ids"]),
                            jnp.asarray(batch["node_mask"]),
                            jnp.asarray(batch["targets_theta"]))
                        batch["target_fw_of"] = np.asarray(sp["sparse_motion_fw"])
                        batch["target_fw_occ"] = np.asarray(sp["sparse_occ_fw"])
                    write_flow(os.path.join(args.root, getattr(dp, f"{pre}_fw_of_path"),
                                            stem_of(i, dp.fw_of_suffix)),
                               batch["target_fw_of"][0, i - 1])
                    occf = (batch["target_fw_occ"][0, i - 1, ..., 0] * 255).astype(np.uint8)
                    save_png(os.path.join(args.root, getattr(dp, f"{pre}_fw_occ_path"),
                                          stem_of(i, dp.fw_occ_suffix)), occf)

            # trajectory txts: per object, x,y,w,h,iid per frame in 2048x1024
            n_real = int(batch["num_real_nodes"][0])
            for ni in range(n_real):
                iid = int(batch["inst_ids"][0, ni])
                lines = []
                for i in range(args.frames):
                    mask = inst[i, ..., 0] == iid
                    if not mask.any():
                        lines = []
                        break
                    ys, xs = np.nonzero(mask)
                    x0, x1 = xs.min(), xs.max() + 1
                    y0, y1 = ys.min(), ys.max() + 1
                    lines.append(
                        f"{x0 / w * TRAJ_FULL_W},{y0 / h * TRAJ_FULL_H},"
                        f"{(x1 - x0) / w * TRAJ_FULL_W},{(y1 - y0) / h * TRAJ_FULL_H},"
                        f"{iid}")
                if lines:
                    tdir = os.path.join(args.root, getattr(dp, f"{pre}_tracking_path"))
                    tpath = os.path.join(
                        tdir, f"{city}/{city}_{ci:06d}_{base_frame:06d}_{iid}.txt")
                    os.makedirs(os.path.dirname(tpath), exist_ok=True)
                    with open(tpath, "w") as f:
                        f.write("\n".join(lines))

        listpath = os.path.join(args.root, getattr(dp, f"{pre}_data_list"))
        os.makedirs(os.path.dirname(listpath) or ".", exist_ok=True)
        with open(listpath, "w") as f:
            f.write("\n".join(names))
        print(f"[{split}] wrote {len(names)} clips under {args.root}")


if __name__ == "__main__":
    main()
