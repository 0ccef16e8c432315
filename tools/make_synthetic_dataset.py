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
    ap.add_argument("--style", default="cityscapes",
                    choices=["cityscapes", "kitti", "mvtid"],
                    help="on-disk naming: cityscapes 6-digit mid-name frame "
                         "indices; kitti 10-digit trailing indices "
                         "(kitti.py:20-28); mvtid name-list .jpg scenes "
                         "(mvtid.py:274-330)")
    ap.add_argument("--dataset-type", default="drone",
                    help="mvtid only: the <dataset_type>/<split> path segment")
    args = ap.parse_args()

    cfg = Config()
    cfg.dataset_params.max_objects = args.max_objects
    cfg.train_params.input_size = [args.height, args.width]
    cfg.train_params.num_predicted_frames = args.frames - cfg.train_params.num_input_frames
    if args.style == "kitti":
        # KITTI mask/flow names are the frame name + suffix (kitti.py:307-313);
        # a canonical KITTI config uses extension-style suffixes.
        cfg.dataset_params.segmask_suffix = "_ssmask.png"
        cfg.dataset_params.instance_suffix = "_instanceIds.png"
        cfg.dataset_params.bw_of_suffix = "_flow_backward.flow"
        cfg.dataset_params.bw_occ_suffix = "_occlusion_bw.png"
        cfg.dataset_params.fw_of_suffix = "_flow_forward.flow"
        cfg.dataset_params.fw_occ_suffix = "_occlusion_fw.png"
    if args.style == "mvtid":
        cfg.dataset_params.segmask_suffix = "gtFine_labelIds.png"
        cfg.dataset_params.instance_suffix = "gtFine_instanceIds.png"
        cfg.dataset_params.bw_of_suffix = "flow_backward.flow"
        cfg.dataset_params.bw_occ_suffix = "occlusion_bw.png"
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
            if args.style == "kitti":
                scene = f"drive{ci:04d}"
                stem_of = lambda i, tail: (
                    f"{scene}/{base_frame + i:010d}"
                    + (tail if tail.startswith(("_", ".")) else
                       "" if not tail else "_" + tail))
                first = f"{scene}/{base_frame:010d}.png"

                def img_name(i):
                    return f"{scene}/{base_frame + i:010d}.png"
            elif args.style == "mvtid":
                scene = f"scene{ci:04d}"
                stem_of = lambda i, tail: (
                    f"{scene}/frame_{base_frame + i:04d}"
                    + ("_" + tail if tail else ""))
                first = f"{scene}/frame_{base_frame:04d}.jpg"

                def img_name(i):
                    return f"{scene}/frame_{base_frame + i:04d}.jpg"
            else:
                stem_of = lambda i, tail: \
                    f"{city}/{city}_{ci:06d}_{base_frame + i:06d}_{tail}"
                first = f"{city}/{city}_{ci:06d}_{base_frame:06d}_leftImg8bit.png"

                def img_name(i):
                    return stem_of(i, "leftImg8bit.png")
            names.append(first)

            def root_of(kind):
                base = os.path.join(args.root, getattr(dp, f"{pre}_{kind}_path"))
                if args.style == "mvtid":
                    # MVTID layout: <root>/<dataset_type>/<dir>/<split>
                    rel = os.path.relpath(base, args.root)
                    return os.path.join(args.root, args.dataset_type, rel,
                                        split)
                return base

            video = batch["video"][0]
            inst = batch["instance_mask"][0]
            bg = batch["bg_mask"][0]
            fg = batch["fg_mask"][0]
            for i in range(args.frames):
                rgb = (video[i] * 255).astype(np.uint8)
                save_png(os.path.join(root_of("images"), img_name(i)), rgb)
                # semantic trainId map from the one-hot channels
                seg = np.argmax(bg[i], axis=-1).astype(np.uint8)
                fg_any = fg[i].max(axis=-1) > 0
                seg[fg_any] = np.argmax(fg[i], axis=-1)[fg_any] + 11
                save_png(os.path.join(root_of("segmasks"),
                                      stem_of(i, dp.segmask_suffix)), seg)
                save_png(os.path.join(root_of("instances"),
                                      stem_of(i, dp.instance_suffix)),
                         inst[i, ..., 0].astype(np.int32), mode="I")
                if i >= 1:
                    write_flow(os.path.join(root_of("bw_of"),
                                            stem_of(i, dp.bw_of_suffix)),
                               batch["target_bw_of"][0, i - 1])
                    occ = (batch["target_bw_occ"][0, i - 1, ..., 0] * 255).astype(np.uint8)
                    save_png(os.path.join(root_of("bw_occ"),
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
                    write_flow(os.path.join(root_of("fw_of"),
                                            stem_of(i, dp.fw_of_suffix)),
                               batch["target_fw_of"][0, i - 1])
                    occf = (batch["target_fw_occ"][0, i - 1, ..., 0] * 255).astype(np.uint8)
                    save_png(os.path.join(root_of("fw_occ"),
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
                    tpath = os.path.join(root_of("tracking"),
                                         stem_of(0, f"{iid}.txt"))
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
