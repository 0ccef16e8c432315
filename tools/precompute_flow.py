#!/usr/bin/env python
"""Precompute backward/forward optical flow + occlusion maps with FlowNet2.

The reference consumes precomputed ``.flow`` + occlusion pngs
(cityscapes.py:216-261) but ships no writer script (SURVEY.md §3.4) — this is
the canonical one. For each clip frame i in 1..T-1:
  backward flow = FlowNet2(frame_i, frame_{i-1}-ish per reference trainer
  convention: compute_flow warps target->source), occlusion = forward-splat
  visibility of the flow (flow_net.py:70).

Reference trainer convention (trainer.py:42-98): bw flow maps target frame t
to the last input frame; fw flow the reverse.

  python tools/precompute_flow.py --root <dataset_root> --split train \
      [--config configs/c2m_journal_cityscapes.yaml] [--weights flownet2.npz]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/c2m_journal_cityscapes.yaml")
    ap.add_argument("--root", default=None, help="override dataset root")
    ap.add_argument("--split", default="train", choices=["train", "val"])
    ap.add_argument("--weights", default=None,
                    help="converted FlowNet2 weights (.npz via "
                         "tools/convert_flownet2.py); random init otherwise "
                         "(flows will be garbage — conversion required for "
                         "real use)")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from c2m_tpu.config import Config
    from c2m_tpu.data.cityscapes import load_image, shift_frame_index
    from c2m_tpu.data.flow_io import write_flow
    from c2m_tpu.models.flownet2 import FlowNet2, compute_flow_and_conf

    cfg = Config.from_yaml(args.config)
    if args.root:
        cfg.dataset_params.root = args.root
    dp = cfg.dataset_params
    pre = args.split
    root = dp.root
    size = cfg.train_params.input_size
    nif = cfg.train_params.num_input_frames
    t = cfg.train_params.num_frames

    with open(os.path.join(root, getattr(dp, f"{pre}_data_list"))) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    if args.limit:
        names = names[:args.limit]

    model = FlowNet2()
    rng = jax.random.PRNGKey(0)
    probe = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng, probe, probe)
    if args.weights:
        data = np.load(args.weights, allow_pickle=True)
        variables = {"params": data["params"].item()}
        print(f"loaded weights from {args.weights}")
    else:
        print("WARNING: no weights given — flows are from a random-init net")

    apply_fn = jax.jit(model.apply)

    images_root = os.path.join(root, getattr(dp, f"{pre}_images_path"))
    for clip_i, name in enumerate(names):
        frames = [jnp.asarray(load_image(
            os.path.join(images_root, shift_frame_index(name, i)), size))[None]
            for i in range(t)]
        src = frames[nif - 1]
        stem = name[:-15]
        for i in range(1, t):
            bw_flow, bw_conf = compute_flow_and_conf(apply_fn, variables,
                                                     frames[i], src)
            fw_flow, fw_conf = compute_flow_and_conf(apply_fn, variables,
                                                     src, frames[i])
            for kind, flow, conf in (("bw", bw_flow, bw_conf),
                                     ("fw", fw_flow, fw_conf)):
                of_dir = os.path.join(root, getattr(dp, f"{pre}_{kind}_of_path"))
                occ_dir = os.path.join(root, getattr(dp, f"{pre}_{kind}_occ_path"))
                of_path = os.path.join(of_dir, shift_frame_index(
                    stem + getattr(dp, f"{kind}_of_suffix"), i))
                occ_path = os.path.join(occ_dir, shift_frame_index(
                    stem + getattr(dp, f"{kind}_occ_suffix"), i))
                write_flow(of_path, np.asarray(flow[0]))
                os.makedirs(os.path.dirname(occ_path), exist_ok=True)
                occ = (np.asarray(conf[0, ..., 0]) * 255).astype(np.uint8)
                Image.fromarray(occ).save(occ_path)
        print(f"[{clip_i + 1}/{len(names)}] {name}", flush=True)


if __name__ == "__main__":
    main()
