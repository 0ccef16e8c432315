#!/usr/bin/env python
"""Standalone YOLOv3 detection CLI over an image folder (reference:
src/modules/networks/yolo_v3/detect.py — the vendored demo the repo ships
alongside the evaluator's detection metric).

Same contract: pad each image to square, resize to ``--img-size``, run the
COCO YOLOv3, NMS, rescale boxes to the original frame, and write per-image
results under ``--out``: a ``<name>.txt`` with one ``cls conf x1 y1 x2 y2``
row per detection plus a ``<name>.png`` with the boxes drawn (PIL rectangles
replace the reference's matplotlib patches).

Weights: a darknet ``.weights`` binary (eval/yolov3.load_darknet_weights) or
a converted ``.npz``. COCO class names via ``--class-path`` (one per line).

  python tools/yolo_detect.py --image-folder samples/ --weights yolov3.weights
"""

import argparse
import glob
import os

import numpy as np
from PIL import Image, ImageDraw


def pad_to_square_resize(img: np.ndarray, size: int):
    """Zero-pad H/W to square (split evenly, reference datasets.py
    ``pad_to_square``), bilinear-resize to (size, size). Returns the tensor
    and the (pad_y, pad_x, square) geometry needed to invert the mapping."""
    h, w = img.shape[:2]
    s = max(h, w)
    py, px = (s - h) // 2, (s - w) // 2
    sq = np.zeros((s, s, 3), np.float32)
    sq[py:py + h, px:px + w] = img
    out = np.asarray(Image.fromarray(
        (sq * 255).astype(np.uint8)).resize((size, size), Image.BILINEAR),
        np.float32) / 255.0
    return out, (py, px, s)


def rescale_boxes(boxes: np.ndarray, geom, img_size: int) -> np.ndarray:
    """Map [x1,y1,x2,y2] from the padded-square model frame back to the
    original image (reference utils.py ``rescale_boxes``)."""
    py, px, s = geom
    scale = s / img_size
    out = boxes.copy()
    out[:, [0, 2]] = boxes[:, [0, 2]] * scale - px
    out[:, [1, 3]] = boxes[:, [1, 3]] * scale - py
    return out


def load_model(weights_path: str):
    import jax
    import jax.numpy as jnp
    from c2m_tpu.eval.yolov3 import YoloV3, load_darknet_weights
    model = YoloV3()
    if weights_path.endswith(".npz"):
        data = np.load(weights_path, allow_pickle=True)
        variables = {"params": data["params"].item(),
                     "batch_stats": data["batch_stats"].item()}
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 416, 416, 3)), train=False)
        variables = load_darknet_weights(variables, weights_path)
    apply_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    return lambda x: np.asarray(apply_fn(variables, jnp.asarray(x)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-folder", required=True)
    ap.add_argument("--weights", required=True,
                    help=".weights darknet binary or converted .npz")
    ap.add_argument("--class-path", default=None,
                    help="one class name per line (COCO order)")
    ap.add_argument("--conf-thres", type=float, default=0.8)
    ap.add_argument("--nms-thres", type=float, default=0.4)
    ap.add_argument("--img-size", type=int, default=416)
    ap.add_argument("--out", default="output")
    args = ap.parse_args()

    from c2m_tpu.eval.yolov3 import non_max_suppression
    names = None
    if args.class_path:
        names = [ln.strip() for ln in open(args.class_path) if ln.strip()]
    run = load_model(args.weights)
    os.makedirs(args.out, exist_ok=True)

    paths = sorted(p for p in glob.glob(os.path.join(args.image_folder, "*"))
                   if p.lower().endswith((".png", ".jpg", ".jpeg")))
    for path in paths:
        pil = Image.open(path).convert("RGB")
        img = np.asarray(pil, np.float32) / 255.0
        x, geom = pad_to_square_resize(img, args.img_size)
        det = non_max_suppression(run(x[None])[0], args.conf_thres,
                                  args.nms_thres)
        stem = os.path.splitext(os.path.basename(path))[0]
        draw = ImageDraw.Draw(pil)
        rows = []
        if det is not None and len(det):
            boxes = rescale_boxes(det[:, :4], geom, args.img_size)
            for (x1, y1, x2, y2), d in zip(boxes, det):
                conf, cls = float(d[4]), int(d[6])
                label = names[cls] if names and cls < len(names) else str(cls)
                rows.append(f"{label} {conf:.4f} "
                            f"{x1:.1f} {y1:.1f} {x2:.1f} {y2:.1f}")
                draw.rectangle([x1, y1, x2, y2], outline=(255, 64, 64),
                               width=2)
                draw.text((x1 + 2, y1 + 2), f"{label} {conf:.2f}",
                          fill=(255, 64, 64))
        with open(os.path.join(args.out, stem + ".txt"), "w") as f:
            f.write("\n".join(rows) + ("\n" if rows else ""))
        pil.save(os.path.join(args.out, stem + ".png"))
        print(f"{path}: {len(rows)} detections")


if __name__ == "__main__":
    main()
