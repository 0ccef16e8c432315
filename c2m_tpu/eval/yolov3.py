"""YOLOv3 detector (Flax) + NMS + the detection-trajectory metric.

Reference: src/modules/networks/yolo_v3/ (Darknet cfg-driven model, COCO
weights) used only by the Evaluator's "does the moved object still get
detected at the right place" metric (utils_yolov3.py:67-169). Here the
standard YOLOv3 architecture is explicit (Darknet-53 + 3-scale heads, 80
classes), with a loader for the original darknet ``yolov3.weights`` binary
(sequential BN/conv blobs in cfg order) so locally-available weights work in
the zero-egress environment.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),   # stride 32
    ((30, 61), (62, 45), (59, 119)),       # stride 16
    ((10, 13), (16, 30), (33, 23)),        # stride 8
)
NUM_CLASSES = 80


class ConvBL(nn.Module):
    """conv + BN + LeakyReLU(0.1) (darknet convolutional block)."""
    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=not self.bn)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.leaky_relu(x, 0.1)
        return x


class Residual(nn.Module):
    features: int  # bottleneck width; output is 2x

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBL(self.features, 1)(x, train)
        y = ConvBL(self.features * 2, 3)(y, train)
        return x + y


class Darknet53(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBL(32, 3)(x, train)
        x = ConvBL(64, 3, 2)(x, train)
        for _ in range(1):
            x = Residual(32)(x, train)
        x = ConvBL(128, 3, 2)(x, train)
        for _ in range(2):
            x = Residual(64)(x, train)
        x = ConvBL(256, 3, 2)(x, train)
        for _ in range(8):
            x = Residual(128)(x, train)
        c3 = x
        x = ConvBL(512, 3, 2)(x, train)
        for _ in range(8):
            x = Residual(256)(x, train)
        c4 = x
        x = ConvBL(1024, 3, 2)(x, train)
        for _ in range(4):
            x = Residual(512)(x, train)
        return c3, c4, x


def _decode(pred: jnp.ndarray, anchors, stride: int) -> jnp.ndarray:
    """[B, H, W, A*(5+C)] -> [B, A*H*W, 5+C] absolute boxes (cx, cy, w, h)."""
    b, h, w, _ = pred.shape
    a = len(anchors)
    p = pred.reshape(b, h, w, a, 5 + NUM_CLASSES)
    xs = jnp.arange(w, dtype=pred.dtype)
    ys = jnp.arange(h, dtype=pred.dtype)
    cx = (jax.nn.sigmoid(p[..., 0]) + xs[None, None, :, None]) * stride
    cy = (jax.nn.sigmoid(p[..., 1]) + ys[None, :, None, None]) * stride
    anc = jnp.asarray(anchors, pred.dtype)
    pw = jnp.exp(p[..., 2]) * anc[None, None, None, :, 0]
    ph = jnp.exp(p[..., 3]) * anc[None, None, None, :, 1]
    conf = jax.nn.sigmoid(p[..., 4])
    cls = jax.nn.sigmoid(p[..., 5:])
    out = jnp.concatenate([cx[..., None], cy[..., None], pw[..., None],
                           ph[..., None], conf[..., None], cls], axis=-1)
    # [B, H, W, A, 85] -> anchor-major [B, A*H*W, 85] (torch .view parity)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, -1, 5 + NUM_CLASSES)


class YoloV3(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        c3, c4, c5 = Darknet53(name="backbone")(x, train)

        def block5(x, ch, train):
            x = ConvBL(ch, 1)(x, train)
            x = ConvBL(ch * 2, 3)(x, train)
            x = ConvBL(ch, 1)(x, train)
            x = ConvBL(ch * 2, 3)(x, train)
            return ConvBL(ch, 1)(x, train)

        outs = []
        r5 = block5(c5, 512, train)
        h5 = ConvBL(1024, 3)(r5, train)
        h5 = nn.Conv(3 * (5 + NUM_CLASSES), (1, 1))(h5)
        outs.append(_decode(h5, ANCHORS[0], 32))

        u4 = ConvBL(256, 1)(r5, train)
        u4 = jnp.repeat(jnp.repeat(u4, 2, axis=1), 2, axis=2)  # nearest 2x
        r4 = block5(jnp.concatenate([u4, c4], -1), 256, train)
        h4 = ConvBL(512, 3)(r4, train)
        h4 = nn.Conv(3 * (5 + NUM_CLASSES), (1, 1))(h4)
        outs.append(_decode(h4, ANCHORS[1], 16))

        u3 = ConvBL(128, 1)(r4, train)
        u3 = jnp.repeat(jnp.repeat(u3, 2, axis=1), 2, axis=2)
        r3 = block5(jnp.concatenate([u3, c3], -1), 128, train)
        h3 = ConvBL(256, 3)(r3, train)
        h3 = nn.Conv(3 * (5 + NUM_CLASSES), (1, 1))(h3)
        outs.append(_decode(h3, ANCHORS[2], 8))
        return jnp.concatenate(outs, axis=1)


def non_max_suppression(pred: np.ndarray, conf_thresh: float = 0.5,
                        nms_thresh: float = 0.4) -> Optional[np.ndarray]:
    """Greedy per-class NMS. pred [N, 85] (cx, cy, w, h, conf, cls...)
    -> [M, 7] rows (x1, y1, x2, y2, conf, cls_conf, cls) or None."""
    keep = pred[pred[:, 4] >= conf_thresh]
    if not len(keep):
        return None
    boxes = np.empty((len(keep), 4))
    boxes[:, 0] = keep[:, 0] - keep[:, 2] / 2
    boxes[:, 1] = keep[:, 1] - keep[:, 3] / 2
    boxes[:, 2] = keep[:, 0] + keep[:, 2] / 2
    boxes[:, 3] = keep[:, 1] + keep[:, 3] / 2
    cls_conf = keep[:, 5:].max(axis=1)
    cls_pred = keep[:, 5:].argmax(axis=1)
    score = keep[:, 4] * cls_conf
    order = np.argsort(-score)
    out = []
    suppressed = np.zeros(len(keep), bool)
    for i in order:
        if suppressed[i]:
            continue
        out.append([*boxes[i], keep[i, 4], cls_conf[i], cls_pred[i]])
        same = cls_pred == cls_pred[i]
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
        suppressed |= same & (iou > nms_thresh)
    return np.asarray(out) if out else None


def _conv_block_order() -> List[Tuple[Tuple[str, ...], bool]]:
    """Conv blocks in darknet cfg order as (flax scope path, has_bn).

    Our module creation order mirrors the cfg: Darknet-53 trunk, then per
    scale [5-conv block, 3x3 head conv, 1x1 detection conv], with the 1x1
    route conv before each upsample. flax auto-numbers inline submodules in
    call order, so the scopes are reconstructible deterministically.
    """
    order: List[Tuple[Tuple[str, ...], bool]] = []
    bb = ("backbone",)
    conv_i = 0
    res_i = 0

    def bb_conv():
        nonlocal conv_i
        order.append(((*bb, f"ConvBL_{conv_i}"), True))
        conv_i += 1

    def bb_res(n):
        nonlocal res_i
        for _ in range(n):
            order.append(((*bb, f"Residual_{res_i}", "ConvBL_0"), True))
            order.append(((*bb, f"Residual_{res_i}", "ConvBL_1"), True))
            res_i += 1

    bb_conv()           # 32
    bb_conv()           # 64 /2
    bb_res(1)
    bb_conv()           # 128 /2
    bb_res(2)
    bb_conv()           # 256 /2
    bb_res(8)
    bb_conv()           # 512 /2
    bb_res(8)
    bb_conv()           # 1024 /2
    bb_res(4)

    k = 0               # ConvBL index in the YoloV3 scope
    d = 0               # raw detection Conv index
    for scale in range(3):
        for _ in range(5):                       # block5
            order.append(((f"ConvBL_{k}",), True))
            k += 1
        order.append(((f"ConvBL_{k}",), True))   # 3x3 head conv
        k += 1
        order.append(((f"Conv_{d}",), False))    # 1x1 detection conv
        d += 1
        if scale < 2:
            order.append(((f"ConvBL_{k}",), True))  # route conv pre-upsample
            k += 1
    return order


def load_darknet_weights(variables: Dict, path: str) -> Dict:
    """Load original darknet ``yolov3.weights`` into our variables.

    Binary layout (reference models.py load_darknet_weights): 5-int32 header,
    then per conv block in cfg order: [bn_bias, bn_scale, bn_mean, bn_var]
    (or conv bias when the block has no BN) followed by conv kernels in OIHW.
    """
    with open(path, "rb") as f:
        np.fromfile(f, np.int32, 5)
        blob = np.fromfile(f, np.float32)
    params = jax.tree.map(np.array, variables["params"])
    stats = jax.tree.map(np.array, variables["batch_stats"])
    ptr = 0

    def take(n):
        nonlocal ptr
        out = blob[ptr:ptr + n]
        if len(out) != n:
            raise ValueError(f"weights file exhausted at {ptr} (+{n})")
        ptr += n
        return out

    def node(tree, scope):
        for s in scope:
            tree = tree[s]
        return tree

    for scope, has_bn in _conv_block_order():
        conv = node(params, scope)["Conv_0"] if has_bn else node(
            params, scope[:-1])[scope[-1]]
        kernel = conv["kernel"]                  # [kh, kw, I, O]
        kh, kw, ci, co = kernel.shape
        if has_bn:
            bn = node(params, scope)["BatchNorm_0"]
            st = node(stats, scope)["BatchNorm_0"]
            bn["bias"] = take(co)
            bn["scale"] = take(co)
            st["mean"] = take(co)
            st["var"] = take(co)
        else:
            conv["bias"] = take(co)
        w = take(co * ci * kh * kw).reshape(co, ci, kh, kw)
        conv["kernel"] = np.transpose(w, (2, 3, 1, 0))
    if ptr != len(blob):
        raise ValueError(f"{len(blob) - ptr} unconsumed weights — "
                         "architecture/cfg mismatch")
    return {"params": params, "batch_stats": stats}
