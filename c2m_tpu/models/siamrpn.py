"""SiamRPN++ single-object tracker (preprocessing stage 2) in Flax.

Reference: pysot (SenseTime) as vendored — siamrpn_r50_l234_dwxcorr config
(trajectory_generation_scripts/config.yaml): atrous ResNet-50 backbone
(pysot/models/backbone/resnet_atrous.py — note its quirks: conv1 7x7 stride 2
pad 0; layer2's stride-2 bottleneck uses pad 0; layers 3/4 stride 1 with
dilation 2/4 and the first block's dilation halved), AdjustAllLayer neck with
7x7 center-crop on the template branch (neck.py:22-26), MultiRPN heads over
depthwise cross-correlation (head/rpn.py:54-121, core/xcorr.py:39-48), and
the SiamRPNTracker scale/ratio/window penalties (tracker/siamrpn_tracker.py).

The depthwise cross-correlation is a grouped conv (SURVEY.md §7) — a single
lax.conv_general_dilated with feature_group_count=C, batched via vmap.
Tracker state lives host-side in numpy; the network runs jitted.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Backbone: atrous ResNet-50
# ---------------------------------------------------------------------------

class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((self.padding, self.padding),) * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(x)


class Bottleneck(nn.Module):
    """resnet_atrous.py:62-111 with its stride/dilation/padding quirks."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilation = self.dilation
        padding = 2 - self.stride
        if self.has_downsample and dilation > 1:
            dilation = dilation // 2
            padding = dilation
        if dilation > 1:
            padding = dilation

        out = nn.relu(_ConvBN(self.planes, 1, name="conv1")(x, train))
        out = nn.relu(_ConvBN(self.planes, 3, self.stride, padding, dilation,
                              name="conv2")(out, train))
        out = _ConvBN(self.planes * 4, 1, name="conv3")(out, train)

        residual = x
        if self.has_downsample:
            if self.stride == 1 and self.dilation == 1:
                residual = _ConvBN(self.planes * 4, 1, self.stride,
                                   name="downsample")(x, train)
            else:
                dd, pad = (self.dilation // 2, self.dilation // 2) \
                    if self.dilation > 1 else (1, 0)
                residual = _ConvBN(self.planes * 4, 3, self.stride, pad, dd,
                                   name="downsample")(x, train)
        return nn.relu(out + residual)


class ResNet50Atrous(nn.Module):
    used_layers: Sequence[int] = (2, 3, 4)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        x = nn.relu(_ConvBN(64, 7, 2, 0, name="conv1")(x, train))
        x_ = x
        x = nn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf),
                        (3, 3), strides=(2, 2), padding="VALID")

        def layer(x, planes, blocks, stride, dilation, name):
            x = Bottleneck(planes, stride, dilation, has_downsample=True,
                           name=f"{name}_0")(x, train)
            for i in range(1, blocks):
                x = Bottleneck(planes, 1, dilation, name=f"{name}_{i}")(x, train)
            return x

        p1 = layer(x, 64, 3, 1, 1, "layer1")
        p2 = layer(p1, 128, 4, 2, 1, "layer2")
        p3 = layer(p2, 256, 6, 1, 2, "layer3")
        p4 = layer(p3, 512, 3, 1, 4, "layer4")
        feats = [x_, p1, p2, p3, p4]
        return [feats[i] for i in self.used_layers]


# ---------------------------------------------------------------------------
# Neck + RPN heads
# ---------------------------------------------------------------------------

class AdjustLayer(nn.Module):
    features: int
    center_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBN(self.features, 1, name="downsample")(x, train)
        if x.shape[2] < 20:
            l = (x.shape[2] - self.center_size) // 2
            x = x[:, l:l + self.center_size, l:l + self.center_size, :]
        return x


def xcorr_depthwise(search: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-sample depthwise cross-correlation (core/xcorr.py:39-48).
    search [B, H, W, C], kernel [B, h, w, C] -> [B, H-h+1, W-w+1, C]."""
    def one(s, k):
        # s [H, W, C]; k [h, w, C] -> depthwise VALID conv
        return jax.lax.conv_general_dilated(
            s[None], k[:, :, None, :],  # kernel HWIO: I=1, O=C
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=s.shape[-1])[0]
    return jax.vmap(one)(search, kernel)


class DepthwiseXCorr(nn.Module):
    hidden: int
    out_channels: int

    @nn.compact
    def __call__(self, kernel, search, train: bool = False):
        def branch(x, name):
            x = _ConvBN(self.hidden, 3, name=f"{name}_conv")(x, train)
            return nn.relu(x)
        k = branch(kernel, "kernel")
        s = branch(search, "search")
        feat = xcorr_depthwise(s, k)
        h = nn.relu(_ConvBN(self.hidden, 1, name="head1")(feat, train))
        return nn.Conv(self.out_channels, (1, 1), name="head2")(h)


class DepthwiseRPN(nn.Module):
    anchor_num: int = 5
    out_channels: int = 256

    @nn.compact
    def __call__(self, z_f, x_f, train: bool = False):
        cls = DepthwiseXCorr(self.out_channels, 2 * self.anchor_num,
                             name="cls")(z_f, x_f, train)
        loc = DepthwiseXCorr(self.out_channels, 4 * self.anchor_num,
                             name="loc")(z_f, x_f, train)
        return cls, loc


class SiamRPNpp(nn.Module):
    """Full model: backbone + neck + weighted MultiRPN (model_builder.py:18-66)."""
    anchor_num: int = 5
    adjust_channels: Sequence[int] = (256, 256, 256)

    def setup(self):
        self.backbone = ResNet50Atrous()
        self.necks = [AdjustLayer(c, name=f"neck_{i}")
                      for i, c in enumerate(self.adjust_channels)]
        self.rpns = [DepthwiseRPN(self.anchor_num, c, name=f"rpn_{i}")
                     for i, c in enumerate(self.adjust_channels)]
        self.cls_weight = self.param("cls_weight", nn.initializers.ones, (3,))
        self.loc_weight = self.param("loc_weight", nn.initializers.ones, (3,))

    def features(self, img):
        feats = self.backbone(img)
        return [neck(f) for neck, f in zip(self.necks, feats)]

    def heads(self, zf: List[jnp.ndarray], xf: List[jnp.ndarray]):
        cls_all, loc_all = [], []
        for rpn, z, x in zip(self.rpns, zf, xf):
            c, l = rpn(z, x)
            cls_all.append(c)
            loc_all.append(l)
        cw = jax.nn.softmax(self.cls_weight)
        lw = jax.nn.softmax(self.loc_weight)
        cls = sum(c * w for c, w in zip(cls_all, cw))
        loc = sum(l * w for l, w in zip(loc_all, lw))
        return cls, loc

    def __call__(self, template, search):
        zf = self.features(template)
        xf = self.features(search)
        return self.heads(zf, xf)


# ---------------------------------------------------------------------------
# Tracker (host-side numpy port of tracker/siamrpn_tracker.py)
# ---------------------------------------------------------------------------

@dataclass
class TrackConfig:
    penalty_k: float = 0.05
    window_influence: float = 0.42
    lr: float = 0.38
    exemplar_size: int = 127
    instance_size: int = 255
    base_size: int = 8
    context_amount: float = 0.5
    stride: int = 8
    ratios: Tuple[float, ...] = (0.33, 0.5, 1, 2, 3)
    scales: Tuple[int, ...] = (8,)


def generate_anchors(cfg: TrackConfig, score_size: int) -> np.ndarray:
    """pysot/utils/anchor.py + tracker.generate_anchor."""
    anchors = []
    size = cfg.stride * cfg.stride
    for r in cfg.ratios:
        ws = int(np.sqrt(size / r))
        hs = int(ws * r)
        for s in cfg.scales:
            w, h = ws * s, hs * s
            anchors.append([0.0, 0.0, float(w), float(h)])
    anchor = np.array(anchors, np.float32)
    anchor = np.tile(anchor, score_size * score_size).reshape((-1, 4))
    ori = -(score_size // 2) * cfg.stride
    xx, yy = np.meshgrid([ori + cfg.stride * dx for dx in range(score_size)],
                         [ori + cfg.stride * dy for dy in range(score_size)])
    num = len(cfg.ratios) * len(cfg.scales)
    anchor[:, 0] = np.tile(xx.flatten(), (num, 1)).flatten()
    anchor[:, 1] = np.tile(yy.flatten(), (num, 1)).flatten()
    return anchor


def get_subwindow(im: np.ndarray, pos, model_sz: int, original_sz: int,
                  avg_chans) -> np.ndarray:
    """Padded square crop + resize (base_tracker.py:38-95). PIL bilinear
    replaces cv2.resize (cv2 absent; sub-pixel diffs only)."""
    from PIL import Image
    sz = int(original_sz)
    im_h, im_w = im.shape[:2]
    c = (original_sz + 1) / 2
    xmin = int(np.floor(pos[0] - c + 0.5))
    ymin = int(np.floor(pos[1] - c + 0.5))
    xmax = xmin + sz - 1
    ymax = ymin + sz - 1
    left = max(0, -xmin)
    top = max(0, -ymin)
    right = max(0, xmax - im_w + 1)
    bottom = max(0, ymax - im_h + 1)
    if any((left, top, right, bottom)):
        padded = np.zeros((im_h + top + bottom, im_w + left + right, 3),
                          im.dtype)
        padded[top:top + im_h, left:left + im_w] = im
        padded[:top] = avg_chans
        padded[top + im_h:] = avg_chans
        padded[:, :left] = avg_chans
        padded[:, left + im_w:] = avg_chans
        patch = padded[ymin + top:ymax + top + 1, xmin + left:xmax + left + 1]
    else:
        patch = im[ymin:ymax + 1, xmin:xmax + 1]
    if patch.shape[0] != model_sz:
        patch = np.asarray(Image.fromarray(patch.astype(np.uint8)).resize(
            (model_sz, model_sz), Image.BILINEAR))
    return patch.astype(np.float32)


class SiamRPNTracker:
    def __init__(self, model: SiamRPNpp, variables, cfg: TrackConfig = None):
        self.cfg = cfg or TrackConfig()
        c = self.cfg
        self.score_size = ((c.instance_size - c.exemplar_size) // c.stride
                           + 1 + c.base_size)
        self.anchor_num = len(c.ratios) * len(c.scales)
        hanning = np.hanning(self.score_size)
        self.window = np.tile(np.outer(hanning, hanning).flatten(),
                              self.anchor_num)
        self.anchors = generate_anchors(c, self.score_size)
        self.model = model
        self.variables = variables
        self._features = jax.jit(
            lambda v, img: model.apply(v, img, method=SiamRPNpp.features))
        self._heads = jax.jit(
            lambda v, zf, xf: model.apply(v, zf, xf, method=SiamRPNpp.heads))
        self.zf = None

    def init(self, img: np.ndarray, bbox) -> None:
        c = self.cfg
        self.center_pos = np.array([bbox[0] + (bbox[2] - 1) / 2,
                                    bbox[1] + (bbox[3] - 1) / 2])
        self.size = np.array([bbox[2], bbox[3]], np.float64)
        w_z = self.size[0] + c.context_amount * self.size.sum()
        h_z = self.size[1] + c.context_amount * self.size.sum()
        s_z = round(np.sqrt(w_z * h_z))
        self.channel_average = img.mean(axis=(0, 1))
        z = get_subwindow(img, self.center_pos, c.exemplar_size, s_z,
                          self.channel_average)
        self.zf = self._features(self.variables, jnp.asarray(z)[None])

    def track(self, img: np.ndarray) -> Dict:
        c = self.cfg
        w_z = self.size[0] + c.context_amount * self.size.sum()
        h_z = self.size[1] + c.context_amount * self.size.sum()
        s_z = np.sqrt(w_z * h_z)
        scale_z = c.exemplar_size / s_z
        s_x = s_z * (c.instance_size / c.exemplar_size)
        x = get_subwindow(img, self.center_pos, c.instance_size, round(s_x),
                          self.channel_average)
        xf = self._features(self.variables, jnp.asarray(x)[None])
        cls, loc = self._heads(self.variables, self.zf, xf)

        # scores: [1, H, W, 2A] -> softmax over the 2-way fg/bg split
        cls = np.asarray(cls)[0]
        h, w = cls.shape[:2]
        a = self.anchor_num
        # channel layout parity with torch [2A, H, W].view(2, A, H, W):
        # our NHWC channel k corresponds to torch channel k.
        cls_t = cls.transpose(2, 0, 1).reshape(2, a, h, w)
        score = np.exp(cls_t[1]) / (np.exp(cls_t[0]) + np.exp(cls_t[1]))
        score = score.reshape(-1)

        loc = np.asarray(loc)[0].transpose(2, 0, 1).reshape(4, a, h, w)
        delta = loc.reshape(4, -1)
        pred = np.empty_like(delta)
        pred[0] = delta[0] * self.anchors[:, 2] + self.anchors[:, 0]
        pred[1] = delta[1] * self.anchors[:, 3] + self.anchors[:, 1]
        pred[2] = np.exp(delta[2]) * self.anchors[:, 2]
        pred[3] = np.exp(delta[3]) * self.anchors[:, 3]

        def change(r):
            return np.maximum(r, 1.0 / r)

        def sz(w_, h_):
            pad = (w_ + h_) * 0.5
            return np.sqrt((w_ + pad) * (h_ + pad))

        s_c = change(sz(pred[2], pred[3])
                     / sz(self.size[0] * scale_z, self.size[1] * scale_z))
        r_c = change((self.size[0] / self.size[1]) / (pred[2] / pred[3]))
        penalty = np.exp(-(r_c * s_c - 1) * c.penalty_k)
        pscore = penalty * score
        pscore = (pscore * (1 - c.window_influence)
                  + self.window * c.window_influence)
        best = int(np.argmax(pscore))

        bbox = pred[:, best] / scale_z
        lr = penalty[best] * score[best] * c.lr
        cx = bbox[0] + self.center_pos[0]
        cy = bbox[1] + self.center_pos[1]
        width = self.size[0] * (1 - lr) + bbox[2] * lr
        height = self.size[1] * (1 - lr) + bbox[3] * lr
        cx = max(0, min(cx, img.shape[1]))
        cy = max(0, min(cy, img.shape[0]))
        width = max(10, min(width, img.shape[1]))
        height = max(10, min(height, img.shape[0]))
        self.center_pos = np.array([cx, cy])
        self.size = np.array([width, height])
        return {"bbox": [cx - width / 2, cy - height / 2, width, height],
                "best_score": float(score[best])}
