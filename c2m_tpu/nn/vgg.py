"""VGG19 feature extractor for the perceptual loss.

Reference: src/modules/layers/vgg.py — torchvision vgg19 ``features`` tapped
after every ReLU; the perceptual loss uses relu{1..5}_1 and the (off by
default) style loss uses relu2_2/relu3_4/relu4_4/relu5_2 (losses.py:40-69).
The reference's ``normalize`` helper in losses.py is dead code, but the
Vgg19 WRAPPER itself ImageNet-normalizes its input (vgg.py:85-93,
``x = (x - mean) / std`` with non-grad buffers) — reproduced here via
``normalize=True`` (the default; the weight-converter parity test compares
the bare trunk with ``normalize=False``).

Pretrained weights: zero-egress environment, so weights are loaded from a
local npz (``VGG19_WEIGHTS`` env var or ``weights_path``) produced by
``tools/convert_vgg.py`` from a torchvision checkpoint. Absent weights, the
extractor is initialized with torch-default random weights — the loss is
still a multi-scale feature matcher, and tests exercise architecture parity.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from c2m_tpu.nn.layers import Conv

# (out_channels, n_convs) per stage of VGG19.
_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))

# Taps returned by the reference extractor, in forward order.
TAPS = tuple(f"relu{s}_{i}" for s, (_, n) in enumerate(_STAGES, 1)
             for i in range(1, n + 1))


_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class Vgg19Features(nn.Module):
    """VGG19 conv trunk; returns {relu{s}_{i}: feature map} (NHWC).

    normalize=True applies the reference Vgg19 wrapper's internal ImageNet
    normalization (vgg.py:93) before the first conv."""
    dtype: Optional[jnp.dtype] = None
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.normalize:
            mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(_IMAGENET_STD, x.dtype)
            x = (x - mean) / std
        taps = {}
        for stage, (ch, n_convs) in enumerate(_STAGES, start=1):
            for i in range(1, n_convs + 1):
                x = Conv(ch, 3, 1, 1, "zeros", dtype=self.dtype,
                         name=f"conv{stage}_{i}")(x)
                x = nn.relu(x)
                taps[f"relu{stage}_{i}"] = x
            if stage < len(_STAGES):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def load_vgg19_params(weights_path: Optional[str] = None) -> Optional[dict]:
    """Load converted torchvision VGG19 weights from npz, or None if absent.

    npz keys: ``conv{s}_{i}.kernel`` [kh, kw, in, out] and ``conv{s}_{i}.bias``.
    """
    path = weights_path or os.environ.get("VGG19_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    params = {}
    for stage, (_, n_convs) in enumerate(_STAGES, start=1):
        for i in range(1, n_convs + 1):
            name = f"conv{stage}_{i}"
            params[name] = {
                "Conv_0": {
                    "kernel": jnp.asarray(data[f"{name}.kernel"]),
                    "bias": jnp.asarray(data[f"{name}.bias"]),
                }
            }
    return {"params": params}
