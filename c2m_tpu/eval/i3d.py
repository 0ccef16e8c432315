"""I3D (Inflated Inception-V1) in Flax — the FVD embedding network.

Reference: src/utils/fvd/fvd.py:70-127 drives a TF-Hub kinetics I3D inside a
TF1 session (SURVEY.md §2.6). Here the same architecture runs natively in
JAX: DeepMind's kinetics I3D (Carreira & Zisserman), Unit3D = conv3d + BN(eps
1e-3, no scale) + relu, SAME padding, inception channel spec of GoogLeNet.
FVD uses the pre-logits 1024-d spatiotemporal average ("embedding") —
``InceptionI3d.__call__(..., endpoint="embedding")``.

Weights: tools converter pending a locally available checkpoint (zero-egress);
the Frechet math in eval/fid.py applies unchanged to these embeddings.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class Unit3D(nn.Module):
    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.stride), padding="SAME",
                    use_bias=not self.use_bn)(x)
        if self.use_bn:
            # TF I3D BN has no gamma (center-only); keeping a scale param
            # initialized to 1 is equivalent and lets torch-layout
            # checkpoints (affine BN) convert losslessly.
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(x)
        return nn.relu(x) if self.act else x


def _maxpool3d_same(x, window, stride):
    # SAME max pooling over (T, H, W)
    pads = []
    for size, k, s in zip(x.shape[1:4], window, stride):
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        pads.append((total // 2, total - total // 2))
    x = jnp.pad(x, ((0, 0), *pads, (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, tuple(window), strides=tuple(stride),
                       padding="VALID")


class InceptionModule(nn.Module):
    channels: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        b0 = Unit3D(c[0], name="Branch_0")(x, train)
        b1 = Unit3D(c[1], name="Branch_1a")(x, train)
        b1 = Unit3D(c[2], (3, 3, 3), name="Branch_1b")(b1, train)
        b2 = Unit3D(c[3], name="Branch_2a")(x, train)
        b2 = Unit3D(c[4], (3, 3, 3), name="Branch_2b")(b2, train)
        b3 = _maxpool3d_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], name="Branch_3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class InceptionI3d(nn.Module):
    """Input [B, T, H, W, 3] (T >= 9, 224x224 canonical) scaled to [-1, 1]."""
    num_classes: int = 400

    @nn.compact
    def __call__(self, x, train: bool = False, endpoint: str = "embedding"):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x, train)
        x = _maxpool3d_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x, train)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x, train)
        x = _maxpool3d_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x, train)
        x = InceptionModule((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x, train)
        x = _maxpool3d_same(x, (3, 3, 3), (2, 2, 2))
        x = InceptionModule((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x, train)
        x = InceptionModule((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x, train)
        x = InceptionModule((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x, train)
        x = InceptionModule((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x, train)
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x, train)
        x = _maxpool3d_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x, train)
        x = InceptionModule((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x, train)
        emb = jnp.mean(x, axis=(1, 2, 3))  # [B, 1024] FVD embedding
        if endpoint == "embedding":
            return emb
        logits = Unit3D(self.num_classes, use_bn=False, act=False,
                        name="Logits")(x, train)
        return jnp.mean(logits, axis=(1, 2, 3))


def compute_fvd(real_emb, fake_emb) -> float:
    """Frechet distance over I3D embeddings (fvd/score.py semantics)."""
    from c2m_tpu.eval.fid import compute_fid
    return compute_fid(real_emb, fake_emb)
