"""PatchGAN discriminators (reference: src/modules/discriminator/discriminator.py).

``PatchDiscriminator``: 4 strided conv blocks + spectral-norm 1x1 prediction
head, returning all intermediate feature maps (for feature matching) and the
prediction map. ``MultiScaleDiscriminator`` wraps num_D of them (num_D=1 in
the shipped config). Init: normal(0, 0.02) convs / BN weight normal(1, 0.02)
per the reference's ``weights_init`` (discriminator.py:10-22).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from c2m_tpu.config import DiscriminatorParams
from c2m_tpu.nn.layers import BatchNorm, SpectralNormConv, _pad_spatial, leaky


def _dcgan_init(dtype=jnp.float32):
    return nn.initializers.normal(stddev=0.02, dtype=dtype)


class _DiscDownBlock(nn.Module):
    """DownBlock2d with the discriminator's normal(0.02) init."""
    features: int
    padding_mode: str = "reflect"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _pad_spatial(x, [(1, 1), (1, 1)],
                         self.padding_mode if self.padding_mode != "zeros"
                         else "constant")
        x = nn.Conv(self.features, (4, 4), strides=(2, 2), padding="VALID",
                    kernel_init=_dcgan_init(),
                    bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        # weights_init: BatchNorm weight ~ N(1, 0.02)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5,
                         scale_init=lambda key, shape, dtype=jnp.float32:
                             1.0 + 0.02 * jax.random.normal(key, shape, dtype),
                         dtype=self.dtype)(x)
        return leaky(x)


class PatchDiscriminator(nn.Module):
    params: DiscriminatorParams
    max_features: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        p = self.params
        feature_maps = []
        out = x
        for i in range(p.n_layers_D):
            features = min(self.max_features, p.ndf * (2 ** (i + 1)))
            out = _DiscDownBlock(features, padding_mode=p.padding_mode,
                                 dtype=self.dtype,
                                 name=f"down_{i}")(out, train=train)
            feature_maps.append(out)
        pred = SpectralNormConv(1, kernel_size=1, dtype=self.dtype,
                                name="pred")(out, train=train)
        return feature_maps, pred.astype(jnp.float32)


class MultiScaleDiscriminator(nn.Module):
    params: DiscriminatorParams
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        out = {}
        for scale in range(self.params.num_D):
            fmaps, pred = PatchDiscriminator(self.params, dtype=self.dtype,
                                             name=f"disc_{scale}")(x, train=train)
            out[f"feature_maps_{scale}"] = fmaps
            out[f"prediction_map_{scale}"] = pred
        return out
