"""FID: Frechet distance between InceptionV3 pool3 activation statistics.

Reference: src/utils/fid.py — torchvision InceptionV3 (pool3, 2048-d) +
Frechet distance. The distance math is exact numpy here; the embedding is
pluggable: torchvision's pretrained InceptionV3 when its weights exist in the
local cache (zero-egress environment — no download), else callers get a
clear "unavailable" signal instead of silently-wrong numbers.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from scipy import linalg


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (fid.py:112-190)."""
    diff = mu1 - mu2
    covmean = np.asarray(linalg.sqrtm(sigma1.dot(sigma2)))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_fid(real_acts: np.ndarray, fake_acts: np.ndarray) -> float:
    return frechet_distance(*activation_statistics(real_acts),
                            *activation_statistics(fake_acts))


_INCEPTION = None


def inception_embedder(batch_size: int = 16) -> Optional[Callable]:
    """Returns fn(images [N, H, W, 3] in [0,1]) -> [N, 2048], or None when the
    pretrained weights are not locally available."""
    global _INCEPTION
    if _INCEPTION is None:
        try:
            import torch
            import torchvision
            net = torchvision.models.inception_v3(weights="DEFAULT",
                                                  transform_input=False)
            net.fc = torch.nn.Identity()
            net.eval()
            _INCEPTION = net
        except Exception:
            _INCEPTION = False
    if _INCEPTION is False:
        return None

    import torch
    import torch.nn.functional as F
    net = _INCEPTION

    @torch.no_grad()
    def embed(images: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(images), batch_size):
            x = torch.from_numpy(images[i:i + batch_size]).permute(0, 3, 1, 2)
            x = F.interpolate(x.float(), size=(299, 299), mode="bilinear",
                              align_corners=False)
            x = x * 2.0 - 1.0  # inception expects [-1, 1]
            outs.append(net(x).numpy())
        return np.concatenate(outs)

    return embed
