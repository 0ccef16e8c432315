"""Correlation (cost volume) op — TPU-native equivalent of the reference's
CUDA extension (src/modules/third_party/correlation_package, SURVEY.md §2.7).

FlowNetC config (flownet_c.py:44-46): pad 20, max_displacement 20, kernel 1,
stride1 1, stride2 2 -> output channels ((2*20/2)+1)^2 = 441, each the
channel-mean dot product of feature A at x with feature B at x + d over the
strided displacement grid.

jnp formulation: pad B spatially, slice per displacement, channel-mean of the
product. The displacement loop unrolls into 441 fused multiply-reduce ops —
cheap at FlowNetC's 1/8-resolution feature maps; a Pallas VMEM-tiled kernel is
the upgrade path if this ever dominates a profile.
"""

from __future__ import annotations

import jax.numpy as jnp


def correlation(a: jnp.ndarray, b: jnp.ndarray, max_displacement: int = 20,
                stride: int = 2) -> jnp.ndarray:
    """a, b: [B, H, W, C] -> [B, H, W, D*D] with D = 2*(md//stride) + 1.

    Channel order matches the reference CUDA kernel: displacement rows scan
    dy from -md..md (step ``stride``), dx fastest.
    """
    bsz, h, w, c = a.shape
    md = max_displacement
    padded = jnp.pad(b, ((0, 0), (md, md), (md, md), (0, 0)))
    outs = []
    for dy in range(-md, md + 1, stride):
        for dx in range(-md, md + 1, stride):
            shifted = padded[:, md + dy:md + dy + h, md + dx:md + dx + w, :]
            outs.append(jnp.mean(a * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


def channel_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel L2 norm across channels (channelnorm CUDA ext equivalent,
    SURVEY.md §2.7 — 'trivial jnp.linalg.norm')."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
