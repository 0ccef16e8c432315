"""Pallas TPU kernel: correlation cost volume (FlowNetC).

The jnp reference (c2m_tpu/ops/correlation.py) unrolls 441 shifted
multiply-reduce ops — 441 reads of the (padded) B feature map from HBM unless
XLA fuses them. This kernel keeps A and the padded B window resident in VMEM
and sweeps all displacements in-core: one HBM read of each input, one write
of the [H, W, D*D] output. Displacement slices use dynamic starts (pl.ds)
computed from the grid index — static shapes, no gather.

Grid: (batch, n_offsets). The A/B blocks map to the same block for every
offset step so the pipeline keeps them in VMEM across the inner grid axis.

Measured reality check (v5e, 64x128x256 features): XLA fuses the unrolled jnp
version to ~0.04 ms — already optimal — so the jnp path stays the default and
this kernel is the parity-tested Pallas alternative (useful reference for
larger cost volumes / future fusions).

Known Mosaic limitation on hardware: the dynamic sublane start ``dy`` has
stride 2, which Mosaic cannot prove is 8-aligned ("cannot statically prove
that index in dimension 2 is a multiple of 8"); the kernel runs under
``interpret=True`` (CI parity tests) but needs a static-dy restructuring
(grid over 8-aligned blocks + in-kernel static remainder unroll) before it
lowers on TPU. Tracked for a future round; not blocking since the XLA path
wins at every current operating point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _corr_kernel(md: int, stride: int, a_ref, bpad_ref, out_ref):
    k = pl.program_id(1)
    n_per_row = 2 * (md // stride) + 1
    dy = (k // n_per_row) * stride          # 0 .. 2*md, step stride
    dx = (k % n_per_row) * stride
    h = a_ref.shape[1]
    w = a_ref.shape[2]
    b_win = bpad_ref[0, pl.ds(dy, h), pl.ds(dx, w), :]
    prod = a_ref[0].astype(jnp.float32) * b_win.astype(jnp.float32)
    out_ref[0, 0, :, :] = jnp.mean(prod, axis=-1)


def correlation_pallas(a: jnp.ndarray, b: jnp.ndarray,
                       max_displacement: int = 20, stride: int = 2
                       ) -> jnp.ndarray:
    """a, b: [B, H, W, C] -> [B, H, W, D*D]; matches ops.correlation exactly."""
    bsz, h, w, c = a.shape
    md = max_displacement
    d = 2 * (md // stride) + 1
    n_off = d * d
    b_pad = jnp.pad(b, ((0, 0), (md, md), (md, md), (0, 0)))

    return pl.pallas_call(
        functools.partial(_corr_kernel, md, stride),
        grid=(bsz, n_off),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, k: (i, 0, 0, 0)),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda i, k: (i, 0, 0, 0)),
        ],
        # output laid out [B, K, H, W] so the (sublane, lane) dims are the
        # full spatial plane (TPU block-shape constraint), transposed after
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, k: (i, k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n_off, h, w), jnp.float32),
    )(a, b_pad).transpose(0, 2, 3, 1)
