"""Flax layer library mirroring the reference's modules/layers/ semantics."""

from c2m_tpu.nn.layers import (
    Conv,
    Conv3d,
    Dense,
    DownBlock2d,
    DownBlock3d,
    InstanceNorm,
    ResidualBlock,
    SameBlock2d,
    SameBlock3d,
    SameBlockTwoConv2d,
    SpectralNormConv,
    UpBlock2d,
    fold_time,
    unfold_time,
    torch_kernel_init,
    torch_bias_init,
)
