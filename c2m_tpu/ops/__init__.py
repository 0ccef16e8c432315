"""Core tensor ops: warping, splatting, rasterization, torch-parity resizes."""

from c2m_tpu.ops.warp import (
    affine_flow,
    affine_grid,
    affine_warp_mask,
    bilinear_sample,
    grid_sample_normalized,
    resample,
    resize_bilinear,
    resize_flow,
    resize_nearest,
    resize_video,
    set_pallas_enabled,
)
from c2m_tpu.ops.splat import clip_mask, corresponding_map, occlusion_map
from c2m_tpu.ops.raster import generate_sparse_motion

__all__ = [
    "affine_flow", "affine_grid", "affine_warp_mask", "bilinear_sample",
    "grid_sample_normalized", "resample", "resize_bilinear", "resize_flow",
    "resize_nearest", "resize_video", "set_pallas_enabled",
    "clip_mask", "corresponding_map", "occlusion_map",
    "generate_sparse_motion",
]
