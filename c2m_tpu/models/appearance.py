"""Appearance encoder: conv pyramid + per-object ROI features.

Reference: src/modules/appearance_encoder/appearance_encoder.py:8-79.
Encodes the conditioning frame stack (RGB + 20ch seg one-hot + instance map)
through ``num_down_blocks`` strided conv blocks, exposing every intermediate
as a skip feature; pools per-object ROI features at the ``pooling_after``
level and fuses them with the flattened bottleneck code.

TPU-native changes: PyG ragged node lists -> padded dense ``[B, N, ...]``
tensors with a validity mask; boxes in (x1, y1, x2, y2) (see ops/roi.py for
the reference's box-ordering quirk). num_input_frames > 1 concatenates frames
on channels throughout (the reference's grouped-width arithmetic,
appearance_encoder.py:27-33, collapses to the same thing at nif=1).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from c2m_tpu.config import AppearanceEncoderParams, TrainParams
from c2m_tpu.nn.layers import Dense, DownBlock2d, SameBlock2d
from c2m_tpu.ops.roi import roi_align


class AppearanceEncoder(nn.Module):
    params: AppearanceEncoderParams
    train_params: TrainParams
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, first_frame: jnp.ndarray, rois_padded: jnp.ndarray,
                 node_mask: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        """first_frame: [B, H, W, C_in]; rois_padded: [B, N, 4] (x1,y1,x2,y2 px);
        node_mask: [B, N] bool. Returns enco{i}, app_encoded, objects_feature."""
        p = self.params
        out: Dict[str, jnp.ndarray] = {}
        x = first_frame
        for i in range(p.num_down_blocks):
            features = min(p.max_expansion, p.block_expansion * (2 ** i))
            x = DownBlock2d(features, kernel_size=4, strides=2, padding=1,
                            padding_mode=p.padding_mode, use_norm=True,
                            dtype=self.dtype, name=f"down_{i}")(x, train=train)
            key = "app_encoded" if i == p.num_down_blocks - 1 else f"enco{i}"
            out[key] = x

        # Per-object ROI features at the pooling_after level
        # (appearance_encoder.py:39-51): feature stride there is
        # 2**pooling_after relative to the input image.
        roi_out = p.block_expansion * (2 ** p.pooling_after)
        feats = out[f"enco{p.pooling_after - 1}"]
        pooled = roi_align(feats.astype(jnp.float32),
                           rois_padded.astype(jnp.float32),
                           output_size=p.pool_size,
                           spatial_scale=1.0 / (2 ** p.pooling_after))
        b, n = pooled.shape[:2]
        pooled = pooled.reshape(b * n, p.pool_size, p.pool_size, -1).astype(
            feats.dtype)
        obj = SameBlock2d(roi_out * 2, kernel_size=p.pool_size, strides=1,
                          padding=0, padding_mode=p.padding_mode, use_norm=False,
                          dtype=self.dtype, name="roi_conv")(pooled)
        obj = obj.reshape(b * n, -1)
        obj = Dense(roi_out * 2, dtype=self.dtype, name="roi_fc")(obj)
        obj = Dense(roi_out, dtype=self.dtype, name="roi_regressor")(obj)

        scene = out["app_encoded"].reshape(b, -1)
        scene_rep = jnp.repeat(scene[:, None, :], n, axis=1).reshape(b * n, -1)
        fused = Dense(roi_out, dtype=self.dtype, name="fuse_appearance_roi")(
            jnp.concatenate([scene_rep, obj], axis=-1))
        out["objects_feature"] = (fused.reshape(b, n, roi_out)
                                  * node_mask[..., None].astype(fused.dtype))
        return out
