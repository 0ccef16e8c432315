"""Golden tests: core ops vs PyTorch (CPU) reference semantics.

The reference's entire compute path hangs off a handful of torch primitives
(grid_sample/affine_grid/interpolate/scatter_add, src/utils/ops.py:183-275).
We verify our jnp implementations reproduce them bit-for-bit (fp32 tolerance)
— including the reference's mixed align_corners conventions.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from c2m_tpu.ops import (
    affine_grid,
    affine_warp_mask,
    corresponding_map,
    grid_sample_normalized,
    occlusion_map,
    resample,
    resize_bilinear,
    resize_flow,
    resize_nearest,
)

RNG = np.random.RandomState(0)


def torch_get_grid(b, rows, cols):
    # reference src/utils/ops.py:196-202 (CPU version)
    base_grid = torch.zeros([b, 2, rows, cols])
    lp = torch.linspace(-1, 1, cols) if cols > 1 else torch.Tensor([-1])
    base_grid[:, 0, :, :] = torch.ger(torch.ones(rows), lp)
    lp = torch.linspace(-1, 1, rows) if rows > 1 else torch.Tensor([-1])
    base_grid[:, 1, :, :] = torch.ger(lp, torch.ones(cols))
    return base_grid


def torch_resample(image, flow):
    # reference src/utils/ops.py:187-193 (CPU version)
    b, c, h, w = image.size()
    grid = torch_get_grid(b, h, w)
    flow = torch.cat([flow[:, 0:1] / ((w - 1.0) / 2.0),
                      flow[:, 1:2] / ((h - 1.0) / 2.0)], dim=1)
    final_grid = (grid + flow).permute(0, 2, 3, 1)
    return F.grid_sample(image, final_grid, mode="bilinear", padding_mode="border")


def nchw(x_jax):
    return np.transpose(np.asarray(x_jax), (0, 3, 1, 2))


class TestResample:
    @pytest.mark.parametrize("h,w", [(8, 16), (17, 31), (64, 128)])
    def test_matches_torch(self, h, w):
        img = RNG.randn(2, h, w, 3).astype(np.float32)
        flow = (RNG.randn(2, h, w, 2) * 3).astype(np.float32)
        ours = resample(jnp.asarray(img), jnp.asarray(flow))
        ref = torch_resample(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                             torch.from_numpy(np.transpose(flow, (0, 3, 1, 2))))
        # fp32 coordinate arithmetic orders differ slightly from torch's
        # normalized-grid path; 1e-4 absolute is well below visual precision.
        np.testing.assert_allclose(nchw(ours), ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_large_flow_border(self):
        img = RNG.randn(1, 12, 20, 2).astype(np.float32)
        flow = (RNG.randn(1, 12, 20, 2) * 50).astype(np.float32)  # far out of bounds
        ours = resample(jnp.asarray(img), jnp.asarray(flow))
        ref = torch_resample(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                             torch.from_numpy(np.transpose(flow, (0, 3, 1, 2))))
        np.testing.assert_allclose(nchw(ours), ref.numpy(), rtol=1e-5, atol=1e-5)

    def test_zero_flow_not_identity(self):
        # The reference's convention mix means zero flow is NOT an exact
        # identity (align_corners mismatch); parity with torch is the spec.
        img = RNG.randn(1, 10, 14, 1).astype(np.float32)
        flow = np.zeros((1, 10, 14, 2), np.float32)
        ours = resample(jnp.asarray(img), jnp.asarray(flow))
        ref = torch_resample(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                             torch.from_numpy(np.transpose(flow, (0, 3, 1, 2))))
        np.testing.assert_allclose(nchw(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


class TestAffine:
    @pytest.mark.parametrize("h,w", [(8, 16), (13, 9)])
    def test_affine_grid(self, h, w):
        theta = (np.eye(2, 3) + RNG.randn(2, 3) * 0.1).astype(np.float32)
        ours = affine_grid(jnp.asarray(theta), h, w)
        ref = F.affine_grid(torch.from_numpy(theta)[None], (1, 1, h, w),
                            align_corners=False)[0]
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_grid_sample_zeros(self):
        h, w = 10, 12
        img = RNG.randn(h, w, 2).astype(np.float32)
        theta = np.array([[0.9, 0.0, 0.3], [0.0, 1.1, -0.2]], np.float32)
        grid = affine_grid(jnp.asarray(theta), h, w)
        ours = grid_sample_normalized(jnp.asarray(img), grid, padding="zeros")
        tgrid = F.affine_grid(torch.from_numpy(theta)[None], (1, 1, h, w),
                              align_corners=False)
        ref = F.grid_sample(torch.from_numpy(np.transpose(img, (2, 0, 1)))[None],
                            tgrid, align_corners=False)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (2, 0, 1)), ref[0].numpy(),
            rtol=1e-5, atol=1e-5)

    def test_affine_warp_mask_flow(self):
        # reference DenseMotionNetwork.warp (dense_motion.py:161-168)
        h, w = 16, 24
        mask = np.zeros((h, w, 1), np.float32)
        mask[4:10, 6:14] = 1.0
        theta = np.array([[1.0, 0.0, 0.25], [0.0, 1.0, -0.125]], np.float32)
        warped, flow = affine_warp_mask(jnp.asarray(theta), jnp.asarray(mask))

        tt = torch.from_numpy(theta)[None]
        x = torch.from_numpy(np.transpose(mask, (2, 0, 1)))[None]
        grid = F.affine_grid(tt, x.size(), align_corners=False)
        base = torch_get_grid(1, h, w).permute(0, 2, 3, 1)
        tflow = grid - base
        tflow = torch.cat([tflow[..., 0:1] * ((w - 1.0) / 2.0),
                           tflow[..., 1:2] * ((h - 1.0) / 2.0)], dim=-1)
        twarped = F.grid_sample(x, grid, align_corners=False)
        np.testing.assert_allclose(np.asarray(warped)[..., 0], twarped[0, 0].numpy(),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(flow), tflow[0].numpy(),
                                   rtol=1e-4, atol=1e-4)


class TestSplat:
    def test_corresponding_map(self):
        # reference get_corresponding_map (ops.py:205-251)
        b, h, w = 2, 9, 11
        coords = (RNG.rand(b, h, w, 2) * np.array([w + 4, h + 4]) - 2).astype(np.float32)
        ours = corresponding_map(jnp.asarray(coords))

        data = torch.from_numpy(np.transpose(coords, (0, 3, 1, 2)))
        x = data[:, 0].reshape(b, -1)
        y = data[:, 1].reshape(b, -1)
        x1 = torch.floor(x); x_floor = x1.clamp(0, w - 1)
        y1 = torch.floor(y); y_floor = y1.clamp(0, h - 1)
        x0 = x1 + 1; x_ceil = x0.clamp(0, w - 1)
        y0 = y1 + 1; y_ceil = y0.clamp(0, h - 1)
        invalid = torch.cat([(x0 != x_ceil) | (y0 != y_ceil),
                             (x0 != x_ceil) | (y1 != y_floor),
                             (x1 != x_floor) | (y0 != y_ceil),
                             (x1 != x_floor) | (y1 != y_floor)], dim=1)
        cm = torch.zeros(b, h * w)
        indices = torch.cat([x_ceil + y_ceil * w, x_ceil + y_floor * w,
                             x_floor + y_ceil * w, x_floor + y_floor * w], 1).long()
        values = torch.cat([(1 - (x - x_ceil).abs()) * (1 - (y - y_ceil).abs()),
                            (1 - (x - x_ceil).abs()) * (1 - (y - y_floor).abs()),
                            (1 - (x - x_floor).abs()) * (1 - (y - y_ceil).abs()),
                            (1 - (x - x_floor).abs()) * (1 - (y - y_floor).abs())], 1)
        values[invalid] = 0
        cm.scatter_add_(1, indices, values)
        ref = cm.view(b, h, w)
        np.testing.assert_allclose(np.asarray(ours)[..., 0], ref.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_occlusion_map_range_and_holes(self):
        h, w = 16, 16
        flow = np.zeros((1, h, w, 2), np.float32)
        flow[0, :, :8, 0] = 8.0  # left half shifts right -> left area vacated
        occ = np.asarray(occlusion_map(jnp.asarray(flow)))[0, ..., 0]
        assert occ.min() >= 0.0 and occ.max() <= 1.0
        assert occ[:, :4].max() == 0.0          # vacated area has no mass
        assert occ[:, 12:].min() >= 1.0 - 1e-6  # doubly-covered area saturates


class TestResize:
    @pytest.mark.parametrize("mode,ac", [("bilinear", False), ("bilinear", True)])
    @pytest.mark.parametrize("hw,new", [((8, 12), (16, 24)), ((16, 24), (7, 5)),
                                        ((9, 7), (18, 14))])
    def test_bilinear(self, mode, ac, hw, new):
        x = RNG.randn(2, *hw, 3).astype(np.float32)
        ours = resize_bilinear(jnp.asarray(x), new, align_corners=ac)
        ref = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                            size=new, mode="bilinear", align_corners=ac)
        np.testing.assert_allclose(nchw(ours), ref.numpy(), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("hw,new", [((8, 12), (16, 24)), ((16, 24), (7, 5)),
                                        ((10, 6), (15, 9))])
    def test_nearest(self, hw, new):
        x = RNG.randn(1, *hw, 2).astype(np.float32)
        ours = resize_nearest(jnp.asarray(x), new)
        ref = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                            size=new, mode="nearest")
        np.testing.assert_allclose(nchw(ours), ref.numpy(), rtol=1e-6, atol=1e-6)

    def test_resize_flow(self):
        # reference utils/utils.py:346-354
        x = (RNG.randn(2, 8, 16, 2) * 4).astype(np.float32)
        new = (16, 32)
        ours = resize_flow(jnp.asarray(x), new)
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref = F.interpolate(t, new, mode="bilinear", align_corners=True)
        ref[:, 0] /= (8 * 16) / (16 * 32) ** 0  # placeholder, computed below
        ref = F.interpolate(t, new, mode="bilinear", align_corners=True)
        ref[:, 0] /= 16 / float(new[1])
        ref[:, 1] /= 8 / float(new[0])
        np.testing.assert_allclose(nchw(ours), ref.numpy(), rtol=1e-5, atol=1e-5)
