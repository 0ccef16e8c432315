"""Layer-library parity tests vs torch."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from c2m_tpu.nn.layers import Conv3d


def test_conv3d_time_unrolled_matches_torch():
    """Our 2D-lowered Conv3d must equal a direct torch conv3d (reflect pad)."""
    rng = np.random.RandomState(0)
    b, t, h, w, c, o = 2, 6, 8, 10, 3, 5
    kt, kh, kw = 3, 4, 4
    st, sh, sw = 2, 2, 2
    pt, ph, pw = 1, 1, 1
    x = rng.randn(b, t, h, w, c).astype(np.float32)

    layer = Conv3d(o, (kt, kh, kw), (st, sh, sw), (pt, ph, pw),
                   padding_mode="reflect")
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(layer.apply(params, jnp.asarray(x)))

    kernel = np.asarray(params["params"]["Conv_0"]["kernel"])  # [kh,kw,kt*c,o]
    bias = np.asarray(params["params"]["Conv_0"]["bias"])
    wt = np.zeros((o, c, kt, kh, kw), np.float32)
    for dt in range(kt):
        for ci in range(c):
            wt[:, ci, dt] = kernel[:, :, dt * c + ci, :].transpose(2, 0, 1)

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCTHW
    pad = torch.nn.ReflectionPad3d((pw, pw, ph, ph, pt, pt))
    ref = F.conv3d(pad(xt), torch.from_numpy(wt), torch.from_numpy(bias),
                   stride=(st, sh, sw))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv3d_shapes_vae_config():
    """The VAE encoder's per-layer t/h/w shapes survive the lowering
    (dense_motion_encoder kernel lists, config yaml:113-121)."""
    from c2m_tpu.config import Config
    from c2m_tpu.models.dense_motion import DenseMotionEncoder
    cfg = Config()
    cfg.train_params.input_size = [64, 128]
    enc = DenseMotionEncoder(cfg.model_params.motion_estimator.dense_motion_encoder,
                             output_channel=512)
    x = jnp.zeros((1, 5, 64, 128, 31))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    out = enc.apply(variables, x, train=False,
                    mutable=["batch_stats"])[0]
    assert out["mu"].shape == (1, 512)
    assert out["logvar"].shape == (1, 512)


def test_deconv_torch_matches_convtranspose2d():
    """DeconvTorch (flownet2 deconv) must equal torch ConvTranspose2d(4,2,1),
    pinning the weight mapping for the flownet2 checkpoint converter."""
    from c2m_tpu.models.flownet2 import DeconvTorch
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    layer = DeconvTorch(4, act=False)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(layer.apply(params, jnp.asarray(x)))

    kernel = np.asarray(params["params"]["ConvTranspose_0"]["kernel"])
    bias = np.asarray(params["params"]["ConvTranspose_0"]["bias"])
    # expected torch layout [in, out, kh, kw]
    wt = np.transpose(kernel, (3, 2, 0, 1))
    ref = F.conv_transpose2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                             torch.from_numpy(wt), torch.from_numpy(bias),
                             stride=2, padding=1)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert out.shape == ref.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
