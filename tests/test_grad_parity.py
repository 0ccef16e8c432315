"""GRADIENT parity: the reference's update_model runs three backwards
(trainer.py:138-165 — D-image loss, D-video loss, weighted generator total)
with .detach() boundaries; we compute ONE combined scalar with
stop_gradient at the same boundaries (train/step.py). Sum-of-backwards ==
grad-of-sum only if every boundary matches — including the reference's
quirk that the generator's GAN terms deposit gradients INTO the
discriminator parameters (pred_fake is not weight-detached,
model.py:104-109). This test compares d(total)/d(param) numerically for
parameters spanning all four optimizer groups.

Heavy (a torch backward + a jax.grad compile at 128x256):
C2M_HEAVY_TESTS=1.
"""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch  # noqa: E402

from tests.ref_shims import add_ref_paths, randomize_bn_stats
from tests.test_c2m_converter import (B, H, N_OBJ, T_PRED, W, _build_inputs,
                                      _our_cfg, _ref_cfg)

pytestmark = pytest.mark.skipif(
    os.environ.get("C2M_HEAVY_TESTS") != "1", reason="set C2M_HEAVY_TESTS=1")

# (reference param, our params path, transform)
_PROBES = [
    ("generator.final.0.weight",
     ("c2m", "generator", "final", "Conv_0", "kernel"), "conv2d"),
    ("appearance_encoder.down_blocks.0.conv.weight",
     ("c2m", "appearance_encoder", "down_0", "Conv_0", "Conv_0", "kernel"),
     "conv2d"),
    ("motion_encoder.dense_generator_bw.final_fuse.conv.weight",
     ("c2m", "dense_generator_bw", "final_fuse", "Conv3d_0", "Conv_0",
      "kernel"), "conv3d"),
    ("motion_encoder.motion_encoder_bg.fc2.bias",
     ("c2m", "motion_encoder_bg", "fc_logvar", "Dense_0", "bias"), "none"),
    ("motion_encoder.sparse_motion_estimator.decoder.loc_time_steps.0.0.weight",
     ("c2m", "sparse_motion_estimator", "loc_0", "fc1", "Dense_0", "kernel"),
     "linear"),
    ("netD_image.discs.0.down_blocks.0.conv.weight",
     ("netd_image", "disc_0", "down_0", "Conv_0", "kernel"), "conv2d"),
    ("netD_video.discs.0.conv.weight_orig",
     ("netd_video", "disc_0", "pred", "kernel"), "conv2d"),
    ("netD_image.discs.0.conv.bias",
     ("netd_image", "disc_0", "pred", "bias"), "none"),
]


def _xform(g, kind):
    from tools.convert_c2m import _conv2d, _conv3d, _linear
    return {"conv2d": _conv2d, "conv3d": _conv3d, "linear": _linear,
            "none": lambda x: x}[kind](g)


def test_gradients_match_reference():
    torch.Tensor.cuda = lambda self, *a, **k: self
    add_ref_paths()
    tp, mp = _ref_cfg()
    import torchvision
    from tests.test_converters import _torch_vgg19_features
    _orig_vgg19 = torchvision.models.vgg19
    torchvision.models.vgg19 = lambda *a, **k: types.SimpleNamespace(
        features=_torch_vgg19_features())
    from modules.model import GeneratorFullModel
    from modules.motion_estimator.dense_motion import DenseMotionNetwork
    torch.manual_seed(0)
    c2m = GeneratorFullModel(train_params=tp, model_params=mp,
                             is_inference=False, dataset="cityscapes")
    torchvision.models.vgg19 = _orig_vgg19   # un-leak the process-wide patch
    randomize_bn_stats(c2m, seed=7)
    c2m.train()
    _orig_rep_t = DenseMotionNetwork.reparameterize
    DenseMotionNetwork.reparameterize = staticmethod(lambda mu, logvar: mu)

    ref_in, our_batch = _build_inputs(integer_disp=True)
    g = torch.Generator().manual_seed(9)
    tgt_of = torch.randn((B, 2, T_PRED, H, W), generator=g) * 2.0
    tgt_occ = (torch.rand((B, 1, T_PRED, H, W), generator=g) > 0.2).float()
    data = dict(ref_in)
    data["target_bw_of"] = tgt_of
    data["target_bw_occ"] = tgt_occ

    np.random.seed(123)
    clicks = np.array([np.random.random_integers(0, N_OBJ - 1)
                       for _ in range(B)], np.int32)

    # reference: the exact update_model gradient accumulation
    # (trainer.py:138-165), no optimizer steps
    loss_weights = tp["loss_weights"]
    for p in c2m.parameters():
        p.grad = None
    np.random.seed(123)
    _, loss_gen, ldi, ldv = c2m(data)
    ((ldi.get("d_real", 0) + ldi.get("d_fake", 0)) * 0.5).backward(
        retain_graph=True)
    ((ldv.get("d_real", 0) + ldv.get("d_fake", 0)) * 0.5).backward(
        retain_graph=True)
    total = torch.tensor(0.0)
    for k in loss_gen:
        total = total + loss_gen[k] * loss_weights[k]
    total.backward()
    DenseMotionNetwork.reparameterize = _orig_rep_t   # un-leak class patch
    named = dict(c2m.named_parameters())
    ref_grads = {}
    for ref_name, _, kind in _PROBES:
        gt = named[ref_name].grad
        assert gt is not None, ref_name
        ref_grads[ref_name] = _xform(gt.detach().numpy(), kind)

    # ours: grad of the one combined scalar (train/step.py loss_fn)
    from tools.convert_c2m import convert_state_dict
    cfg = _our_cfg()
    sd = {k: v.numpy() for k, v in c2m.state_dict().items()}
    tree = convert_state_dict(sd, cfg)
    our_batch = dict(our_batch)
    our_batch["target_bw_of"] = jnp.asarray(
        tgt_of.numpy().transpose(0, 2, 3, 4, 1))
    our_batch["target_bw_occ"] = jnp.asarray(
        tgt_occ.numpy().transpose(0, 2, 3, 4, 1))

    import c2m_tpu.models.c2m as c2m_mod
    from c2m_tpu.train.model import (C2MTrainModel, total_discriminator_loss,
                                     total_generator_loss)
    orig_rep = c2m_mod.reparameterize
    orig_click = c2m_mod.sample_click_indices
    click_mask = jax.nn.one_hot(jnp.asarray(clicks), N_OBJ,
                                dtype=jnp.float32)
    c2m_mod.reparameterize = lambda rng, mu, logvar: mu
    c2m_mod.sample_click_indices = \
        lambda rng, nrn, nmax: (jnp.asarray(clicks), click_mask)
    try:
        model = C2MTrainModel(cfg)

        def loss_fn(params):
            (out, ld, di, dv), _ = model.apply(
                {"params": params, "batch_stats": tree["batch_stats"],
                 "spectral": tree["spectral"]},
                our_batch, True, mutable=["batch_stats", "spectral"],
                rngs={"sample": jax.random.PRNGKey(0)})
            return (total_generator_loss(cfg, ld)
                    + total_discriminator_loss(di)
                    + total_discriminator_loss(dv))

        grads = jax.jit(jax.grad(loss_fn))(tree["params"])
    finally:
        c2m_mod.reparameterize = orig_rep
        c2m_mod.sample_click_indices = orig_click

    # Tolerance calibration (round 5, bisect recorded in STATUS.md): with
    # the GAN/FM weights zeroed the generator.final gradient matches torch
    # to 1.85e-4 max rel (cos 1.0); every discrepancy beyond that enters
    # through (a) the discriminator path, whose train-mode BatchNorm
    # backward amplifies fp32 reassociation exactly like the sharding/
    # remat equivalence tests document (STATUS round-2 SPMD notes), and
    # (b) measure-zero bilinear-kink subgradient flips at raster/roi box
    # boundaries (8/12288 elements at the appearance probe — the same
    # class as the converter tests' winner-flip pixels). Full-gradient
    # agreement measures cos 0.999980. A wrong stop_gradient boundary
    # drops/adds a whole term instead: cos well below the gate, a norm-
    # ratio shift, or a large violating FRACTION — all three asserted.
    for ref_name, path, _ in _PROBES:
        got = grads
        for p in path:
            got = got[p]
        got = np.asarray(got)
        want = ref_grads[ref_name]
        assert got.shape == want.shape, ref_name
        scale = max(np.abs(want).max(), 1e-8)
        frac_off = float((np.abs(got - want) / scale > 2e-2).mean())
        assert frac_off < 0.06, (
            f"gradient mismatch at {ref_name}: {frac_off:.2%} of elements "
            f"beyond 2e-2 of |ref| max {np.abs(want).max():.3g}")
        # direction + magnitude agreement carry the boundary-mistake
        # detection (a dropped/extra gradient term shifts both)
        ng, nw = np.linalg.norm(got), np.linalg.norm(want)
        if ng * nw > 1e-12:
            cos = float((got * want).sum() / (ng * nw))
            # the dense-decoder fuse probe's gradient passes through the
            # resample's flow-derivative (image finite differences at
            # border-clamped / bilinear-kink samples, where torch
            # grid_sample backward and the gather formulation take
            # different one-sided values); measured cos 0.9977 there vs
            # >0.9995 on every other probe — gate it at its noise class
            gate = 0.995 if "final_fuse" in ref_name else 0.9995
            assert cos > gate, (ref_name, cos)
            # final_fuse measures cos 0.9977 / ~2% norm shrink in the FULL
            # comparison but cos 0.999996 / norm 0.99974 with GAN+FM
            # weights zeroed (and d(resample)/d(flow) matches torch exactly
            # in isolation, incl. border-clamped samples) — the deviation
            # is entirely the discriminator-path BatchNorm-backward noise
            # class, amplified by this probe's longer chain; STATUS
            # round-5 notes record both micro-experiments
            lo, hi = ((0.95, 1.05) if "final_fuse" in ref_name
                      else (0.98, 1.02))
            assert lo < ng / nw < hi, (ref_name, ng / nw)
