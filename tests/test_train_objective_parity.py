"""Training-OBJECTIVE parity: same converted weights, same batch -> every
loss term the reference computes must match here.

This certifies end-to-end what the unit tests cover piecewise: all 14
generator objectives (losses.py:205-255), the GAN/feature-matching losses
with the shared-forward D structure (model.py:101-122), and both
discriminator losses — computed by the reference's unmodified train-mode
forward vs our C2MTrainModel.__call__ on identical inputs.

Sampling is made deterministic on both sides: the VAE reparameterization is
patched to return mu, and the per-graph click choice is pinned (the
reference draws it with np.random inside forward, sparse_motion_estimator
.py:46-49 — we seed numpy and replay the same indices into our patched
sample_click_indices).
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch  # noqa: E402

from tests.ref_shims import add_ref_paths, randomize_bn_stats
from tests.test_c2m_converter import (B, H, N_OBJ, T_PRED, W, _build_inputs,
                                      _our_cfg, _ref_cfg)


@pytest.fixture(scope="module")
def objective_pair():
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
    # deterministic VAE sample: z = mu on both sides (restored at the end
    # of the fixture body via _orig_rep_t)
    _orig_rep_t = DenseMotionNetwork.reparameterize
    DenseMotionNetwork.reparameterize = staticmethod(lambda mu, logvar: mu)

    ref_in, our_batch = _build_inputs(integer_disp=True)
    g = torch.Generator().manual_seed(9)
    tgt_of = torch.randn((B, 2, T_PRED, H, W), generator=g) * 2.0
    tgt_occ = (torch.rand((B, 1, T_PRED, H, W), generator=g) > 0.2).float()
    data = dict(ref_in)
    data["target_bw_of"] = tgt_of
    data["target_bw_occ"] = tgt_occ

    # replay the reference's internal click draw
    np.random.seed(123)
    clicks = np.array([np.random.random_integers(0, N_OBJ - 1)
                       for _ in range(B)], np.int32)
    np.random.seed(123)
    with torch.no_grad():
        _, loss_gen, loss_di, loss_dv = c2m(data)
    DenseMotionNetwork.reparameterize = _orig_rep_t   # un-leak class patch
    ref_losses = {k: float(v) for k, v in loss_gen.items()}
    ref_di = {k: float(v) for k, v in loss_di.items()}
    ref_dv = {k: float(v) for k, v in loss_dv.items()}

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
    orig_rep = c2m_mod.reparameterize
    orig_click = c2m_mod.sample_click_indices
    click_mask = jax.nn.one_hot(jnp.asarray(clicks), N_OBJ,
                                dtype=jnp.float32)
    c2m_mod.reparameterize = lambda rng, mu, logvar: mu
    c2m_mod.sample_click_indices = \
        lambda rng, nrn, nmax: (jnp.asarray(clicks), click_mask)
    try:
        from c2m_tpu.train.model import C2MTrainModel
        model = C2MTrainModel(cfg)
        (out, loss_dict, ldi, ldv), _ = model.apply(
            {"params": tree["params"], "batch_stats": tree["batch_stats"],
             "spectral": tree["spectral"]},
            our_batch, True, mutable=["batch_stats", "spectral"],
            rngs={"sample": jax.random.PRNGKey(0)})
    finally:
        c2m_mod.reparameterize = orig_rep
        c2m_mod.sample_click_indices = orig_click
    ours = {k: float(v) for k, v in loss_dict.items()}
    ours_di = {k: float(v) for k, v in ldi.items()}
    ours_dv = {k: float(v) for k, v in ldv.items()}
    return ref_losses, ref_di, ref_dv, ours, ours_di, ours_dv


def test_generator_objective_terms_match(objective_pair):
    ref, _, _, ours, _, _ = objective_pair
    assert set(ref) == set(ours), (sorted(ref), sorted(ours))
    for k in sorted(ref):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=2e-3, atol=2e-4,
            err_msg=f"loss term {k}: ref {ref[k]} vs ours {ours[k]}")


def test_discriminator_losses_match(objective_pair):
    _, ref_di, ref_dv, _, ours_di, ours_dv = objective_pair
    for ref, got, name in ((ref_di, ours_di, "image"),
                           (ref_dv, ours_dv, "video")):
        assert set(ref) == set(got), name
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=2e-3,
                                       atol=2e-4, err_msg=f"{name}:{k}")
