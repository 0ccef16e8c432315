"""Full training model: generator stack + discriminators + frozen VGG.

Reference: GeneratorFullModel (src/modules/model.py:30-239) — but pure: the
torch class owns 4 optimizers and calls .backward() three times
(trainer.py:138-165); gradients from the D losses AND from the G-GAN terms
(which flow through D params — the reference does not detach D when
backprop'ing the generator loss) all accumulate before each optimizer steps.
One combined scalar with stop_gradient at exactly the reference's detach
boundaries reproduces that gradient flow bit-for-bit under jax.grad.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from c2m_tpu.config import Config
from c2m_tpu.losses.losses import (feature_matching_loss, gan_mse_loss,
                                   l1_masked, perceptual_loss_folded,
                                   ssim_loss_folded, training_losses)
from c2m_tpu.models.c2m import C2MGenerator
from c2m_tpu.models.discriminator import MultiScaleDiscriminator
from c2m_tpu.nn.layers import fold_time
from c2m_tpu.nn.vgg import Vgg19Features

Batch = Dict[str, jnp.ndarray]


class C2MTrainModel(nn.Module):
    cfg: Config
    dataset: str = ""  # "" -> cfg.dataset_params.dataset

    def setup(self):
        cfg = self.cfg
        self.c2m = C2MGenerator(cfg, dataset=self.dataset)
        tp = cfg.train_params
        # the loss tail (discriminators + frozen VGG) follows the same
        # computation dtype as the generator stack (train_params.dtype):
        # params/BN stats/spectral-u stay fp32, only conv compute casts,
        # and the loss reductions accumulate fp32 (losses.py)
        from c2m_tpu.models.c2m import _dtype_of
        dtype = _dtype_of(cfg)
        # discriminators share C2MGenerator's remat policy/segments
        # (models/c2m.py): segment name "discs"
        from c2m_tpu.nn.remat import make_policy, parse_segments
        disc_cls = (nn.remat(MultiScaleDiscriminator, static_argnums=(2,),
                             policy=make_policy(tp.remat_policy))
                    if tp.remat and "discs" in parse_segments(
                        tp.remat_segments)
                    else MultiScaleDiscriminator)
        if tp.use_image_discriminator:
            self.netd_image = disc_cls(cfg.model_params.discriminator,
                                       dtype=dtype)
        if tp.use_video_discriminator:
            self.netd_video = disc_cls(cfg.model_params.discriminator,
                                       dtype=dtype)
        if tp.loss_weights.perceptual > 0:
            self.vgg = Vgg19Features(dtype=dtype)

    def _gan_losses(self, netd, real: jnp.ndarray, fake: jnp.ndarray,
                    train: bool):
        """compute_loss_d (model.py:101-122): D on real, D on detached fake,
        D on attached fake; LSGAN + feature matching."""
        pred_real = netd(real, train)
        pred_fake_det = netd(jax.lax.stop_gradient(fake), train)
        d_real = gan_mse_loss(pred_real["prediction_map_0"], True)
        d_fake = gan_mse_loss(pred_fake_det["prediction_map_0"], False)
        pred_fake = netd(fake, train)
        g_gan = gan_mse_loss(pred_fake["prediction_map_0"], True)
        fm = feature_matching_loss(pred_real["feature_maps_0"],
                                   pred_fake["feature_maps_0"])
        return d_real, d_fake, g_gan, fm

    def _scan_tail_losses(self, batch: Batch, out: Dict[str, jnp.ndarray],
                          train: bool):
        """Generated-frame losses (reconstruction, ssim, perceptual, image-D)
        as an nn.scan over chunks of ``train_params.scan_frames`` frames.

        Numerically equal to the folded versions up to summation order: every
        term is a mean over equal-size chunks, so averaging chunk means equals
        the folded mean. Deviations in train mode only: D BatchNorm stats are
        per-chunk and the spectral power iteration advances once per chunk
        (vs once per folded batch) — both the regrouping class the
        reference's unsynced DDP BatchNorm already exhibits. This is what
        bounds the full-res loss tail (VGG19 + D at 512x1024) to one chunk's
        activations (VERDICT r2 #1).
        """
        tp = self.cfg.train_params
        w = tp.loss_weights
        k = tp.scan_frames
        tpred = tp.num_predicted_frames
        nc = tpred // k
        nif = tp.num_input_frames
        use_vgg = w.perceptual > 0
        use_d = tp.use_image_discriminator

        b = batch["video"].shape[0]

        def to_chunks(x):  # [B, T, ...] -> [nc, B*k, ...]
            x = x.reshape(b, nc, k, *x.shape[2:])
            return jnp.moveaxis(x, 1, 0).reshape(nc, b * k, *x.shape[3:])

        tgt_chunks = to_chunks(batch["video"][:, nif:])
        gen_chunks = to_chunks(out["generated"])

        zero = jnp.zeros((), jnp.float32)
        init = {"reconstruction": zero, "ssim": zero}
        if use_vgg:
            init["perceptual"] = zero
            if w.style > 0:
                init["style"] = zero
        if use_d:
            init.update(g_gan_image=zero, feature_matching_image=zero,
                        d_real=zero, d_fake=zero)

        def body(mdl, acc, xs):
            tgt, gen, is_last = xs                      # [B*k, H, W, 3], []
            acc = dict(acc)
            acc["reconstruction"] += l1_masked(gen, tgt)
            acc["ssim"] += ssim_loss_folded(gen, tgt)
            if use_vgg:
                p = perceptual_loss_folded(mdl.vgg, tgt, gen,
                                           style_weight=w.style)
                acc["perceptual"] += p["perceptual"]
                if w.style > 0:
                    acc["style"] += p["style"]
            if use_d:
                d_real, d_fake, g_gan, fm = mdl._gan_losses(
                    mdl.netd_image, tgt, gen, train)
                # GAN losses use only the LAST batch element (the reference's
                # GANLoss [-1] quirk, losses.gan_mse_loss) — the folded [-1]
                # lives in the final chunk, so only that chunk contributes
                acc["g_gan_image"] += jnp.where(is_last, g_gan, 0.0)
                acc["feature_matching_image"] += fm
                acc["d_real"] += jnp.where(is_last, d_real, 0.0)
                acc["d_fake"] += jnp.where(is_last, d_fake, 0.0)
            return acc, None

        # remat the body so scan's backward recomputes each chunk instead of
        # stacking every chunk's VGG/D activations (which would void the
        # memory win). Collections are carried only when mutable in this
        # apply; otherwise read broadcast (forward-only applies).
        carry = tuple(c for c in ("batch_stats", "spectral")
                      if self.is_mutable_collection(c))
        bcast = ("params",) + tuple(c for c in ("batch_stats", "spectral")
                                    if c not in carry)
        from c2m_tpu.nn.remat import make_policy
        scan = nn.scan(nn.remat(body, policy=make_policy(
                           self.cfg.train_params.remat_policy)),
                       variable_broadcast=bcast,
                       variable_carry=carry,
                       split_rngs={"params": False, "sample": False},
                       in_axes=0, out_axes=0)
        is_last = jnp.arange(nc) == nc - 1
        acc, _ = scan(self, init, (tgt_chunks, gen_chunks, is_last))
        # GAN terms come from the last chunk only (no /nc); everything else
        # is a mean of equal-size chunk means == the folded mean
        no_avg = ("d_real", "d_fake", "g_gan_image")
        losses = {key: (val if key in no_avg else val / nc)
                  for key, val in acc.items()
                  if key not in ("d_real", "d_fake")}
        dis = ({"d_real": acc["d_real"], "d_fake": acc["d_fake"]}
               if use_d else {})
        return losses, dis

    def __call__(self, batch: Batch, train: bool = True
                 ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray],
                            Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        tp = cfg.train_params
        out = self.c2m(batch, train=train)

        vgg_apply = self.vgg if tp.loss_weights.perceptual > 0 else None
        scan_k = tp.scan_frames
        # init runs folded: nn.scan variable_carry needs existing collections
        use_scan_tail = (bool(scan_k) and scan_k < tp.num_predicted_frames
                         and not self.is_initializing())
        loss_dict = training_losses(tp, batch, out, vgg_apply,
                                    skip_generated=use_scan_tail)
        loss_dis_image: Dict[str, jnp.ndarray] = {}
        loss_dis_video: Dict[str, jnp.ndarray] = {}

        nif = tp.num_input_frames
        if use_scan_tail:
            tail_losses, tail_dis = self._scan_tail_losses(batch, out, train)
            loss_dict.update(tail_losses)
            loss_dis_image = tail_dis
        elif tp.use_image_discriminator:
            real, _ = fold_time(batch["video"][:, nif:])
            fake, _ = fold_time(out["generated"])
            d_real, d_fake, g_gan, fm = self._gan_losses(self.netd_image,
                                                         real, fake, train)
            loss_dict["g_gan_image"] = g_gan
            loss_dict["feature_matching_image"] = fm
            loss_dis_image = {"d_real": d_real, "d_fake": d_fake}
        if tp.use_video_discriminator:
            def chan_concat(v):  # [B, T, H, W, C] -> [B, H, W, T*C]
                return v.transpose(0, 2, 3, 1, 4).reshape(
                    v.shape[0], v.shape[2], v.shape[3], -1)
            real = chan_concat(batch["video"])
            fake = jnp.concatenate([chan_concat(batch["video"][:, :nif]),
                                    chan_concat(out["generated"])], axis=-1)
            d_real, d_fake, g_gan, fm = self._gan_losses(self.netd_video,
                                                         real, fake, train)
            loss_dict["g_gan_video"] = g_gan
            loss_dict["feature_matching_video"] = fm
            loss_dis_video = {"d_real": d_real, "d_fake": d_fake}

        return out, loss_dict, loss_dis_image, loss_dis_video

    def inference(self, batch: Batch, z_m: jnp.ndarray, click_mask: jnp.ndarray,
                  use_gt_eval: Optional[bool] = None) -> Dict[str, jnp.ndarray]:
        return self.c2m.inference(batch, z_m, click_mask, use_gt_eval)


def total_generator_loss(cfg: Config, loss_dict: Dict[str, jnp.ndarray]
                         ) -> jnp.ndarray:
    """Weighted sum over loss_weights (trainer.py:146-150)."""
    w = cfg.train_params.loss_weights.as_dict()
    total = 0.0
    for key, value in loss_dict.items():
        total = total + value * w[key]
    return total


def total_discriminator_loss(loss_dis: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """(d_real + d_fake) * 0.5 (trainer.py:151-158)."""
    if not loss_dis:
        return jnp.asarray(0.0)
    return (loss_dis.get("d_real", 0.0) + loss_dis.get("d_fake", 0.0)) * 0.5
