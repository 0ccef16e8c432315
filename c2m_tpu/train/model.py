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
                                   training_losses)
from c2m_tpu.models.c2m import C2MGenerator
from c2m_tpu.models.discriminator import MultiScaleDiscriminator
from c2m_tpu.nn.layers import fold_time
from c2m_tpu.nn.vgg import Vgg19Features

Batch = Dict[str, jnp.ndarray]


class C2MTrainModel(nn.Module):
    cfg: Config
    dataset: str = "cityscapes"

    def setup(self):
        cfg = self.cfg
        self.c2m = C2MGenerator(cfg, dataset=self.dataset)
        tp = cfg.train_params
        # discriminators share C2MGenerator's remat policy (models/c2m.py)
        disc_cls = (nn.remat(MultiScaleDiscriminator, static_argnums=(2,))
                    if tp.remat else MultiScaleDiscriminator)
        if tp.use_image_discriminator:
            self.netd_image = disc_cls(cfg.model_params.discriminator)
        if tp.use_video_discriminator:
            self.netd_video = disc_cls(cfg.model_params.discriminator)
        if tp.loss_weights.perceptual > 0:
            self.vgg = Vgg19Features()

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

    def __call__(self, batch: Batch, train: bool = True
                 ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray],
                            Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        tp = cfg.train_params
        out = self.c2m(batch, train=train)

        vgg_apply = self.vgg if tp.loss_weights.perceptual > 0 else None
        loss_dict = training_losses(tp, batch, out, vgg_apply)
        loss_dis_image: Dict[str, jnp.ndarray] = {}
        loss_dis_video: Dict[str, jnp.ndarray] = {}

        nif = tp.num_input_frames
        if tp.use_image_discriminator:
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
