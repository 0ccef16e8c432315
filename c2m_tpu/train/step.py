"""The jitted training step (reference hot loop: trainer.py:138-168).

One combined scalar loss — weighted generator objective + 0.5*(d_real+d_fake)
per discriminator — differentiates identically to the reference's three
.backward() calls into shared grad buffers (stop_gradient marks the detach
boundaries inside the model). Under jit over a data-sharded mesh, XLA inserts
the gradient psum over ICI automatically (replacing DDP/NCCL, SURVEY.md §2.9).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from c2m_tpu.config import Config
from c2m_tpu.train.model import (total_discriminator_loss, total_generator_loss)
from c2m_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]


def make_train_step(cfg: Config, donate: bool = True):
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Batch, rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            (out, loss_dict, ldi, ldv), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats,
                 "spectral": state.spectral},
                batch, train=True,
                rngs={"sample": step_rng},
                mutable=["batch_stats", "spectral"])
            total_gen = total_generator_loss(cfg, loss_dict)
            total_di = total_discriminator_loss(ldi)
            total_dv = total_discriminator_loss(ldv)
            total = total_gen + total_di + total_dv
            metrics = dict(loss_dict)
            metrics["total_gen"] = total_gen
            if ldi:
                metrics["total_image_dis"] = total_di
                metrics["d_real_image"] = ldi["d_real"]
                metrics["d_fake_image"] = ldi["d_fake"]
            if ldv:
                metrics["total_video_dis"] = total_dv
                metrics["d_real_video"] = ldv["d_real"]
                metrics["d_fake_video"] = ldv["d_fake"]
            return total, (metrics, mutated)

        grads, (metrics, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            spectral=mutated.get("spectral", state.spectral))
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config):
    """Forward-only loss evaluation (no optimizer, eval-mode norms)."""
    @jax.jit
    def eval_step(state: TrainState, batch: Batch, rng: jax.Array):
        (out, loss_dict, ldi, ldv), _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats,
             "spectral": state.spectral},
            batch, train=False, rngs={"sample": rng},
            mutable=["batch_stats", "spectral"])
        return out, loss_dict
    return eval_step
