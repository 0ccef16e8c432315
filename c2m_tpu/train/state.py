"""Train state: one param pytree, four optimizer groups via optax.multi_transform.

Reference: GeneratorFullModel builds 4 Adam optimizers + MultiStepLR schedulers
(model.py:52-99) and the trainer backprops 3 losses into shared .grad buffers
before stepping all four (trainer.py:138-165). Functionally: one combined loss,
one gradient, per-group Adam with per-group piecewise-constant LR schedules.

Groups (by param path):
  gen     appearance encoder + dense motion network + generator   lr_g,  gamma_g
  gnn     sparse_motion_estimator                                  lr_gnn, gamma_gnn
  d_image / d_video                                                lr_d,  gamma_d
  frozen  VGG19 (perceptual loss net; requires_grad=False in torch)

MultiStepLR semantics: lr * gamma^(#milestones passed), milestones in epochs
(scheduler.step() per epoch, base.py:123-145) -> converted to step boundaries
via steps_per_epoch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import core, struct, traverse_util

from c2m_tpu.config import Config


def param_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label every leaf with its optimizer group by path."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        if path[0] == "c2m":
            labels[path] = "gnn" if "sparse_motion_estimator" in path else "gen"
        elif path[0] == "netd_image":
            labels[path] = "d_image"
        elif path[0] == "netd_video":
            labels[path] = "d_video"
        else:  # vgg and anything else non-trained
            labels[path] = "frozen"
    return traverse_util.unflatten_dict(labels)


def multistep_schedule(base_lr: float, gamma: float, milestones_epochs,
                       steps_per_epoch: int) -> optax.Schedule:
    """torch MultiStepLR as an optax piecewise-constant schedule."""
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def build_optimizer(cfg: Config, steps_per_epoch: int = 1
                    ) -> optax.GradientTransformation:
    tp = cfg.train_params

    def adam(lr, gamma):
        return optax.adam(
            learning_rate=multistep_schedule(lr, gamma, tp.milestones,
                                             steps_per_epoch),
            b1=tp.beta1, b2=tp.beta2, eps=float(tp.eps))

    return optax.multi_transform(
        {
            "gen": adam(tp.lr_rate_g, tp.gamma_g),
            "gnn": adam(tp.lr_rate_gnn, tp.gamma_gnn),
            "d_image": adam(tp.lr_rate_d, tp.gamma_d),
            "d_video": adam(tp.lr_rate_d, tp.gamma_d),
            "frozen": optax.set_to_zero(),
        },
        param_labels)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    opt_state: optax.OptState
    batch_stats: core.FrozenDict
    spectral: core.FrozenDict
    apply_fn: Any = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def create_train_state(cfg: Config, model, rng: jax.Array, batch,
                       steps_per_epoch: int = 1) -> TrainState:
    init_rng, sample_rng = jax.random.split(rng)
    variables = model.init({"params": init_rng, "sample": sample_rng},
                           batch, train=True)
    tx = build_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        spectral=variables.get("spectral", core.FrozenDict()),
        apply_fn=model.apply,
        tx=tx)
