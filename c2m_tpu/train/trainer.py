"""Trainer: epoch loop, logging cadence, checkpointing, mid-train eval.

Reference: src/trainer/{base.py, trainer.py}. Job dirs, iteration counters with
resume alignment, periodic print/display/save hooks, epoch checkpoints — same
observable behavior, functional core: the jitted train step owns all device
work; the trainer is host-side orchestration only.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from c2m_tpu.config import Config
from c2m_tpu.data.loader import DataLoader
from c2m_tpu.parallel.mesh import data_sharding, shard_state
from c2m_tpu.train.model import C2MTrainModel
from c2m_tpu.train.state import create_train_state
from c2m_tpu.train.step import make_train_step
from c2m_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from c2m_tpu.utils.visualizer import Visualizer


def _device_batch(batch: Dict[str, np.ndarray], sharding=None):
    out = {}
    for k, v in batch.items():
        if k == "names":
            continue
        arr = jnp.asarray(v)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        out[k] = arr
    return out


class Trainer:
    def __init__(self, cfg: Config, dataset, val_dataset=None,
                 job_dir: Optional[str] = None, mesh=None):
        self.cfg = cfg
        tp = cfg.train_params
        self.job_dir = job_dir or os.path.join(
            cfg.workspace, f"{cfg.dataset_params.dataset}_{cfg.name}{cfg.suffix}")
        os.makedirs(self.job_dir, exist_ok=True)
        self._snapshot_config()

        self.mesh = mesh
        self.loader = DataLoader(dataset, batch_size=tp.batch_size, shuffle=True,
                                 seed=tp.seed, num_workers=tp.workers,
                                 host_id=jax.process_index(),
                                 num_hosts=jax.process_count())
        self.val_dataset = val_dataset
        steps_per_epoch = max(len(self.loader), 1)

        self.model = C2MTrainModel(cfg, dataset=cfg.dataset_params.dataset)
        init_batch = _device_batch(next(iter(self.loader)))
        self.state = create_train_state(cfg, self.model,
                                        jax.random.PRNGKey(tp.seed), init_batch,
                                        steps_per_epoch=steps_per_epoch)
        if mesh is not None:
            self.state = shard_state(self.state, mesh)
            self.sharding = data_sharding(mesh)
        else:
            self.sharding = None
        self.train_step = make_train_step(cfg)
        self.rng = jax.random.PRNGKey(tp.seed + 1)
        self._infer_fn = None
        self._val_loader = None
        self._val_iter = None

        # on-the-fly FlowNet2 supervision when flows aren't precomputed
        # (reference trainer.py:42-98)
        self.flow_onthefly = None
        if not tp.use_pre_processed_of:
            from c2m_tpu.train.flow_onthefly import OnTheFlyFlow
            self.flow_onthefly = OnTheFlyFlow(
                tp.num_input_frames, tp.num_predicted_frames,
                weights_path=os.environ.get("FLOWNET2_WEIGHTS"))

        self.start_epoch, self.epoch_iter = 1, 0
        if tp.continue_train:
            self.state, self.start_epoch, self.epoch_iter = load_checkpoint(
                self.job_dir, self.state)
            print(f"resumed from epoch {self.start_epoch}", flush=True)

        vz = cfg.visualizer_params
        self.visualizer = Visualizer(self.job_dir, use_html=vz.use_html,
                                     tf_log=vz.tf_log)
        self.total_iter = (self.start_epoch - 1) * steps_per_epoch + self.epoch_iter

    def _snapshot_config(self) -> None:
        params_dir = os.path.join(self.job_dir, "params")
        os.makedirs(params_dir, exist_ok=True)
        import yaml
        with open(os.path.join(params_dir, "config.txt"), "w") as f:
            yaml.safe_dump(self.cfg.to_dict(), f)

    def fit(self, num_epochs: Optional[int] = None,
            max_steps: Optional[int] = None) -> None:
        cfg = self.cfg
        tp = cfg.train_params
        vz = cfg.visualizer_params
        epochs = num_epochs or tp.num_epochs
        is_main = jax.process_index() == 0

        for epoch in range(self.start_epoch, epochs + 1):
            self.loader.set_epoch(epoch)
            t_epoch = time.time()
            t_iter = time.time()
            steps_this_epoch = 0
            for batch_np in self.loader:
                if max_steps is not None and steps_this_epoch >= max_steps:
                    break
                steps_this_epoch += 1
                batch = _device_batch(batch_np, self.sharding)
                if self.flow_onthefly is not None:
                    batch.update(self.flow_onthefly(batch["video"]))
                self.state, metrics = self.train_step(self.state, batch, self.rng)
                self.total_iter += 1

                if is_main and self.total_iter % vz.print_freq == 0:
                    metrics_host = {k: float(v) for k, v in metrics.items()}
                    self.visualizer.log_losses(epoch, self.total_iter,
                                               metrics_host,
                                               time.time() - t_iter)
                if is_main and self.total_iter % vz.display_freq == 0:
                    self._display(batch, epoch)
                if is_main and self.total_iter % tp.eval_freq == 0:
                    self._generate_eval(epoch, batch)
                if is_main and self.total_iter % vz.save_latest_freq == 0:
                    save_checkpoint(self.job_dir, jax.device_get(self.state),
                                    epoch, self.total_iter)
                t_iter = time.time()

            if is_main and epoch % cfg.checkpoint_params.save_epoch_freq == 0:
                save_checkpoint(self.job_dir, jax.device_get(self.state), epoch)
            print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s",
                  flush=True)

    def _display(self, batch, epoch: int) -> None:
        """Mid-train sample dump (reference _generate_eval, trainer.py:186-209;
        the cross-host gather replaces the reference's dist_all_gather_tensor
        rank-0 visualization, trainer.py:211-243)."""
        out, _ = self._eval_forward(batch)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            out = multihost_utils.process_allgather(out)
            batch = multihost_utils.process_allgather(batch)
        host_out = jax.device_get(out)
        host_batch = jax.device_get(batch)
        self.visualizer.display_results(host_batch, host_out, epoch,
                                        self.total_iter)
        self.visualizer.log_trajectories(
            epoch, self.total_iter, np.asarray(host_out["thetas"]),
            np.asarray(host_batch["targets_theta"]),
            np.asarray(host_batch["node_mask"]))

    def _eval_forward(self, batch):
        (out, loss_dict, *_), _ = self.state.apply_fn(
            {"params": self.state.params, "batch_stats": self.state.batch_stats,
             "spectral": self.state.spectral},
            batch, train=False,
            rngs={"sample": jax.random.fold_in(self.rng, self.total_iter)},
            mutable=["batch_stats", "spectral"])
        return out, loss_dict

    def _next_val_batch(self):
        """Cycle one batch off the val set; the training batch is the
        fallback when no val dataset is wired (the reference requires a val
        loader, trainer.py:193)."""
        if self.val_dataset is None:
            return None
        if getattr(self, "_val_loader", None) is None:
            tp = self.cfg.train_params
            self._val_loader = DataLoader(
                self.val_dataset, batch_size=self.cfg.test_params.batch_size,
                shuffle=False, seed=tp.seed, num_workers=0,
                host_id=jax.process_index(), num_hosts=jax.process_count())
            self._val_iter = iter(self._val_loader)
        try:
            return next(self._val_iter)
        except StopIteration:
            self._val_iter = iter(self._val_loader)
            try:
                return next(self._val_iter)
            except StopIteration:  # val set smaller than the test batch
                return None

    def _generate_eval(self, epoch: int, batch=None) -> Dict[str, np.ndarray]:
        """Mid-train SAMPLED-inference eval (reference _generate_eval,
        trainer.py:186-209, cadence base.py:115-121): fresh z ~ N(0,1), fresh
        random clicks, the ``inference`` path (not a train=False forward),
        per-call rng; visualized under the "eval" tag."""
        val_np = self._next_val_batch()
        host_batch = val_np if val_np is not None else batch
        if host_batch is None:
            return None
        if val_np is not None:
            # the val batch size (test_params.batch_size, e.g. 12) need not
            # divide the mesh — trim to the largest shardable multiple so a
            # mid-train eval can't crash a multi-chip run. Only the *data*
            # axis shards the batch; a (2,4) spatial mesh needs batch % 2,
            # not % 8 (ADVICE r2).
            n_dev = (self.mesh.shape.get("data", self.mesh.devices.size)
                     if self.mesh is not None else 1)
            b_full = len(host_batch["video"])
            b_keep = max(n_dev, (b_full // n_dev) * n_dev)
            if b_keep != b_full and b_full >= n_dev:
                host_batch = {k: v[:b_keep] for k, v in host_batch.items()}
            elif b_full < n_dev:
                host_batch = None
        if host_batch is None:
            return None
        dev_batch = (_device_batch(host_batch, self.sharding)
                     if val_np is not None or batch is None else batch)
        me = self.cfg.model_params.motion_estimator.dense_motion_encoder
        z_dim = me.out_channel_bg + me.out_channel_fg
        rng = jax.random.fold_in(jax.random.fold_in(self.rng, self.total_iter),
                                 7)
        rng_z, rng_click, rng_sample = jax.random.split(rng, 3)
        b = dev_batch["video"].shape[0]
        z_m = jax.random.normal(rng_z, (b, z_dim))
        from c2m_tpu.models.sparse_motion import sample_click_indices
        n_max = dev_batch["node_mask"].shape[1]
        idx, _ = sample_click_indices(
            rng_click, jnp.asarray(dev_batch["num_real_nodes"]), n_max)
        click = (jax.nn.one_hot(idx, n_max, dtype=jnp.float32)
                 * (jnp.asarray(dev_batch["num_real_nodes"]) > 0)[:, None])
        if self._infer_fn is None:
            model = self.model

            @jax.jit
            def infer(variables, batch, z_m, click, rng):
                return model.apply(variables, batch, z_m, click,
                                   method="inference", rngs={"sample": rng})
            self._infer_fn = infer
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats,
                     "spectral": self.state.spectral}
        out = jax.device_get(
            self._infer_fn(variables, dev_batch, z_m, click, rng_sample))
        hb = {k: np.asarray(v) for k, v in dev_batch.items()}
        self.visualizer.display_results(hb, out, epoch, self.total_iter,
                                        tag="eval")
        self.visualizer.log_trajectories(
            epoch, self.total_iter, np.asarray(out["thetas"]),
            np.asarray(hb["targets_theta"]), np.asarray(hb["node_mask"]),
            tag="eval")
        return out
