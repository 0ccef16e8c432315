"""Full C2M model: appearance + dense motion (VAE + GNN + rasterizer) + generator.

Reference: src/modules/model.py (GeneratorFullModel) and
src/modules/motion_estimator/dense_motion.py (DenseMotionNetwork). The torch
umbrella owns optimizers/schedulers too; here the model is pure — optimization
lives in c2m_tpu.train (functional TrainState with optax.multi_transform).

Batch layout (padded dense; SURVEY.md §2.9's TPU-native mapping of the PyG
ragged graphs):
  video         [B, T, H, W, 3]   float, [0, 1]
  bg_mask       [B, T, H, W, 11]
  fg_mask       [B, T, H, W, 9]
  instance_mask [B, T, H, W, 1]   float raw instance ids (e.g. 26001)
  target_bw_of  [B, Tp, H, W, 2]  precomputed backward flow (pixels)
  target_bw_occ [B, Tp, H, W, 1]  binarized occlusion
  (optional)    target_fw_of / target_fw_occ, input_of / input_occ
  nodes_x       [B, N, 23]        [cy, cx (in -1..1), bh, bw, onehot19(class)]
  targets_theta [B, N, Tp, 6]     GT affines [sx, 0, dx, 0, sy, dy]
  node_mask     [B, N]            bool
  num_real_nodes[B]               int
  inst_ids      [B, N]            instance id at the last input frame
  rois_padded   [B, N, 4]         (x1, y1, x2, y2) pixels, padded boxes
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from c2m_tpu.config import Config
from c2m_tpu.models.appearance import AppearanceEncoder
from c2m_tpu.models.dense_motion import (DenseMotionDecoder, DenseMotionEncoder,
                                         SparseMotionFeatureEncoder,
                                         reparameterize)
from c2m_tpu.models.generator import OcclusionAwareGenerator
from c2m_tpu.models.sparse_motion import (SparseMotionEstimator,
                                          sample_click_indices)
from c2m_tpu.nn.layers import Dense, SameBlockTwoConv2d, fold_time, unfold_time
from c2m_tpu.ops.raster import generate_sparse_motion
from c2m_tpu.ops.warp import resample, resize_video

Batch = Dict[str, jnp.ndarray]


def _dtype_of(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.train_params.dtype]


class C2MGenerator(nn.Module):
    """Generator-side model (everything the reference's 'vae' + 'gnn'
    optimizers train: appearance encoder, dense motion network, generator)."""
    cfg: Config
    dataset: str = ""  # "" -> cfg.dataset_params.dataset (the KITTI variant
    # keys its extra generator branch on the dataset name)

    def setup(self):
        cfg = self.cfg
        mp, tp = cfg.model_params, cfg.train_params
        dtype = _dtype_of(cfg)
        me = mp.motion_estimator

        def maybe_remat(cls, train_argnum, segment):
            """Segment-wise rematerialization (train_params.remat): each big
            submodule recomputes its activations in the backward pass, so the
            512x1024 long-horizon train step fits 16 GB HBM. ``train`` must be
            static (and hence positional) under jax.checkpoint.
            train_params.remat_policy picks what the segments save and
            train_params.remat_segments which segments are wrapped at all
            (nn/remat.py)."""
            from c2m_tpu.nn.remat import make_policy, parse_segments
            if tp.remat and segment in parse_segments(tp.remat_segments):
                return nn.remat(cls, static_argnums=(train_argnum,),
                                policy=make_policy(tp.remat_policy))
            return cls

        self.appearance_encoder = maybe_remat(
            AppearanceEncoder, 4, "appearance")(
            mp.appearance_encoder, tp, dtype=dtype)
        scene_features = mp.appearance_encoder.block_expansion * (
            2 ** mp.appearance_encoder.pooling_after)
        self.sparse_motion_estimator = SparseMotionEstimator(
            me.sparse_motion_estimator, tp.num_predicted_frames,
            tp.num_input_frames, scene_features=scene_features)
        self.sparse_feature_encoder = maybe_remat(
            SparseMotionFeatureEncoder, 2, "sparse_feature")(
            me.sparse_motion_encoder, dtype=dtype)
        self.motion_encoder_bg = maybe_remat(
            DenseMotionEncoder, 2, "motion_bg")(
            me.dense_motion_encoder, me.dense_motion_encoder.out_channel_bg,
            dtype=dtype)
        self.motion_encoder_fg = maybe_remat(
            DenseMotionEncoder, 2, "motion_fg")(
            me.dense_motion_encoder, me.dense_motion_encoder.out_channel_fg,
            dtype=dtype)
        self.dense_generator_bw = maybe_remat(DenseMotionDecoder, 6,
                                              "dense_bw")(
            me.dense_motion_decoder, tp.num_input_frames,
            tp.num_predicted_frames,
            sparse_down=me.sparse_motion_encoder.num_down_blocks, dtype=dtype,
            scan_frames=tp.scan_frames, s2d_tail=tp.s2d_tail)
        if tp.use_fw_of:
            self.dense_generator_fw = maybe_remat(DenseMotionDecoder, 6,
                                                  "dense_fw")(
                me.dense_motion_decoder, tp.num_input_frames,
                tp.num_predicted_frames,
                sparse_down=me.sparse_motion_encoder.num_down_blocks, dtype=dtype,
                scan_frames=tp.scan_frames, s2d_tail=tp.s2d_tail)
        down = 2 ** mp.appearance_encoder.num_down_blocks
        self.h_app = int(tp.input_size[0] / down * mp.common_params.scale_factor)
        self.w_app = int(tp.input_size[1] / down * mp.common_params.scale_factor)
        # fc: z_m -> 64-ch map at bottleneck res; zconv fuses with appearance
        # (dense_motion.py:74-78, 218-223)
        self.fc = Dense(64 * self.h_app * self.w_app, name="fc")
        self.zconv = SameBlockTwoConv2d(16 * tp.num_predicted_frames, 3, 1, 1,
                                        padding_mode="reflect", dtype=dtype,
                                        name="zconv")
        self.generator = maybe_remat(OcclusionAwareGenerator, 4, "generator")(
            mp.generator, mp.flow_embedder,
            dataset=self.dataset or cfg.dataset_params.dataset, dtype=dtype,
            s2d_tail=tp.s2d_tail)

    # -- shared pieces ------------------------------------------------------

    def _prepare(self, batch: Batch) -> Batch:
        """scale_factor resizing of every stream (model.py:126-153)."""
        sf = self.cfg.model_params.common_params.scale_factor
        if sf == 1:
            return dict(batch)
        h, w = batch["video"].shape[2:4]
        size = (int(h * sf), int(w * sf))
        out = dict(batch)
        out["video"] = resize_video(batch["video"], size, "bilinear")
        out["bg_mask"] = resize_video(batch["bg_mask"], size, "nearest")
        out["fg_mask"] = resize_video(batch["fg_mask"], size, "nearest")
        out["instance_mask"] = resize_video(batch["instance_mask"], size, "nearest")
        for k in ("target_bw_of", "target_fw_of"):
            if batch.get(k) is not None:
                out[k] = resize_video(batch[k], size, is_flow=True)
        for k in ("target_bw_occ", "target_fw_occ", "input_occ"):
            if batch.get(k) is not None:
                out[k] = resize_video(batch[k], size, "bilinear")
        if batch.get("input_of") is not None:
            out["input_of"] = resize_video(batch["input_of"], size, is_flow=True)
        return out

    def _encoder_input(self, batch: Batch) -> jnp.ndarray:
        """Conditioning stack for the appearance encoder (model.py:162-175):
        channel-concat of input frames, full seg one-hot, instance map
        (+ input flow/occ when num_input_frames > 1)."""
        nif = self.cfg.train_params.num_input_frames
        b = batch["video"].shape[0]

        def flat(x, n):
            return x[:, :n].transpose(0, 2, 3, 1, 4).reshape(
                *x.shape[0:1], *x.shape[2:4], -1)

        parts = [flat(batch["video"], nif), flat(batch["bg_mask"], nif),
                 flat(batch["fg_mask"], nif), flat(batch["instance_mask"], nif)]
        if batch.get("input_of") is not None and nif > 1:
            parts += [flat(batch["input_of"], nif - 1),
                      flat(batch["input_occ"], nif - 1)]
        return jnp.concatenate(parts, axis=-1)

    def _appearance(self, batch: Batch, train: bool) -> Dict[str, jnp.ndarray]:
        return self.appearance_encoder(self._encoder_input(batch),
                                       batch["rois_padded"], batch["node_mask"],
                                       train)

    def _vae_inputs(self, batch: Batch) -> Dict[str, jnp.ndarray]:
        """bg/fg VAE encoder stacks (dense_motion.py:170-203): for each
        predicted timestep, channels = [all input frames, target frame t]."""
        tp = self.cfg.train_params
        nif, tpred = tp.num_input_frames, tp.num_predicted_frames

        def tile_and_pair(x):
            b, t, h, w, c = x.shape
            inp = x[:, :nif].transpose(0, 2, 3, 1, 4).reshape(b, h, w, nif * c)
            inp = jnp.repeat(inp[:, None], tpred, axis=1)
            return jnp.concatenate([inp, x[:, nif:]], axis=-1)

        frames = tile_and_pair(batch["video"])
        bg = tile_and_pair(batch["bg_mask"])
        fg = tile_and_pair(batch["fg_mask"])
        inst = tile_and_pair(batch["instance_mask"])
        flows = jnp.concatenate([batch["target_bw_of"], batch["target_bw_occ"]],
                                axis=-1)
        return {
            "bg": jnp.concatenate([frames, bg, flows], axis=-1),
            "fg": jnp.concatenate([frames, fg, inst, flows], axis=-1),
        }

    def _motion_code(self, z_m: jnp.ndarray, app_encoded: jnp.ndarray
                     ) -> jnp.ndarray:
        """z = [codex(appearance) | per-t motion code] (dense_motion.py:218-223)."""
        tpred = self.cfg.train_params.num_predicted_frames
        b = z_m.shape[0]
        zmap = self.fc(z_m).reshape(b, self.h_app, self.w_app, 64)
        code = self.zconv(jnp.concatenate(
            [zmap.astype(app_encoded.dtype), app_encoded], axis=-1))
        code = code.reshape(b, self.h_app, self.w_app, tpred, 16)
        code = code.transpose(0, 3, 1, 2, 4)                  # [B, Tp, h, w, 16]
        codex = jnp.repeat(app_encoded[:, None], tpred, axis=1)
        return jnp.concatenate([codex, code], axis=-1)        # [B, Tp, h, w, 528]

    def _generate_frames(self, batch: Batch, dense_bw: Dict[str, jnp.ndarray],
                         train: bool) -> jnp.ndarray:
        """Run the generator on the time-folded batch (model.py:195-202).

        With ``train_params.scan_frames = k > 0`` the fold runs as an nn.scan
        over chunks of k frames instead: live full-res generator activations
        drop by T/k, which is what fits the 512x1024x10 config on one chip
        (VERDICT r2 #1). Eval-mode numerics are exactly the folded path's
        (per-frame convs + running-stat norms); train-mode BatchNorm computes
        per-chunk batch stats — the same regrouping class as the reference's
        unsynced per-GPU DDP BatchNorm.
        """
        tp = self.cfg.train_params
        tpred = tp.num_predicted_frames
        k = tp.scan_frames
        src = batch["video"][:, tp.num_input_frames - 1]
        # init must run folded: nn.scan's variable_carry needs batch_stats
        # to exist before the scan (names match, so variables are identical)
        if not k or k >= tpred or self.is_initializing():
            src_rep, _ = fold_time(jnp.repeat(src[:, None], tpred, axis=1))
            flow, _ = fold_time(dense_bw["dense_motion"])
            occ, _ = fold_time(dense_bw["occlusion"])
            gen = self.generator(src_rep, flow, occ, train)
            return unfold_time(gen, tpred)

        b = src.shape[0]
        nc = tpred // k
        src_rep = jnp.repeat(src[:, None], k, axis=1).reshape(
            b * k, *src.shape[1:])

        def to_chunks(x):  # [B, T, ...] -> [nc, B*k, ...]
            x = x.reshape(b, nc, k, *x.shape[2:])
            return jnp.moveaxis(x, 1, 0).reshape(nc, b * k, *x.shape[3:])

        def body(mdl, carry, xs):
            flow_k, occ_k = xs
            gen_k = mdl.generator(src_rep, flow_k, occ_k, train)
            return carry, gen_k

        # remat-of-scan: each chunk's generator forward is recomputed in the
        # backward pass instead of stacked across all chunks. batch_stats is
        # carried only when this apply made it mutable (train step); eval /
        # inference applies read it broadcast.
        carry = tuple(c for c in ("batch_stats",)
                      if self.is_mutable_collection(c))
        bcast = ("params",) + tuple(c for c in ("batch_stats",)
                                    if c not in carry)
        scan = nn.scan(nn.remat(body), variable_broadcast=bcast,
                       variable_carry=carry,
                       split_rngs={"params": False, "sample": False},
                       in_axes=0, out_axes=0)
        _, gens = scan(self, jnp.zeros(()), (
            to_chunks(dense_bw["dense_motion"]),
            to_chunks(dense_bw["occlusion"])))
        # [nc, B*k, H, W, 3] -> [B, T, H, W, 3]
        gens = gens.reshape(nc, b, k, *gens.shape[2:])
        return jnp.moveaxis(gens, 1, 0).reshape(b, tpred, *gens.shape[3:])

    def _sparse_previews(self, batch: Batch, out: Dict[str, jnp.ndarray],
                         raster_thetas: Optional[jnp.ndarray] = None,
                         axis_aligned: bool = False) -> Dict[str, jnp.ndarray]:
        """Sparse-warp previews (model.py:203-211) — viz streams.

        With axis-aligned thetas (use_gt_training / use_gt_eval, the
        reference's operating points) the full-res warp runs as per-object
        separable matmuls composed by the raster's winner map — identical
        result, no XLA gather (ops/raster.warp_video_separable)."""
        tp = self.cfg.train_params
        tpred = tp.num_predicted_frames
        src = batch["video"][:, tp.num_input_frames - 1]
        if axis_aligned and raster_thetas is not None and "winner_bw" in out:
            from c2m_tpu.ops.raster import warp_video_separable
            warped = warp_video_separable(
                src, jax.lax.stop_gradient(raster_thetas).astype(jnp.float32),
                out["winner_bw"])
        else:
            src_rep, _ = fold_time(jnp.repeat(src[:, None], tpred, axis=1))
            sm, _ = fold_time(jax.lax.stop_gradient(out["sparse_motion_bw"]))
            warped = unfold_time(resample(src_rep, sm), tpred)
        return {
            "generated_sparse": jax.lax.stop_gradient(warped),
            "generated_sparse_occ": warped * out["sparse_occ_bw"],
        }

    # -- training forward ---------------------------------------------------

    def __call__(self, batch: Batch, train: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        tp = cfg.train_params
        batch = self._prepare(batch)
        out: Dict[str, jnp.ndarray] = {}

        app = self._appearance(batch, train)

        vae_in = self._vae_inputs(batch)
        dtype = _dtype_of(cfg)
        bg = self.motion_encoder_bg(vae_in["bg"].astype(dtype), train)
        fg = self.motion_encoder_fg(vae_in["fg"].astype(dtype), train)
        mu = jnp.concatenate([bg["mu"], fg["mu"]], axis=-1).astype(jnp.float32)
        logvar = jnp.concatenate([bg["logvar"], fg["logvar"]],
                                 axis=-1).astype(jnp.float32)
        out["mu"], out["logvar"] = mu, logvar
        z_m = reparameterize(self.make_rng("sample"), mu, logvar)

        _, click_mask = sample_click_indices(self.make_rng("sample"),
                                             batch["num_real_nodes"],
                                             batch["node_mask"].shape[1])
        gnn = self.sparse_motion_estimator(batch["nodes_x"],
                                           app["objects_feature"].astype(jnp.float32),
                                           batch["targets_theta"],
                                           batch["node_mask"], click_mask,
                                           train=train)
        out["thetas"] = gnn["thetas"]
        out["click_mask"] = click_mask

        raster_thetas = (batch["targets_theta"] if tp.use_gt_training
                         else gnn["thetas"])
        instance_src = batch["instance_mask"][:, tp.num_input_frames - 1]
        # GT thetas are axis-aligned by construction -> MXU matmul raster path
        sparse = generate_sparse_motion(instance_src, batch["inst_ids"],
                                        batch["node_mask"],
                                        raster_thetas.astype(jnp.float32),
                                        compute_fw=True,
                                        axis_aligned=tp.use_gt_training)
        out.update(sparse)

        sparse_feats = self.sparse_feature_encoder(
            sparse["sparse_motion_bw"].astype(dtype), train)
        z = self._motion_code(z_m, app["app_encoded"])
        dense_bw = self.dense_generator_bw(app, sparse_feats,
                                           sparse["sparse_motion_bw"],
                                           sparse["sparse_occ_bw"], z,
                                           train)
        out["dense_motion_bw"] = dense_bw["dense_motion"]
        out["occlusion_bw"] = dense_bw["occlusion"]
        if tp.use_fw_of:
            sparse_feats_fw = self.sparse_feature_encoder(
                sparse["sparse_motion_fw"].astype(dtype), train)
            dense_fw = self.dense_generator_fw(app, sparse_feats_fw,
                                               sparse["sparse_motion_fw"],
                                               sparse["sparse_occ_fw"], z,
                                               train)
            out["dense_motion_fw"] = dense_fw["dense_motion"]
            out["occlusion_fw"] = dense_fw["occlusion"]

        out["generated"] = self._generate_frames(batch, dense_bw, train)
        out.update(self._sparse_previews(batch, out, raster_thetas,
                                         axis_aligned=tp.use_gt_training))
        return out

    # -- inference ----------------------------------------------------------

    def inference(self, batch: Batch, z_m: jnp.ndarray,
                  click_mask: jnp.ndarray, use_gt_eval: Optional[bool] = None
                  ) -> Dict[str, jnp.ndarray]:
        """Sampled generation (model.py:241-324): explicit latent + clicks,
        no VAE encoders, eval-mode norms."""
        cfg = self.cfg
        tp = cfg.train_params
        if use_gt_eval is None:
            use_gt_eval = tp.use_gt_eval
        batch = self._prepare(batch)
        out: Dict[str, jnp.ndarray] = {}

        app = self._appearance(batch, train=False)
        gnn = self.sparse_motion_estimator(batch["nodes_x"],
                                           app["objects_feature"].astype(jnp.float32),
                                           batch["targets_theta"],
                                           batch["node_mask"], click_mask,
                                           train=False)
        out["thetas"] = gnn["thetas"]
        out["click_mask"] = click_mask
        raster_thetas = (batch["targets_theta"] if use_gt_eval
                         else gnn["thetas"])
        instance_src = batch["instance_mask"][:, tp.num_input_frames - 1]
        sparse = generate_sparse_motion(instance_src, batch["inst_ids"],
                                        batch["node_mask"],
                                        raster_thetas.astype(jnp.float32),
                                        compute_fw=True,
                                        axis_aligned=use_gt_eval)
        out.update(sparse)

        dtype = _dtype_of(cfg)
        sparse_feats = self.sparse_feature_encoder(
            sparse["sparse_motion_bw"].astype(dtype), False)
        z = self._motion_code(z_m, app["app_encoded"])
        dense_bw = self.dense_generator_bw(app, sparse_feats,
                                           sparse["sparse_motion_bw"],
                                           sparse["sparse_occ_bw"], z,
                                           False)
        out["dense_motion_bw"] = dense_bw["dense_motion"]
        out["occlusion_bw"] = dense_bw["occlusion"]
        out["generated"] = self._generate_frames(batch, dense_bw, train=False)
        out.update(self._sparse_previews(batch, out, raster_thetas,
                                         axis_aligned=use_gt_eval))
        return out
