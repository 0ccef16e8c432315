"""Sparse (per-object) motion estimator — the "click" GNN.

Reference: src/modules/motion_estimator/sparse_motion_estimator.py:12-141.
One node per tracked object; per predicted timestep a GATv2 layer refines the
node states and an affine head (initialized to identity) emits a 2x3 theta;
the user-clicked node's theta is clamped to ground truth (the click
conditioning, :126-141).

TPU-native redesign (SURVEY.md §7): the PyG ragged Batch with permutation
edge lists becomes **dense masked multi-head attention over padded nodes**
``[B, N, F]`` — the graphs are fully connected over <~20 objects, so a dense
[N, N] attention matmul on the MXU strictly dominates sparse scatter/gather.
Edge semantics preserved: no self-loops unless the graph has exactly one real
node (the reference's [[0,0]] fallback, cityscapes.py:173-175).

Reference dead code intentionally not carried over: the ``y_encoder``/
``linear_z`` latent path computes tensors that nothing consumes (the in-place
``y_n`` update at :126-128 is dropped — only the GATv2 -> fc_loc path feeds
the output), and ``C2MMessagePassing``/``theta2affine`` are unused.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from c2m_tpu.config import SparseMotionEstimatorParams
from c2m_tpu.nn.layers import Dense, leaky


class MaskedBatchNorm1d(nn.Module):
    """BatchNorm over valid nodes only (reference BatchNorm1d sees only real
    nodes because PyG batches carry no padding)."""
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True):
        # x: [B, N, C]; mask: [B, N]
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            m = mask[..., None].astype(x.dtype)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=(0, 1)) / count
            var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1)) / count
            if not self.is_initializing():
                # torch running_var uses the unbiased estimate.
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean.astype(jnp.float32))
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased.astype(jnp.float32))
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class DenseGATv2(nn.Module):
    """GATv2 (Brody et al.) as dense masked attention over padded nodes.

    Matches PyG ``GATv2Conv(F, F, heads=H, concat=False, add_self_loops=False)``
    semantics: e_ij = a_h . leaky(W_l x_j + W_r x_i); alpha = softmax_j;
    out_i = mean_h sum_j alpha_ij (W_l x_j) + bias.
    """
    features: int
    heads: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, F]; adj: [B, N(i), N(j)] bool, True where edge j->i exists.
        b, n, _ = x.shape
        h, f = self.heads, self.features
        gl = Dense(h * f, name="lin_l")(x).reshape(b, n, h, f)  # source (j)
        gr = Dense(h * f, name="lin_r")(x).reshape(b, n, h, f)  # target (i)
        att = self.param("att", nn.initializers.glorot_uniform(), (h, f))
        # scores [B, i, j, h]
        s = leaky(gr[:, :, None] + gl[:, None, :, :])            # [B, i, j, h, f]
        e = jnp.einsum("bijhf,hf->bijh", s, att)
        e = jnp.where(adj[..., None], e, jnp.asarray(-1e9, e.dtype))
        alpha = jax.nn.softmax(e, axis=2)
        row_has_edge = jnp.any(adj, axis=2)[..., None]           # [B, i, 1]
        out = jnp.einsum("bijh,bjhf->bihf", alpha, gl)
        out = jnp.mean(out, axis=2)                              # mean over heads
        bias = self.param("bias", nn.initializers.zeros, (f,))
        out = out + bias
        return jnp.where(row_has_edge, out, 0.0)


def build_adjacency(node_mask: jnp.ndarray) -> jnp.ndarray:
    """Fully-connected within-graph edges, no self loops; a single-node graph
    gets a self loop (reference cityscapes.py:173-175)."""
    b, n = node_mask.shape
    valid = node_mask.astype(bool)
    pair = valid[:, :, None] & valid[:, None, :]
    eye = jnp.eye(n, dtype=bool)[None]
    adj = pair & ~eye
    single = jnp.sum(valid, axis=1) == 1                         # [B]
    self_loop = eye & valid[:, :, None]
    return jnp.where(single[:, None, None], pair & self_loop, adj)


class AffineHead(nn.Module):
    """fc_loc: Linear -> leaky -> Linear(6), zero-init weights, identity bias
    (reference sparse_motion_estimator.py:118-122)."""
    h_dim: int

    @nn.compact
    def __call__(self, x):
        x = leaky(Dense(self.h_dim, name="fc1")(x))
        identity = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
        return Dense(6, name="fc2",
                     kernel_init=nn.initializers.zeros,
                     bias_init=lambda key, shape, dtype=jnp.float32:
                         identity.astype(dtype))(x)


class SparseMotionEstimator(nn.Module):
    params: SparseMotionEstimatorParams
    num_predicted_frames: int
    num_input_frames: int = 1
    scene_features: int = 128

    @nn.compact
    def __call__(self, x_nodes: jnp.ndarray, scene_feat: jnp.ndarray,
                 targets_theta: jnp.ndarray, node_mask: jnp.ndarray,
                 click_mask: jnp.ndarray, train: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        """x_nodes: [B, N, num_features_x]; scene_feat: [B, N, scene_features];
        targets_theta: [B, N, T, 6]; node_mask/click_mask: [B, N].

        Returns {"thetas": [B, N, T, 6]} — GNN-predicted thetas with the
        clicked nodes clamped to GT (reference :140).
        """
        p = self.params
        h_dim = p.h_dim
        u = click_mask[..., None].astype(x_nodes.dtype)          # [B, N, 1]

        # x_encoder: 23 -> h/2 -> h (reference :22-24)
        xm = Dense(h_dim // 2, name="x_enc1")(x_nodes)
        xm = Dense(h_dim, name="x_enc2")(leaky(xm))

        # encode_scene_features: (h + scene) -> scene/2 -> BN -> 2h -> BN -> h
        # (reference :29-37; BatchNorm1d -> masked over valid nodes)
        z = jnp.concatenate([xm, scene_feat], axis=-1)
        z = Dense(self.scene_features // 2, name="scene_fc1")(z)
        z = leaky(MaskedBatchNorm1d(name="scene_bn1")(z, node_mask, train=train))
        z = Dense(h_dim * 2, name="scene_fc2")(z)
        z = leaky(MaskedBatchNorm1d(name="scene_bn2")(z, node_mask, train=train))
        x = Dense(h_dim, name="scene_fc3")(z)

        adj = build_adjacency(node_mask)
        thetas = []
        for t in range(self.num_predicted_frames):
            x = DenseGATv2(h_dim, heads=p.num_head, name=f"gat_{t}")(x, adj)
            theta_t = AffineHead(h_dim, name=f"loc_{t}")(x)      # [B, N, 6]
            theta_t = theta_t * (1.0 - u) + targets_theta[:, :, t] * u
            thetas.append(theta_t)
        return {"thetas": jnp.stack(thetas, axis=2)}             # [B, N, T, 6]


def sample_click_indices(rng: jax.Array, num_real_nodes: jnp.ndarray,
                         n_max: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick one random real node per graph as the user click.

    Reference uses np.random.random_integers(0, n-1) per graph
    (sparse_motion_estimator.py:46-49). Returns (indices [B], click_mask [B, N]).
    """
    b = num_real_nodes.shape[0]
    uni = jax.random.uniform(rng, (b,))
    idx = jnp.floor(uni * jnp.maximum(num_real_nodes, 1)).astype(jnp.int32)
    idx = jnp.minimum(idx, jnp.maximum(num_real_nodes - 1, 0))
    mask = jax.nn.one_hot(idx, n_max, dtype=jnp.float32)
    mask = mask * (num_real_nodes > 0)[:, None]
    return idx, mask
