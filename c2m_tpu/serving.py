"""Self-contained AOT serving artifacts for the inference path.

``jax.export`` lowers the jitted sampled-inference function to hermetic
StableHLO; the artifact directory packages that bytecode with the generator
weights and a config snapshot, so a serving process needs NO model code:
load, compile once per platform, serve. The reference's deployment story is
"run src/test.py inside a checkout" (reference src/test.py:40-80); this is
the TPU-native equivalent of a deployable saved model.

Artifact layout (a directory)::

  inference_b{B}.stablehlo   serialized jax.export bytes, one per batch bucket
  variables.npz              flattened generator variable tree ('/'-joined)
  config.yaml                full config snapshot
  meta.json                  shapes, buckets, platforms, z_dim, version

Batch buckets: TPU serving wants static shapes, so the exporter emits one
function per requested batch size (classic bucketed batching); the loader
picks the smallest bucket that fits and zero-pads the request into it.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FORMAT_VERSION = 1


# -- variable (de)flattening -------------------------------------------------

def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict tree -> flat {'a/b/c': array} with '/'-joined paths."""
    out: Dict[str, np.ndarray] = {}
    for key, value in dict(tree).items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, (dict,)) or hasattr(value, "items"):
            out.update(flatten_tree(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def _save_variables(path: str, variables) -> None:
    flat = flatten_tree(variables)
    # npz can't hold bfloat16; params are fp32 by construction, but guard
    # anyway and record originals for exact round-trip
    dtypes = {}
    arrays = {}
    for key, arr in flat.items():
        if arr.dtype == jnp.bfloat16:
            dtypes[key] = "bfloat16"
            arr = arr.astype(np.float32)
        arrays[key] = arr
    np.savez(path, __dtypes__=json.dumps(dtypes), **arrays)


def _load_variables(path: str):
    with np.load(path, allow_pickle=False) as data:
        dtypes = json.loads(str(data["__dtypes__"]))
        flat = {}
        for key in data.files:
            if key == "__dtypes__":
                continue
            arr = data[key]
            if dtypes.get(key) == "bfloat16":
                arr = arr.astype(jnp.bfloat16)
            flat[key] = arr
    return unflatten_tree(flat)


# -- export ------------------------------------------------------------------

def generator_variables(train_variables) -> Dict:
    """Extract the C2MGenerator subtree from full C2MTrainModel variables
    (the generator is the ``c2m`` submodule, train/model.py:38); serving
    artifacts don't carry discriminator/VGG weights."""
    out = {}
    for coll in ("params", "batch_stats"):
        sub = train_variables.get(coll)
        if sub and "c2m" in sub:
            out[coll] = sub["c2m"]
    return out


def _batch_specs(cfg, batch_size: int) -> Dict[str, jax.ShapeDtypeStruct]:
    """Abstract input-batch shapes for one bucket, from the dataset contract
    (the same tree data/synthetic.make_batch + the loaders produce).

    Serving receives test-set batches, so the specs follow ``test_params``
    input_size / num_predicted_frames (the reference builds its eval model
    from test_params, src/test.py:53-54)."""
    import copy

    from c2m_tpu.data.synthetic import make_batch
    probe_cfg = copy.deepcopy(cfg)
    probe_cfg.train_params.input_size = list(cfg.test_params.input_size)
    probe_cfg.train_params.num_predicted_frames = \
        cfg.test_params.num_predicted_frames
    example = make_batch(probe_cfg, batch_size=batch_size, seed=0)
    return {k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
            for k, v in example.items()}


def _infer_fn(cfg, use_gt_eval: Optional[bool] = None):
    from c2m_tpu.models.c2m import C2MGenerator
    model = C2MGenerator(cfg)
    gt = cfg.test_params.use_gt_eval if use_gt_eval is None else use_gt_eval

    def infer(variables, batch, z_m, click, rng):
        return model.apply(variables, batch, z_m, click, gt,
                           method="inference", rngs={"sample": rng})
    return infer


def z_dim(cfg) -> int:
    enc = cfg.model_params.motion_estimator.dense_motion_encoder
    return int(enc.out_channel_bg + enc.out_channel_fg)


def export_artifact(out_dir: str, cfg, variables,
                    batch_sizes: Sequence[int] = (1,),
                    platforms: Sequence[str] = ("tpu", "cpu"),
                    use_gt_eval: Optional[bool] = None) -> None:
    """Write a serving artifact directory.

    ``variables`` is the C2MGenerator tree ({'params': ..., 'batch_stats':
    ...}); pass full train-state variables through :func:`generator_variables`
    first.
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    infer = _infer_fn(cfg, use_gt_eval)
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype
                                       if not hasattr(a, "dtype") else a.dtype),
        variables)
    rng_spec = jax.ShapeDtypeStruct((2,), np.uint32)
    zd = z_dim(cfg)
    n_max = cfg.dataset_params.max_objects

    for bs in batch_sizes:
        batch_spec = _batch_specs(cfg, bs)
        z_spec = jax.ShapeDtypeStruct((bs, zd), np.float32)
        click_spec = jax.ShapeDtypeStruct((bs, n_max), np.float32)
        exported = jexport.export(jax.jit(infer), platforms=list(platforms))(
            var_spec, batch_spec, z_spec, click_spec, rng_spec)
        with open(os.path.join(out_dir, f"inference_b{bs}.stablehlo"),
                  "wb") as f:
            f.write(exported.serialize())

    _save_variables(os.path.join(out_dir, "variables.npz"), variables)
    import yaml
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    meta = {
        "format_version": _FORMAT_VERSION,
        "batch_sizes": sorted(int(b) for b in batch_sizes),
        "platforms": list(platforms),
        "z_dim": zd,
        "max_objects": int(n_max),
        "input_size": list(cfg.test_params.input_size),
        "num_predicted_frames": int(cfg.test_params.num_predicted_frames),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


# -- serving -----------------------------------------------------------------

class ServingModel:
    """Loads an artifact directory and serves padded/bucketed inference.

    No model code runs here: ``jax.export.deserialize`` rebuilds callables
    straight from StableHLO. First call per bucket compiles; later calls
    reuse the executable.
    """

    def __init__(self, artifact_dir: str):
        from jax import export as jexport
        with open(os.path.join(artifact_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} != "
                f"{_FORMAT_VERSION}")
        # Weights go on device ONCE at load: passing host arrays to each
        # call re-uploads the whole artifact per request (measured +13.7 s
        # over the tunnel for 314 MB, tools/bench_serving.py round 4).
        self.variables = jax.device_put(_load_variables(
            os.path.join(artifact_dir, "variables.npz")))
        self._fns = {}
        for bs in self.meta["batch_sizes"]:
            path = os.path.join(artifact_dir, f"inference_b{bs}.stablehlo")
            with open(path, "rb") as f:
                # jit the deserialized call so the executable is built once
                # and reused; bare Exported.call re-traces per invocation
                self._fns[bs] = jax.jit(jexport.deserialize(f.read()).call)

    def bucket_for(self, batch_size: int) -> int:
        for bs in self.meta["batch_sizes"]:
            if bs >= batch_size:
                return bs
        raise ValueError(f"request batch {batch_size} exceeds largest bucket "
                         f"{self.meta['batch_sizes'][-1]}")

    @staticmethod
    def _pad_to(tree, bucket: int, batch_size: int):
        if bucket == batch_size:
            return tree

        def pad(arr):
            arr = np.asarray(arr)
            widths = [(0, bucket - batch_size)] + [(0, 0)] * (arr.ndim - 1)
            return np.pad(arr, widths)
        return {k: pad(v) for k, v in tree.items()}

    def __call__(self, batch: Dict[str, np.ndarray], z_m, click, rng,
                 outputs: Optional[Sequence[str]] = None
                 ) -> Dict[str, np.ndarray]:
        """Run sampled inference; requests smaller than the chosen bucket are
        zero-padded in and sliced out.

        ``outputs``: optional key filter — only the requested output tensors
        are fetched to host (a full fetch of the auxiliary flow/occlusion
        maps costs several times the generated frames; measured in
        tools/bench_serving.py). None = fetch everything."""
        bs = int(np.shape(next(iter(batch.values())))[0])
        bucket = self.bucket_for(bs)
        batch = self._pad_to({k: v for k, v in batch.items() if k != "names"},
                             bucket, bs)
        z_m = np.asarray(z_m, np.float32)
        click = np.asarray(click, np.float32)
        if bucket != bs:
            z_m = np.pad(z_m, [(0, bucket - bs), (0, 0)])
            click = np.pad(click, [(0, bucket - bs), (0, 0)])
        out = self._fns[bucket](self.variables, batch, z_m, click,
                                np.asarray(rng, np.uint32))
        if outputs is not None:
            missing = set(outputs) - set(out)
            if missing:
                raise KeyError(f"unknown outputs {sorted(missing)} "
                               f"(available: {sorted(out)})")
            out = {k: out[k] for k in outputs}
        return {k: np.asarray(v)[:bs] for k, v in out.items()}
