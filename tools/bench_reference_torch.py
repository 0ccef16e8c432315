#!/usr/bin/env python
"""Measured PyTorch-reference baseline: full C2M inference on THIS CPU,
reference torch implementation vs our JAX build, identical operating point
(128x256, 1+5 frames, test batch 12 — c2m_journal_cityscapes.yaml:164-170).

The reference publishes no numbers (BASELINE.md) and no GPU is available
here, so this is the one same-hardware, apples-to-apples measurement that
exists: it pins the *implementation* efficiency ratio (vectorized raster +
fused XLA graph vs the reference's per-object Python loop + op-by-op eager
execution) independent of the A100-vs-TPU hardware question.

The reference model runs unmodified from /root/reference with shims ONLY for
packages this image lacks (torchvision roi_align, torch_geometric GATv2Conv —
tests/ref_shims.py), random weights (zero egress), eval mode, no_grad.

Usage: JAX side forces the CPU backend; run on any host.
Prints one JSON line with both numbers.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

BATCH = 12
H, W = 128, 256
T_IN, T_PRED = 1, 5
N_OBJ = 8          # real tracked objects per sample
ITERS = 3


def build_reference_inputs(torch, yaml_cfg):
    """Synthetic batch shaped exactly like the reference test loader output
    (src/test.py:19-38 collate + src/datasets/cityscapes.py:301-326)."""
    g = torch.Generator().manual_seed(0)
    t = T_IN + T_PRED
    video = torch.rand((BATCH, 3, t, H, W), generator=g)
    bg = torch.zeros((BATCH, 11, t, H, W))
    bg[:, 0] = 1.0
    fg = torch.zeros((BATCH, 9, t, H, W))
    inst = torch.zeros((BATCH, 1, t, H, W))
    # N_OBJ rectangular instances per sample, ids 26001.. (car class 26)
    n_total = BATCH * N_OBJ
    rois = torch.zeros((n_total, T_IN, 4))
    inst_ids = torch.zeros((n_total, T_IN))
    for b in range(BATCH):
        for k in range(N_OBJ):
            iid = 26000 + k + 1
            x1 = 16 + 28 * k
            y1 = 24 + 8 * (k % 3)
            x2, y2 = x1 + 24, y1 + 20
            inst[b, 0, :, y1:y2, x1:x2] = iid
            fg[b, 2, :, y1:y2, x1:x2] = 1.0
            idx = b * N_OBJ + k
            rois[idx, 0] = torch.tensor([x1, y1, x2, y2], dtype=torch.float)
            inst_ids[idx, 0] = iid
    # with num_input_frames == 1 there are no between-input flows; the
    # reference evaluator passes None (evaluator.py:161-163)
    input_of = None
    input_occ = None

    # fully-connected edge_index per graph, batch offsets
    # (reference cityscapes.py:173-175)
    edges = []
    for b in range(BATCH):
        off = b * N_OBJ
        for i in range(N_OBJ):
            for j in range(N_OBJ):
                if i != j:
                    edges.append((off + i, off + j))
    edge_index = torch.tensor(edges, dtype=torch.long).T

    # node features [cy, cx (norm -1..1), h, w, one-hot(19)] per input frame
    # (reference cityscapes.py:143-145; data.x is [n, T_in, F])
    x = torch.zeros((n_total, T_IN, 23))
    x[:, :, 0] = ((rois[:, :, 1] + rois[:, :, 3]) / H - 1.0)
    x[:, :, 1] = ((rois[:, :, 0] + rois[:, :, 2]) / W - 1.0)
    x[:, :, 2] = (rois[:, :, 3] - rois[:, :, 1]) / H
    x[:, :, 3] = (rois[:, :, 2] - rois[:, :, 0]) / W
    x[:, :, 4 + 13] = 1.0  # car trainId 13
    targets_theta = torch.zeros((n_total, T_PRED, 6))
    targets_theta[:, :, 0] = 1.0
    targets_theta[:, :, 4] = 1.0
    targets_theta[:, :, 2] = torch.linspace(
        0.01, 0.05, T_PRED)[None].repeat(n_total, 1)

    gnn = types.SimpleNamespace(
        x=x,
        edge_index=edge_index,
        targets_theta=targets_theta,
        batch=torch.arange(BATCH).repeat_interleave(N_OBJ),
        num_nodes=n_total,
        num_real_nodes=torch.full((BATCH,), N_OBJ, dtype=torch.long),
        source_frames_nodes_roi_padded=rois,
        source_frames_nodes_instance_ids=inst_ids,
    )
    return dict(video=video, bg_mask=bg, fg_mask=fg, instance_mask=inst,
                input_of=input_of, input_occ=input_occ, tracking_gnn=gnn)


def bench_reference():
    import torch

    # the reference hard-codes .cuda(get_device()) inside resample/normalize
    # (src/utils/ops.py:202); on CPU get_device() is -1 — make .cuda a no-op
    # so the unmodified model runs on this host
    torch.Tensor.cuda = lambda self, *a, **k: self

    from tests.ref_shims import add_ref_paths
    add_ref_paths()
    import yaml
    with open("/root/reference/src/config/c2m_journal_cityscapes.yaml") as f:
        cfg = yaml.safe_load(f)
    from modules.model import GeneratorFullModel
    # the shipped test_params yaml section omits keys the modules read
    # (use_fw_of etc.); test_params overlays train_params, matching the keys
    # the reference's own test run would need
    test_params = {**cfg["train_params"], **cfg["test_params"]}
    model_params = cfg["model_params"]
    model_params["generator"].setdefault("use_spade", False)  # SURVEY §2.1 quirk
    torch.manual_seed(0)
    c2m = GeneratorFullModel(train_params=test_params,
                             model_params=model_params, is_inference=True,
                             dataset=cfg["dataset_params"]["dataset"])
    c2m.eval()
    inputs = build_reference_inputs(torch, cfg)
    iug = torch.zeros((BATCH,), dtype=torch.long)
    iug += torch.arange(BATCH) * N_OBJ  # first node of each graph
    z_m = torch.randn((BATCH, 1024))

    times = []
    with torch.no_grad():
        for i in range(ITERS + 1):
            t0 = time.perf_counter()
            out = c2m.inference(inputs["video"], inputs["bg_mask"],
                                inputs["fg_mask"], inputs["instance_mask"],
                                inputs["input_of"], inputs["input_occ"],
                                inputs["tracking_gnn"], iug, z_m)
            assert out["generated"].shape[0] == BATCH
            dt = time.perf_counter() - t0
            if i > 0:  # drop the first (allocator warmup)
                times.append(dt)
            print(f"  reference iter {i}: {dt:.2f} s", file=sys.stderr,
                  flush=True)
    return min(times)


def bench_ours():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator

    cfg = _flagship_cfg(h=H, w=W, batch=BATCH, max_objects=N_OBJ,
                        dtype="float32")  # fp32 CPU, same as torch
    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch, train=False)
    click = jax.nn.one_hot(jnp.zeros((BATCH,), jnp.int32), N_OBJ)

    @jax.jit
    def infer(v, bt, z):
        return model.apply(v, bt, z, click, method="inference",
                           rngs={"sample": key})["generated"]

    times = []
    for i in range(ITERS + 1):
        z = jax.random.normal(jax.random.PRNGKey(i), (BATCH, 1024))
        t0 = time.perf_counter()
        infer(variables, batch, z).block_until_ready()  # real CPU: sync works
        dt = time.perf_counter() - t0
        if i > 0:  # drop compile
            times.append(dt)
        print(f"  ours iter {i}: {dt:.2f} s", file=sys.stderr, flush=True)
    return min(times)


BATCH_TRAIN = 3    # the reference's train batch/GPU (yaml:166)
TRAIN_ITERS = 2


def build_reference_train_inputs(torch):
    """Training batch = the inference batch + GT flow/occlusion targets
    (reference train loader output, src/datasets/cityscapes.py:301-326)."""
    inputs = build_reference_inputs(torch, None)
    g = torch.Generator().manual_seed(1)

    def cut(v):
        return v[:BATCH_TRAIN] if torch.is_tensor(v) else v

    data = {k: cut(v) for k, v in inputs.items()}
    gnn = data["tracking_gnn"]
    keep = BATCH_TRAIN * N_OBJ
    edges = []
    for b in range(BATCH_TRAIN):
        off = b * N_OBJ
        for i in range(N_OBJ):
            for j in range(N_OBJ):
                if i != j:
                    edges.append((off + i, off + j))
    gnn.x = gnn.x[:keep]
    gnn.edge_index = torch.tensor(edges, dtype=torch.long).T
    gnn.targets_theta = gnn.targets_theta[:keep]
    gnn.batch = torch.arange(BATCH_TRAIN).repeat_interleave(N_OBJ)
    gnn.num_nodes = keep
    gnn.num_real_nodes = gnn.num_real_nodes[:BATCH_TRAIN]
    gnn.source_frames_nodes_roi_padded = \
        gnn.source_frames_nodes_roi_padded[:keep]
    gnn.source_frames_nodes_instance_ids = \
        gnn.source_frames_nodes_instance_ids[:keep]
    data["target_bw_of"] = torch.randn((BATCH_TRAIN, 2, T_PRED, H, W),
                                       generator=g) * 2.0
    data["target_bw_occ"] = (torch.rand((BATCH_TRAIN, 1, T_PRED, H, W),
                                        generator=g) > 0.2).float()
    return data


def bench_reference_train():
    """The reference's actual hot loop: update_model = forward + 3 backwards
    + 4 optimizer steps (src/trainer/trainer.py:138-168), unmodified
    GeneratorFullModel in train mode on this CPU."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    from tests.ref_shims import add_ref_paths
    add_ref_paths()
    # the reference's perceptual loss builds torchvision vgg19(pretrained=
    # True) (src/modules/layers/vgg.py:13); weights are zero-egress, and the
    # timing doesn't depend on weight VALUES — serve the exact architecture
    # with random init through the shim
    import types as _types
    import torchvision
    from tests.test_converters import _torch_vgg19_features
    torchvision.models.vgg19 = lambda *a, **k: _types.SimpleNamespace(
        features=_torch_vgg19_features())
    import yaml
    with open("/root/reference/src/config/c2m_journal_cityscapes.yaml") as f:
        cfg = yaml.safe_load(f)
    from modules.model import GeneratorFullModel
    train_params = dict(cfg["train_params"])
    train_params["batch_size"] = BATCH_TRAIN
    model_params = cfg["model_params"]
    model_params["generator"].setdefault("use_spade", False)
    torch.manual_seed(0)
    c2m = GeneratorFullModel(train_params=train_params,
                             model_params=model_params, is_inference=False,
                             dataset=cfg["dataset_params"]["dataset"])
    c2m.train()
    data = build_reference_train_inputs(torch)
    loss_weights = train_params["loss_weights"]

    def update_model():
        # trainer.py:138-168 verbatim flow
        c2m.optimizer.zero_grad(set_to_none=True)
        c2m.optimizer_gnn.zero_grad(set_to_none=True)
        c2m.d_optimizer_image.zero_grad(set_to_none=True)
        c2m.d_optimizer_video.zero_grad(set_to_none=True)
        generated, loss_gen, loss_di, loss_dv = c2m(data)
        loss = torch.tensor(0.)
        for key in loss_gen:
            loss = loss + loss_gen[key] * loss_weights[key]
        ((loss_di.get("d_real", 0) + loss_di.get("d_fake", 0)) * 0.5).backward()
        ((loss_dv.get("d_real", 0) + loss_dv.get("d_fake", 0)) * 0.5).backward()
        loss.backward()
        c2m.optimizer.step()
        c2m.optimizer_gnn.step()
        c2m.d_optimizer_image.step()
        c2m.d_optimizer_video.step()
        return float(loss.detach())

    times = []
    for i in range(TRAIN_ITERS + 1):
        t0 = time.perf_counter()
        total = update_model()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
        print(f"  reference train iter {i}: {dt:.2f} s (total_gen {total:.2f})",
              file=sys.stderr, flush=True)
    return min(times)


def bench_ours_train():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship_cfg
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.train.step import make_train_step

    cfg = _flagship_cfg(h=H, w=W, batch=BATCH_TRAIN, max_objects=N_OBJ,
                        dtype="float32")
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    state = create_train_state(cfg, C2MTrainModel(cfg), key, batch)
    step = make_train_step(cfg, donate=False)
    times = []
    for i in range(TRAIN_ITERS + 1):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        total = float(metrics["total_gen"])   # fetch = sync
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
        print(f"  ours train iter {i}: {dt:.2f} s (total_gen {total:.2f})",
              file=sys.stderr, flush=True)
    return min(times)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {"batch": BATCH, "hw": f"{H}x{W}", "frames": BATCH * T_PRED,
           "host": "1-core CPU, fp32, eval/no_grad vs jit"}
    if which in ("both", "reference"):
        t_ref = bench_reference()
        out["reference_torch_s_per_batch"] = round(t_ref, 3)
        out["reference_torch_frames_per_sec"] = round(BATCH * T_PRED / t_ref, 3)
    if which in ("both", "ours"):
        t_ours = bench_ours()
        out["c2m_tpu_jax_s_per_batch"] = round(t_ours, 3)
        out["c2m_tpu_jax_frames_per_sec"] = round(BATCH * T_PRED / t_ours, 3)
    if which == "both":
        out["speedup_same_cpu"] = round(t_ref / t_ours, 3)
    if which in ("train", "both-train"):
        t_ref = bench_reference_train()
        out["train_batch"] = BATCH_TRAIN
        out["reference_torch_train_s_per_step"] = round(t_ref, 3)
        t_ours = bench_ours_train()
        out["c2m_tpu_jax_train_s_per_step"] = round(t_ours, 3)
        out["train_speedup_same_cpu"] = round(t_ref / t_ours, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
