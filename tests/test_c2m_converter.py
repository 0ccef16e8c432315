"""Full-model C2M checkpoint conversion: executed forward parity.

tools/convert_c2m.py maps the reference GeneratorFullModel state_dict
(src/modules/model.py:30, the `latest_c2m_model.pth.tar` payload) onto our
variable tree. This test builds the UNMODIFIED reference model (shims only
for missing packages), randomizes its BN running stats (so stat mis-pairing
can't hide), converts, and compares whole-model INFERENCE outputs on
identical inputs — the end-to-end numerical-parity proof for the entire
rebuild (every live submodule participates: appearance encoder, click GNN,
raster, sparse pyramid, dense decoder, generator).
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_shims import add_ref_paths, randomize_bn_stats

import torch  # noqa: E402

# 128x256 is the smallest size the reference runs at (its zconv reflect-pads
# the [h/64, w/64] map, which must be >= 2x2)
B, H, W = 2, 128, 256
T_IN, T_PRED = 1, 5
N_OBJ = 4


def _ref_cfg():
    import yaml
    with open("/root/reference/src/config/c2m_journal_cityscapes.yaml") as f:
        cfg = yaml.safe_load(f)
    tp = {**cfg["train_params"], **cfg["test_params"]}
    tp["input_size"] = [H, W]
    tp["batch_size"] = B
    mp = cfg["model_params"]
    mp["generator"].setdefault("use_spade", False)
    return tp, mp


def _our_cfg(dataset="synthetic"):
    from c2m_tpu.config import Config
    cfg = Config()
    cfg.dataset_params.dataset = dataset
    cfg.dataset_params.max_objects = N_OBJ
    cfg.train_params.input_size = [H, W]
    cfg.train_params.num_predicted_frames = T_PRED
    cfg.train_params.batch_size = B
    cfg.train_params.dtype = "float32"
    cfg.test_params.input_size = [H, W]
    cfg.test_params.num_predicted_frames = T_PRED
    return cfg.validate()


def _build_inputs(integer_disp=False):
    """One synthetic scene in BOTH layouts (reference channels-first tensors
    + our channels-last batch), identical values; mirrors the reference test
    loader output (src/test.py:19-38, src/datasets/cityscapes.py:301-326).

    integer_disp=True uses HALF-integer pixel displacements: every warped
    mask value is then exactly 1.0 (interior) or 0.5 (edge) on both sides,
    so the coverage predicates (the reference's razor-edged ``warped == 1``,
    dense_motion.py:137, vs our >= 1-eps) agree everywhere — no
    winner-flip ambiguity, STRICT whole-model parity expected. (Exact
    integer shifts are WORSE: torch's grid_sample hits fp-rounded 0.99999...
    at some exactly-integer sample positions and the reference's ==1 drops
    whole interior columns.)"""
    g = torch.Generator().manual_seed(0)
    t = T_IN + T_PRED
    video = torch.rand((B, 3, t, H, W), generator=g)
    bg = torch.zeros((B, 11, t, H, W))
    bg[:, 0] = 1.0
    fg = torch.zeros((B, 9, t, H, W))
    inst = torch.zeros((B, 1, t, H, W))
    n_total = B * N_OBJ
    rois = torch.zeros((n_total, T_IN, 4))
    inst_ids = torch.zeros((n_total, T_IN))
    for b in range(B):
        for k in range(N_OBJ):
            iid = 13000 + k + 1          # car trainId 13 instances
            x1, y1 = 10 + 24 * k, 16 + 6 * (k % 2)
            x2, y2 = x1 + 20, y1 + 16
            inst[b, 0, :, y1:y2, x1:x2] = iid
            fg[b, 2, :, y1:y2, x1:x2] = 1.0
            bg[b, 0, :, y1:y2, x1:x2] = 0.0
            idx = b * N_OBJ + k
            rois[idx, 0] = torch.tensor([x1, y1, x2, y2], dtype=torch.float)
            inst_ids[idx, 0] = iid
    edges = []
    for b in range(B):
        off = b * N_OBJ
        edges += [(off + i, off + j) for i in range(N_OBJ)
                  for j in range(N_OBJ) if i != j]
    edge_index = torch.tensor(edges, dtype=torch.long).T
    x = torch.zeros((n_total, T_IN, 23))
    x[:, :, 0] = ((rois[:, :, 1] + rois[:, :, 3]) / H - 1.0)
    x[:, :, 1] = ((rois[:, :, 0] + rois[:, :, 2]) / W - 1.0)
    x[:, :, 2] = (rois[:, :, 3] - rois[:, :, 1]) / H
    x[:, :, 3] = (rois[:, :, 2] - rois[:, :, 0]) / W
    x[:, :, 4 + 13] = 1.0
    tt = torch.zeros((n_total, T_PRED, 6))
    tt[:, :, 0] = 1.0
    tt[:, :, 4] = 1.0
    if integer_disp:
        px = torch.arange(1, T_PRED + 1, dtype=torch.float) + 0.5  # 1.5..5.5
        tt[:, :, 2] = (2.0 * px / W)[None].repeat(n_total, 1)
        tt[:, :, 5] = (2.0 * px / H)[None].repeat(n_total, 1)
    else:
        tt[:, :, 2] = torch.linspace(0.02, 0.08, T_PRED)[None].repeat(n_total, 1)
        tt[:, :, 5] = torch.linspace(0.01, 0.03, T_PRED)[None].repeat(n_total, 1)
    gnn = types.SimpleNamespace(
        x=x, edge_index=edge_index, targets_theta=tt,
        batch=torch.arange(B).repeat_interleave(N_OBJ),
        num_nodes=n_total,
        num_real_nodes=torch.full((B,), N_OBJ, dtype=torch.long),
        source_frames_nodes_roi_padded=rois,
        source_frames_nodes_instance_ids=inst_ids)
    ref = dict(video=video, bg_mask=bg, fg_mask=fg, instance_mask=inst,
               input_of=None, input_occ=None, tracking_gnn=gnn)

    def cl(v):  # [B, C, T, H, W] -> [B, T, H, W, C]
        return jnp.asarray(v.numpy().transpose(0, 2, 3, 4, 1))

    ours = {
        "video": cl(video), "bg_mask": cl(bg), "fg_mask": cl(fg),
        "instance_mask": cl(inst),
        "nodes_x": jnp.asarray(x[:, 0].numpy().reshape(B, N_OBJ, 23)),
        "targets_theta": jnp.asarray(
            tt.numpy().reshape(B, N_OBJ, T_PRED, 6)),
        "rois_padded": jnp.asarray(rois[:, 0].numpy().reshape(B, N_OBJ, 4)),
        "inst_ids": jnp.asarray(
            inst_ids[:, 0].numpy().reshape(B, N_OBJ).astype(np.int32)),
        "node_mask": jnp.ones((B, N_OBJ), bool),
        "num_real_nodes": jnp.full((B,), N_OBJ, jnp.int32),
    }
    return ref, ours


@pytest.fixture(scope="module")
def converted():
    torch.Tensor.cuda = lambda self, *a, **k: self
    add_ref_paths()
    tp, mp = _ref_cfg()
    # is_inference=False builds the FULL model (VGG + discriminators) so the
    # whole checkpoint payload converts; vgg19 weights are zero-egress ->
    # serve the exact architecture random-init through the shim
    import torchvision
    from tests.test_converters import _torch_vgg19_features
    _orig_vgg19 = torchvision.models.vgg19
    torchvision.models.vgg19 = lambda *a, **k: types.SimpleNamespace(
        features=_torch_vgg19_features())
    from modules.model import GeneratorFullModel
    torch.manual_seed(0)
    c2m = GeneratorFullModel(train_params=tp, model_params=mp,
                             is_inference=False, dataset="cityscapes")
    torchvision.models.vgg19 = _orig_vgg19   # un-leak the process-wide patch
    randomize_bn_stats(c2m, seed=7)
    c2m.eval()

    ref_in, our_batch = _build_inputs()
    iug = torch.arange(B, dtype=torch.long) * N_OBJ     # node 0 per graph
    z_m = torch.randn((B, 1024), generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        out_ref = c2m.inference(ref_in["video"], ref_in["bg_mask"],
                                ref_in["fg_mask"], ref_in["instance_mask"],
                                ref_in["input_of"], ref_in["input_occ"],
                                ref_in["tracking_gnn"], iug, z_m)

    from tools.convert_c2m import convert_state_dict
    cfg = _our_cfg()
    sd = {k: v.numpy() for k, v in c2m.state_dict().items()}
    tree = convert_state_dict(sd, cfg)
    return cfg, tree, our_batch, z_m.numpy(), out_ref


def test_tree_structure_matches_init(converted):
    """Converted tree has exactly the paths+shapes create_train_state makes."""
    import jax.tree_util as jtu
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    cfg, tree, _, _, _ = converted
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    state = create_train_state(cfg, C2MTrainModel(cfg), jax.random.PRNGKey(0),
                               batch)
    for name, ours in (("params", state.params),
                       ("batch_stats", state.batch_stats),
                       ("spectral", state.spectral)):
        want = [(jtu.keystr(k), np.shape(v))
                for k, v in jtu.tree_leaves_with_path(ours)]
        got = [(jtu.keystr(k), np.shape(v))
               for k, v in jtu.tree_leaves_with_path(tree[name])]
        assert sorted(got) == sorted(want), name


def test_full_model_inference_parity(converted):
    """Whole-model inference equality on identical inputs: the converted
    reference weights must generate the same frames/flows here."""
    from c2m_tpu.train.model import C2MTrainModel
    cfg, tree, batch, z_m, out_ref = converted
    model = C2MTrainModel(cfg)
    click = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), N_OBJ)
    out = model.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"],
         "spectral": tree["spectral"]},
        batch, jnp.asarray(z_m), click, True, method="inference",
        rngs={"sample": jax.random.PRNGKey(0)})

    # GNN thetas: reference emits theta_{t} [n_total, 6]
    ref_thetas = np.stack([out_ref[f"theta_{t}"].numpy()
                           for t in range(T_PRED)], axis=1)  # [n, Tp, 6]
    got_thetas = np.asarray(out["thetas"]).reshape(B * N_OBJ, T_PRED, 6)
    np.testing.assert_allclose(got_thetas, ref_thetas, atol=2e-4, rtol=1e-3)

    def cl(t):  # [B, C, Tp, H, W] -> [B, Tp, H, W, C]
        return t.numpy().transpose(0, 2, 3, 4, 1)

    # GENERATED FRAMES: the headline parity claim — strict
    ref_gen = cl(out_ref["generated"])
    got_gen = np.asarray(out["generated"])
    assert got_gen.shape == ref_gen.shape
    np.testing.assert_allclose(got_gen, ref_gen, atol=2e-3)

    # sparse occlusion composits exactly
    np.testing.assert_array_equal(np.asarray(out["sparse_occ_bw"]),
                                  cl(out_ref["sparse_occ_bw"]))

    # Flows agree everywhere EXCEPT isolated winner-flip pixels: the raster
    # composites thresholded warped-mask coverage, so fp-reordering-level
    # mass differences at box edges flip a pixel between an object's flow
    # and the background (the eps sensitivity documented at ops/raster.py).
    # Measured structure (this test's fixture): sparse flow q99.9 ~ 8e-6
    # with 0.01% flipped pixels; the decoder's resampled skips smear those
    # edges to ~2% of dense-flow pixels; the occlusion-masked generator is
    # immune (generated max diff ~2e-4, asserted strictly above).
    ref_sp = cl(out_ref["sparse_motion_bw"])
    got_sp = np.asarray(out["sparse_motion_bw"])
    d = np.abs(got_sp - ref_sp)
    assert np.quantile(d, 0.999) < 1e-4
    assert (d > 1e-2).mean() < 1e-3
    d = np.abs(np.asarray(out["dense_motion_bw"])
               - cl(out_ref["dense_motion_bw"]))
    assert np.median(d) < 1e-3 and d.mean() < 5e-3
    assert (d > 1e-2).mean() < 0.05
    d = np.abs(np.asarray(out["occlusion_bw"]) - cl(out_ref["occlusion_bw"]))
    assert d.mean() < 1e-3 and (d > 5e-2).mean() < 0.005


@pytest.mark.skipif(__import__("os").environ.get("C2M_HEAVY_TESTS") != "1",
                    reason="set C2M_HEAVY_TESTS=1")
def test_convert_cli_roundtrip(converted, tmp_path):
    """The CLI path: torch .pth.tar payload -> framework checkpoint dir that
    utils/checkpoint.load_checkpoint restores (what test.py consumes)."""
    import sys
    cfg, tree, _, _, _ = converted
    # fake reference checkpoint: the trainer's save format (trainer.py:245)
    torch.Tensor.cuda = lambda self, *a, **k: self
    add_ref_paths()
    tp, mp = _ref_cfg()
    import torchvision
    from tests.test_converters import _torch_vgg19_features
    _orig_vgg19 = torchvision.models.vgg19
    torchvision.models.vgg19 = lambda *a, **k: types.SimpleNamespace(
        features=_torch_vgg19_features())
    from modules.model import GeneratorFullModel
    torch.manual_seed(0)
    c2m = GeneratorFullModel(train_params=tp, model_params=mp,
                             is_inference=False, dataset="cityscapes")
    torchvision.models.vgg19 = _orig_vgg19   # un-leak the process-wide patch
    pth = tmp_path / "latest_c2m_model.pth.tar"
    torch.save({"c2m": c2m.state_dict()}, pth)

    import yaml as _yaml
    with open("configs/c2m_journal_cityscapes.yaml") as f:
        ycfg = _yaml.safe_load(f)
    ycfg["dataset_params"]["dataset"] = "synthetic"
    ycfg["dataset_params"]["max_objects"] = N_OBJ
    ycfg["train_params"]["batch_size"] = 1
    ycfg["name"] = "conv_cli"
    ypath = tmp_path / "cfg.yaml"
    with open(ypath, "w") as f:
        _yaml.safe_dump(ycfg, f)

    from tools import convert_c2m
    out_dir = tmp_path / "jobdir"
    argv = sys.argv
    sys.argv = ["convert_c2m", "--checkpoint", str(pth),
                "--config", str(ypath), "--out", str(out_dir)]
    try:
        convert_c2m.main()
    finally:
        sys.argv = argv

    from c2m_tpu.config import Config
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.utils.checkpoint import load_checkpoint
    lcfg = Config.from_yaml(str(ypath))
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(lcfg, batch_size=1, seed=0).items()}
    state = create_train_state(lcfg, C2MTrainModel(lcfg),
                               jax.random.PRNGKey(0), batch)
    state, epoch, _ = load_checkpoint(str(out_dir), state)
    # restored params equal the converted tree (spot-check one deep leaf)
    got = np.asarray(state.params["c2m"]["generator"]["final"]["Conv_0"]["kernel"])
    want = _np_conv2d(c2m.state_dict()["generator.final.0.weight"].numpy())
    np.testing.assert_array_equal(got, want)


def _np_conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


@pytest.fixture(scope="module")
def converted_kitti():
    """KITTI model family: the generator grows the warped-image encoder
    branch (reference generator.py:37-48); convert + parity for it too."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    add_ref_paths()
    tp, mp = _ref_cfg()
    import torchvision
    from tests.test_converters import _torch_vgg19_features
    _orig_vgg19 = torchvision.models.vgg19
    torchvision.models.vgg19 = lambda *a, **k: types.SimpleNamespace(
        features=_torch_vgg19_features())
    from modules.model import GeneratorFullModel
    torch.manual_seed(1)
    c2m = GeneratorFullModel(train_params=tp, model_params=mp,
                             is_inference=False, dataset="kitti")
    torchvision.models.vgg19 = _orig_vgg19   # un-leak the process-wide patch
    randomize_bn_stats(c2m, seed=11)
    c2m.eval()
    ref_in, our_batch = _build_inputs(integer_disp=True)
    iug = torch.arange(B, dtype=torch.long) * N_OBJ
    z_m = torch.randn((B, 1024), generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        out_ref = c2m.inference(ref_in["video"], ref_in["bg_mask"],
                                ref_in["fg_mask"], ref_in["instance_mask"],
                                ref_in["input_of"], ref_in["input_occ"],
                                ref_in["tracking_gnn"], iug, z_m)
    from tools.convert_c2m import convert_state_dict
    cfg = _our_cfg(dataset="kitti")
    sd = {k: v.numpy() for k, v in c2m.state_dict().items()}
    tree = convert_state_dict(sd, cfg)
    return cfg, tree, our_batch, z_m.numpy(), out_ref


def test_kitti_model_inference_parity(converted_kitti):
    from c2m_tpu.train.model import C2MTrainModel
    cfg, tree, batch, z_m, out_ref = converted_kitti
    model = C2MTrainModel(cfg)
    click = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), N_OBJ)
    out = model.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"],
         "spectral": tree["spectral"]},
        batch, jnp.asarray(z_m), click, True, method="inference",
        rngs={"sample": jax.random.PRNGKey(0)})
    ref_gen = out_ref["generated"].numpy().transpose(0, 2, 3, 4, 1)
    got_gen = np.asarray(out["generated"])
    assert got_gen.shape == ref_gen.shape
    # the kitti branch warps the FULL-RES image by the dense flow; fp-level
    # flow wiggle flips bilinear floor() at a handful of near-integer sample
    # positions (measured: 0.4% of pixels, max 5e-3) — assert that structure
    d = np.abs(got_gen - ref_gen)
    assert d.max() < 1e-2 and (d > 1e-3).mean() < 0.05, (
        d.max(), (d > 1e-3).mean())


@pytest.fixture(scope="module")
def converted_spade():
    """use_spade=True family: SPADE residual up blocks + FlowEmbedder."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    add_ref_paths()
    tp, mp = _ref_cfg()
    mp = {**mp, "generator": {**mp["generator"], "use_spade": True}}
    import torchvision
    from tests.test_converters import _torch_vgg19_features
    _orig_vgg19 = torchvision.models.vgg19
    torchvision.models.vgg19 = lambda *a, **k: types.SimpleNamespace(
        features=_torch_vgg19_features())
    from modules.model import GeneratorFullModel
    torch.manual_seed(2)
    c2m = GeneratorFullModel(train_params=tp, model_params=mp,
                             is_inference=False, dataset="cityscapes")
    torchvision.models.vgg19 = _orig_vgg19   # un-leak the process-wide patch
    randomize_bn_stats(c2m, seed=13)
    c2m.eval()
    ref_in, our_batch = _build_inputs(integer_disp=True)
    iug = torch.arange(B, dtype=torch.long) * N_OBJ
    z_m = torch.randn((B, 1024), generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        out_ref = c2m.inference(ref_in["video"], ref_in["bg_mask"],
                                ref_in["fg_mask"], ref_in["instance_mask"],
                                ref_in["input_of"], ref_in["input_occ"],
                                ref_in["tracking_gnn"], iug, z_m)
    from tools.convert_c2m import convert_state_dict
    cfg = _our_cfg()
    cfg.model_params.generator.use_spade = True
    sd = {k: v.numpy() for k, v in c2m.state_dict().items()}
    tree = convert_state_dict(sd, cfg)
    return cfg, tree, our_batch, z_m.numpy(), out_ref


def test_spade_model_inference_parity(converted_spade):
    from c2m_tpu.train.model import C2MTrainModel
    cfg, tree, batch, z_m, out_ref = converted_spade
    model = C2MTrainModel(cfg)
    click = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), N_OBJ)
    out = model.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"],
         "spectral": tree["spectral"]},
        batch, jnp.asarray(z_m), click, True, method="inference",
        rngs={"sample": jax.random.PRNGKey(0)})
    ref_gen = out_ref["generated"].numpy().transpose(0, 2, 3, 4, 1)
    got_gen = np.asarray(out["generated"])
    assert got_gen.shape == ref_gen.shape
    # SPADE warps the full-res image into the embedder and its InstanceNorms
    # are global — allow the same boundary-flip structure as the kitti test
    d = np.abs(got_gen - ref_gen)
    assert d.max() < 1e-2 and (d > 1e-3).mean() < 0.05, (
        d.max(), (d > 1e-3).mean())
