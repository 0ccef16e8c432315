"""Offline preprocessing chain executed end-to-end (VERDICT r2 #2).

Runs the real CLI drivers in-process (runpy, CPU-forced by conftest) over a
tiny synthetic street scene, mirroring the reference's program chain
(SURVEY.md §3.4):

  raw frames -> tools/generate_segmentation.py (random-weight HRNet; output
  contract asserted) -> tools/preprocess_images.py (bicubic frames + nearest
  maps) -> SiamRPN tracking + instance matching via
  tools/generate_trajectories.py -> tools/generate_lists.py ->
  tools/precompute_flow.py (random-weight FlowNet2) -> ClipDataset loads the
  produced directory -> one train step runs finite.

Pretrained panoptic weights are zero-egress, and a random-init segmenter
emits noise maps — so after executing generate_segmentation and asserting
its file contract, crafted GT-quality semantic/instance maps (a moving car
on a road/sky gradient) stand in for its output for the rest of the chain,
exactly where the reference's workflow would consume panoptic inference
(generate_trajectory_cityscapes.py:204-260). Threshold DEFAULTS are pinned
to the reference in tests/test_trajectories.py; here the random-init
tracker needs them relaxed via the tool's documented smoke flags.

Heavy-gated: the chain runs SiamRPN + FlowNet2 + a train-step compile on
one CPU core (~30 min).
"""

import os
import runpy
import sys

import numpy as np
import pytest
from PIL import Image

HEAVY = os.environ.get("C2M_HEAVY_TESTS") == "1"
pytestmark = pytest.mark.skipif(not HEAVY, reason="set C2M_HEAVY_TESTS=1")

CITY = "syntown"
RAW_H, RAW_W = 128, 256          # the scene's "full-res" sequence
TRAIN_H, TRAIN_W = 64, 128       # training resolution
N_FRAMES = 30                    # one reference clip group
CAR_IID = 13001                  # car trainId 13 * label_divisor + 1: the
# panoptic pipeline writes instance ids as trainId*1000+k
# (generate_segmentation.py), and load_scene_nodes one-hots iid//1000 over
# the 19 trainIds


def _run_tool(tool, argv):
    old = sys.argv
    sys.argv = [tool] + argv
    try:
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "tools",
                                    tool), run_name="__main__")
    finally:
        sys.argv = old


def _paint_scene(root):
    """30 raw frames: gradient road/sky + a bright car moving right 2 px/frame,
    plus full-res GT-quality semantic/instance maps."""
    img_dir = os.path.join(root, "raw", CITY)
    sem_dir = os.path.join(root, "gt_semantic", CITY)
    inst_dir = os.path.join(root, "gt_instance", CITY)
    for d in (img_dir, sem_dir, inst_dir):
        os.makedirs(d, exist_ok=True)
    for f in range(N_FRAMES):
        img = np.zeros((RAW_H, RAW_W, 3), np.uint8)
        img[:RAW_H // 2] = (70, 130, 180)            # sky
        img[RAW_H // 2:] = (90, 90, 90)              # road
        x = 30 + 2 * f
        y, bw, bh = 40, 40, 24
        img[y:y + bh, x:x + bw] = (220, 40, 40)      # car
        sem = np.zeros((RAW_H, RAW_W), np.uint8)
        sem[:RAW_H // 2] = 10                        # sky trainId
        sem[RAW_H // 2:] = 0                         # road trainId
        sem[y:y + bh, x:x + bw] = 13                 # car trainId
        inst = np.zeros((RAW_H, RAW_W), np.int32)
        inst[y:y + bh, x:x + bw] = CAR_IID
        stem = f"{CITY}_000000_{f:06d}"
        Image.fromarray(img).save(
            os.path.join(img_dir, f"{stem}_leftImg8bit.png"))
        Image.fromarray(sem).save(
            os.path.join(sem_dir, f"{stem}_ssmask.png"))
        Image.fromarray(inst, mode="I").save(
            os.path.join(inst_dir, f"{stem}_gtFine_instanceIds.png"))


@pytest.fixture(scope="module")
def chain_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chain"))
    _paint_scene(root)
    return root


def test_a_generate_segmentation_contract(chain_root):
    """Execute the segmentation driver (random weights) on 2 frames and
    assert the reference output contract: *_ssmask.png uint8 trainIds +
    *_gtFine_instanceIds.png 32-bit maps, mirrored directory layout
    (panoptic_deeplab/tools/generate_segmentation.py:296-306)."""
    out_sem = os.path.join(chain_root, "seg_out_semantic")
    out_inst = os.path.join(chain_root, "seg_out_instance")
    _run_tool("generate_segmentation.py", [
        "--images-root", os.path.join(chain_root, "raw"),
        "--out-semantic", out_sem, "--out-instance", out_inst,
        "--size", str(RAW_H), str(RAW_W), "--limit", "2"])
    sem_files = sorted(os.listdir(os.path.join(out_sem, CITY)))
    inst_files = sorted(os.listdir(os.path.join(out_inst, CITY)))
    assert sem_files == [f"{CITY}_000000_{f:06d}_ssmask.png"
                         for f in range(2)]
    assert inst_files == [f"{CITY}_000000_{f:06d}_gtFine_instanceIds.png"
                          for f in range(2)]
    sem = np.array(Image.open(os.path.join(out_sem, CITY, sem_files[0])))
    inst = np.array(Image.open(os.path.join(out_inst, CITY, inst_files[0])))
    assert sem.shape == (RAW_H, RAW_W) and sem.dtype == np.uint8
    assert sem.max() <= 18                      # trainIds
    # PNG carries the 32-bit map as 16-bit grayscale (PIL mode "I"); ids are
    # cls*1000+k <= 18999, losslessly representable — same as real
    # Cityscapes instanceIds pngs
    assert inst.shape == (RAW_H, RAW_W)
    assert inst.dtype in (np.uint16, np.int32), inst.dtype
    # thing instances are cls*1000+k with cls in 11..18 (label_divisor 1000)
    things = np.unique(inst[inst > 1000])
    assert all(11 <= v // 1000 <= 18 for v in things)


def test_b_full_chain_to_train_step(chain_root):
    import jax
    import jax.numpy as jnp

    root = chain_root
    # --- resize: frames bicubic, maps nearest (preprocess_city.py:11-78) ---
    _run_tool("preprocess_images.py", [
        "--src", os.path.join(root, "raw"),
        "--dst", os.path.join(root, "train_images"),
        "--height", str(TRAIN_H), "--width", str(TRAIN_W)])
    _run_tool("preprocess_images.py", [
        "--src", os.path.join(root, "gt_semantic"),
        "--dst", os.path.join(root, "train_semantic"),
        "--height", str(TRAIN_H), "--width", str(TRAIN_W), "--nearest"])
    _run_tool("preprocess_images.py", [
        "--src", os.path.join(root, "gt_instance"),
        "--dst", os.path.join(root, "train_instance"),
        "--height", str(TRAIN_H), "--width", str(TRAIN_W), "--nearest"])
    resized = np.array(Image.open(os.path.join(
        root, "train_images", CITY, f"{CITY}_000000_000000_leftImg8bit.png")))
    assert resized.shape == (TRAIN_H, TRAIN_W, 3)
    inst_r = np.array(Image.open(os.path.join(
        root, "train_instance", CITY,
        f"{CITY}_000000_000000_gtFine_instanceIds.png")))
    assert set(np.unique(inst_r)) <= {0, CAR_IID}   # nearest keeps exact ids

    # --- SiamRPN tracking + matching -> trajectory txts ------------------
    # random-init tracker: scores/boxes are noise, so the smoke flags relax
    # the kill/coverage thresholds (defaults stay the reference's 0.95/0.8 —
    # pinned by tests/test_trajectories.py); matching then snaps each frame
    # to the class-matched instance, so rows carry GT instance bboxes.
    _run_tool("generate_trajectories.py", [
        "--images-root", os.path.join(root, "raw"),
        "--instance-root", os.path.join(root, "gt_instance"),
        "--out", os.path.join(root, "tracking"),
        "--score-thresh", "0", "--cover-thresh", "0", "--limit", "1"])
    txt = os.path.join(root, "tracking", CITY,
                       f"{CITY}_000000_000000_{CAR_IID}.txt")
    assert os.path.exists(txt)
    rows = open(txt).read().splitlines()
    assert len(rows) == 9                          # 9-frame completeness
    for f, row in enumerate(rows):
        x, y, w, h, iid = row.split(",")
        assert int(iid) == CAR_IID
        assert float(x) == 30 + 2 * f              # the crafted motion
        assert float(y) == 40.0
        assert (float(w), float(h)) == (39.0, 23.0)

    # --- datalists -------------------------------------------------------
    datalist = os.path.join(root, "cityscapes_train.txt")
    _run_tool("generate_lists.py", [
        "--tracking-root", os.path.join(root, "tracking"),
        "--out", datalist])
    names = open(datalist).read().splitlines()
    assert names == [f"{CITY}/{CITY}_000000_000000_leftImg8bit.png"]

    # --- config over the produced directory ------------------------------
    from c2m_tpu.config import tiny_config
    cfg = tiny_config(h=TRAIN_H, w=TRAIN_W, num_predicted=4, max_objects=4,
                      batch_size=1)
    dp = cfg.dataset_params
    dp.root = root
    dp.dataset = "cityscapes"
    for split in ("train", "val"):
        setattr(dp, f"{split}_images_path", "train_images")
        setattr(dp, f"{split}_data_list", "cityscapes_train.txt")
        setattr(dp, f"{split}_segmasks_path", "train_semantic")
        setattr(dp, f"{split}_instances_path", "train_instance")
        setattr(dp, f"{split}_tracking_path", "tracking")
        setattr(dp, f"{split}_bw_of_path", "bw_of")
        setattr(dp, f"{split}_bw_occ_path", "bw_occ")
        setattr(dp, f"{split}_fw_of_path", "fw_of")
        setattr(dp, f"{split}_fw_occ_path", "fw_occ")
    dp.segmask_suffix = "ssmask.png"
    dp.instance_suffix = "gtFine_instanceIds.png"
    cfg.train_params.dtype = "float32"
    cfg.validate()
    cfg_path = os.path.join(root, "chain.yaml")
    import yaml
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"dataset_params": {"root": root}}, f)

    # --- flow precompute (random-weight FlowNet2) ------------------------
    import c2m_tpu.config as config_mod
    saved_from_yaml = config_mod.Config.from_yaml
    config_mod.Config.from_yaml = classmethod(lambda cls, path: cfg)
    try:
        _run_tool("precompute_flow.py", ["--config", cfg_path,
                                         "--split", "train", "--limit", "1"])
    finally:
        config_mod.Config.from_yaml = saved_from_yaml
    flow_files = sorted(os.listdir(os.path.join(root, "bw_of", CITY)))
    assert len(flow_files) == cfg.train_params.num_frames - 1
    assert all(f.endswith(".flow") for f in flow_files)
    from c2m_tpu.data.flow_io import read_flow
    fl = read_flow(os.path.join(root, "bw_of", CITY, flow_files[0]))
    assert fl.shape == (TRAIN_H, TRAIN_W, 2) and np.isfinite(fl).all()

    # --- the produced directory is a trainable dataset -------------------
    from c2m_tpu.data.dataset import get_training_set
    ds = get_training_set(cfg)
    assert len(ds) == 1
    item = ds[0]
    assert item["video"].shape == (cfg.train_params.num_frames,
                                   TRAIN_H, TRAIN_W, 3)
    assert item["node_mask"].sum() == 1            # the tracked car
    assert item["inst_ids"][0] == CAR_IID
    # GT thetas from the txts: pure x-translation, unit scale
    th = item["targets_theta"][0]
    assert np.allclose(th[:, 0], 1.0) and np.allclose(th[:, 4], 1.0)
    assert (th[:, 2] < 0).all()                    # moving right -> dx < 0
    batch = {k: jnp.asarray(v)[None] for k, v in item.items()
             if not isinstance(v, str)}

    from c2m_tpu.train.model import C2MTrainModel
    from c2m_tpu.train.state import create_train_state
    from c2m_tpu.train.step import make_train_step
    state = create_train_state(cfg, C2MTrainModel(cfg), jax.random.PRNGKey(0),
                               batch)
    _, metrics = make_train_step(cfg, donate=False)(state, batch,
                                                    jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_gen"]))
    print("chain train step total_gen:", float(metrics["total_gen"]))
