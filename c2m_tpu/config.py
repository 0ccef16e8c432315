"""Typed configuration for C2M-TPU.

Mirrors the reference YAML schema (reference: src/config/c2m_journal_cityscapes.yaml)
section-by-section — ``dataset_params / train_params / model_params / test_params /
visualizer_params / checkpoint_params`` — but behind validated dataclasses instead of
raw dict access (the reference reads the YAML dict directly, e.g. src/train.py:50-51).

Reference quirks this schema resolves explicitly (see SURVEY.md §2.1):
- ``generator.use_spade`` is read by the reference generator (generator.py:21) but
  missing from the shipped YAML; canonical default here is ``False`` (the non-SPADE
  path warps bottleneck features, generator.py:135-137).
- ``train_params.which_epoch`` is only needed when resuming; defaults to "latest".
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


def _update_dataclass(obj, data: Dict[str, Any], path: str = ""):
    """Recursively apply a dict onto a dataclass instance, validating keys."""
    names = {f.name: f for f in dataclasses.fields(obj)}
    for key, value in data.items():
        if key not in names:
            raise KeyError(f"Unknown config key '{path}{key}' for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _update_dataclass(current, value, path=f"{path}{key}.")
        else:
            setattr(obj, key, value)
    return obj


@dataclass(eq=False)
class DatasetParams:
    root: str = ""
    dataset: str = "cityscapes"  # cityscapes | kitti | mvtid | synthetic
    train_images_path: str = "train256_128/"
    val_images_path: str = "val256_128/"
    train_data_list: str = "cityscapes_train.txt"
    val_data_list: str = "cityscapes_val.txt"
    train_segmasks_path: str = "train_semantic_segmask256x128"
    val_segmasks_path: str = "val_semantic_segmask256x128"
    segmask_suffix: str = "ssmask.png"
    train_instances_path: str = "train_instance256x128"
    val_instances_path: str = "val_instance256x128"
    instance_suffix: str = "gtFine_instanceIds.png"
    train_tracking_path: str = "train_instance_tracking_test"
    val_tracking_path: str = "val_instance_tracking_test"
    train_bw_occ_path: str = "train_bw_occlusion_128x256"
    val_bw_occ_path: str = "val_bw_occlusion_128x256"
    bw_occ_suffix: str = "leftImg8bit_occlusion_bw.png"
    train_bw_of_path: str = "train_bw_optical_flow_128x256"
    val_bw_of_path: str = "val_bw_optical_flow_128x256"
    bw_of_suffix: str = "leftImg8bit_flow_backward.flow"
    train_fw_occ_path: str = "train_fw_occlusion_128x256"
    val_fw_occ_path: str = "val_fw_occlusion_128x256"
    fw_occ_suffix: str = "leftImg8bit_occlusion_fw.png"
    train_fw_of_path: str = "train_fw_optical_flow_128x256"
    val_fw_of_path: str = "val_fw_optical_flow_128x256"
    fw_of_suffix: str = "leftImg8bit_flow_forward.flow"
    # TPU-native addition: static max number of tracked objects per clip
    # (PyG ragged graphs -> padded dense node tensors, SURVEY.md §7).
    max_objects: int = 16


@dataclass(eq=False)
class LossWeights:
    flow_reconstruction: float = 10.0
    flow_smooth: float = 0.0
    flowcon: float = 0.0
    reconstruction: float = 100.0
    kl: float = 100.0
    ssim: float = 10.0
    perceptual: float = 10.0
    style: float = 0.0
    occlusion_bw: float = 20.0
    occlusion_fw: float = 20.0
    g_gan_image: float = 1.0
    g_gan_video: float = 1.0
    feature_matching_image: float = 10.0
    feature_matching_video: float = 10.0
    warped: float = 100.0
    scale: float = 2.0
    rotation: float = 1.0
    translation: float = 100.0

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


@dataclass(eq=False)
class TrainParams:
    num_input_frames: int = 1
    num_predicted_frames: int = 5
    input_size: List[int] = field(default_factory=lambda: [128, 256])  # [H, W]
    num_epochs: int = 300
    lr_rate_d: float = 4.0e-4
    lr_rate_g: float = 2.0e-4
    lr_rate_gnn: float = 1.0e-4
    gamma_d: float = 0.8
    gamma_g: float = 0.9
    gamma_gnn: float = 1.0
    milestone_start: int = 100
    milestone_end: int = 400
    milestone_every: int = 50
    seed: int = 31415
    batch_size: int = 3
    workers: int = 4
    local_world_size: int = 1
    use_gt_training: bool = True
    use_gt_eval: bool = False
    use_pre_processed_of: bool = True
    use_fw_of: bool = False
    beta1: float = 0.5
    beta2: float = 0.999
    eps: float = 1e-7
    continue_train: bool = False
    use_image_discriminator: bool = True
    use_video_discriminator: bool = True
    eval_freq: int = 4600
    which_epoch: str = "latest"
    loss_weights: LossWeights = field(default_factory=LossWeights)
    # TPU-native additions
    dtype: str = "bfloat16"        # compute dtype for conv stacks
    steps_per_epoch: Optional[int] = None
    remat: bool = False            # rematerialize the big submodules in the
    # train step (jax.checkpoint); trades ~1 extra forward for the activation
    # memory — required for the 512x1024 long-horizon config on 16 GB chips
    remat_policy: str = ""         # what rematted segments SAVE (nn/remat.py):
    # "" = boundaries only (minimum memory); "convs" = keep conv/dot outputs
    # and recompute only the elementwise glue — faster backward where HBM
    # allows (the 256x512 operating point); "convs:<MB>" caps saved outputs
    remat_segments: str = "all"    # which segments remat wraps (nn/remat.py
    # SEGMENTS): "all", or a comma list (e.g. "dense_bw,generator,discs") to
    # confine recompute to the memory-dominant segments
    scan_frames: int = 0           # >0: run the per-frame train tail
    # (generator + VGG + image-D + per-frame losses) as an nn.scan over
    # chunks of this many predicted frames instead of one time-folded batch.
    # Cuts the tail's live full-res activations by T/chunk — how the
    # 512x1024x10 train step fits a 16 GB chip. Train-mode BatchNorm batch
    # stats become per-chunk (the same class of regrouping as the
    # reference's unsynced per-GPU DDP BatchNorm); 0 = exact folded-batch
    # semantics (the 128x256 default).
    s2d_tail: bool = False         # run the model's full-res conv segments
    # (decoder final_up/final_fuse/heads, generator entry/exit) on the
    # lane-filling space-to-depth form [.., H/2, W/2, 4C]. Exact
    # reformulation with an identical parameter tree (nn/s2d_blocks.py);
    # measured 2.4x faster + 4x less full-res activation HBM at 512x1024,
    # SLOWER at 128x256 (tools/bench_s2d.py) — enable for long-horizon
    # configs only.

    @property
    def num_frames(self) -> int:
        return self.num_input_frames + self.num_predicted_frames

    @property
    def milestones(self) -> List[int]:
        return list(range(self.milestone_start, self.milestone_end, self.milestone_every))


@dataclass(eq=False)
class CommonParams:
    scale_factor: float = 1.0
    image_channel: int = 3
    seg_channel_bg: int = 11
    seg_channel_fg: int = 9
    instance_channel: int = 1
    flow_channel: int = 2
    occlusion_channel: int = 1


@dataclass(eq=False)
class SparseMotionEstimatorParams:
    h_dim: int = 512
    z_dim: int = 1024
    num_features_x: int = 23
    num_features_y: int = 6
    num_head: int = 4


@dataclass(eq=False)
class SparseMotionEncoderParams:
    block_expansion: int = 32
    num_down_blocks: int = 4
    max_expansion: int = 512
    in_channel: int = 2
    padding_mode: str = "reflect"


@dataclass(eq=False)
class DenseMotionEncoderParams:
    out_channel_bg: int = 512
    out_channel_fg: int = 512
    max_expansion: int = 512
    block_expansion: int = 32
    num_down_blocks: int = 6
    padding_mode: str = "reflect"
    t_kernel: List[int] = field(default_factory=lambda: [4, 3, 3, 4, 1, 1, 1])
    h_kernel: List[int] = field(default_factory=lambda: [4, 4, 4, 4, 4, 4, 3])
    w_kernel: List[int] = field(default_factory=lambda: [4, 4, 4, 4, 4, 4, 3])
    t_stride: List[int] = field(default_factory=lambda: [2, 1, 1, 2, 1, 1, 1])
    h_stride: List[int] = field(default_factory=lambda: [2, 2, 2, 2, 2, 2, 1])
    w_stride: List[int] = field(default_factory=lambda: [2, 2, 2, 2, 2, 2, 1])
    t_padding: List[int] = field(default_factory=lambda: [1, 1, 1, 1, 0, 0, 0])
    h_padding: List[int] = field(default_factory=lambda: [1, 1, 1, 1, 1, 1, 1])
    w_padding: List[int] = field(default_factory=lambda: [1, 1, 1, 1, 1, 1, 1])


@dataclass(eq=False)
class DenseMotionDecoderParams:
    in_channel: int = 528
    out_channel: int = 32
    block_expansion: int = 32
    max_expansion: int = 512
    num_up_blocks: int = 5
    padding_mode: str = "reflect"
    use_appearance_feature: bool = True
    use_feature_resample: bool = True


@dataclass(eq=False)
class MotionEstimatorParams:
    sparse_motion_estimator: SparseMotionEstimatorParams = field(
        default_factory=SparseMotionEstimatorParams)
    sparse_motion_encoder: SparseMotionEncoderParams = field(
        default_factory=SparseMotionEncoderParams)
    dense_motion_encoder: DenseMotionEncoderParams = field(
        default_factory=DenseMotionEncoderParams)
    dense_motion_decoder: DenseMotionDecoderParams = field(
        default_factory=DenseMotionDecoderParams)


@dataclass(eq=False)
class DiscriminatorParams:
    in_channel: int = 3
    ndf: int = 32
    n_layers_D: int = 4
    num_D: int = 1
    padding_mode: str = "reflect"


@dataclass(eq=False)
class AppearanceEncoderParams:
    block_expansion: int = 32
    num_down_blocks: int = 6
    max_expansion: int = 512
    pooling_after: int = 2
    padding_mode: str = "reflect"
    pool_size: int = 7


@dataclass(eq=False)
class GeneratorParams:
    block_expansion: int = 32
    num_down_blocks: int = 3
    max_expansion: int = 512
    num_bottleneck_blocks: int = 4
    padding_mode: str = "reflect"
    use_skip: bool = False
    # Missing from the reference YAML but read by the reference generator
    # (generator.py:21); canonical value False (SURVEY.md §2.1).
    use_spade: bool = False


@dataclass(eq=False)
class FlowEmbedderParams:
    input_channel: int = 6
    block_expansion: int = 32
    num_down_blocks: int = 3
    max_expansion: int = 512
    padding_mode: str = "reflect"
    use_decoder: bool = True


@dataclass(eq=False)
class ModelParams:
    common_params: CommonParams = field(default_factory=CommonParams)
    motion_estimator: MotionEstimatorParams = field(default_factory=MotionEstimatorParams)
    discriminator: DiscriminatorParams = field(default_factory=DiscriminatorParams)
    appearance_encoder: AppearanceEncoderParams = field(default_factory=AppearanceEncoderParams)
    generator: GeneratorParams = field(default_factory=GeneratorParams)
    flow_embedder: FlowEmbedderParams = field(default_factory=FlowEmbedderParams)


@dataclass(eq=False)
class TestParams:
    phase: str = "test"
    use_pre_processed_of: bool = True
    input_size: List[int] = field(default_factory=lambda: [128, 256])
    seed: int = 31415
    batch_size: int = 12
    workers: int = 10
    num_input_frames: int = 1
    num_predicted_frames: int = 5
    use_gt_eval: bool = True
    lambda_traj: float = 1.0
    custom_test: bool = True
    yolo_version: int = 3
    load_index_user_guidance: bool = True
    save_index_user_guidance: bool = False
    num_samples: int = 1
    which_epoch: str = "latest"


@dataclass(eq=False)
class VisualizerParams:
    display_winsize: int = 512
    tf_log: bool = True
    display_freq: int = 1460
    print_freq: int = 400
    save_latest_freq: int = 100
    use_html: bool = True
    grid_size: List[int] = field(default_factory=lambda: [2, 4])


@dataclass(eq=False)
class CheckpointParams:
    save_epoch_freq: int = 10


@dataclass(eq=False)
class ParallelParams:
    """TPU-native addition: device-mesh layout (no reference analogue; the
    reference's only strategy is DDP/NCCL data parallelism, SURVEY.md §2.9)."""
    data_axis: int = -1   # -1: all devices on the data axis
    model_axis: int = 1   # reserved for intra-op sharding of the widest layers


@dataclass(eq=False)
class Config:
    name: str = "c2m_journal"
    suffix: str = ""
    workspace: str = "runs"
    dataset_params: DatasetParams = field(default_factory=DatasetParams)
    train_params: TrainParams = field(default_factory=TrainParams)
    model_params: ModelParams = field(default_factory=ModelParams)
    test_params: TestParams = field(default_factory=TestParams)
    visualizer_params: VisualizerParams = field(default_factory=VisualizerParams)
    checkpoint_params: CheckpointParams = field(default_factory=CheckpointParams)
    parallel_params: ParallelParams = field(default_factory=ParallelParams)

    def validate(self) -> "Config":
        tp, mp = self.train_params, self.model_params
        h, w = tp.input_size
        down = 2 ** mp.appearance_encoder.num_down_blocks
        if h % down or w % down:
            raise ValueError(
                f"input_size {tp.input_size} must be divisible by the appearance "
                f"encoder's total downsampling factor {down}")
        if tp.num_input_frames < 1 or tp.num_predicted_frames < 1:
            raise ValueError("need at least 1 input and 1 predicted frame")
        enc = mp.motion_estimator.dense_motion_encoder
        lens = {len(enc.t_kernel), len(enc.h_kernel), len(enc.w_kernel),
                len(enc.t_stride), len(enc.h_stride), len(enc.w_stride),
                len(enc.t_padding), len(enc.h_padding), len(enc.w_padding)}
        if len(lens) != 1:
            raise ValueError("dense_motion_encoder kernel/stride/padding lists must "
                             "all have the same length")
        if self.dataset_params.max_objects < 1:
            raise ValueError("max_objects must be >= 1")
        if tp.scan_frames < 0 or (tp.scan_frames
                                  and tp.num_predicted_frames % tp.scan_frames):
            raise ValueError(
                f"scan_frames={tp.scan_frames} must be 0 or divide "
                f"num_predicted_frames={tp.num_predicted_frames}")
        from c2m_tpu.nn.remat import make_policy, parse_segments
        make_policy(tp.remat_policy)     # raises on unknown values
        parse_segments(tp.remat_segments)
        return self

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "Config":
        cfg = cls()
        _update_dataclass(cfg, data)
        return cfg.validate()

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path) as f:
            data = yaml.safe_load(f)
        return cls.from_dict(data or {})

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def tiny_config(h: int = 64, w: int = 128, num_predicted: int = 5,
                max_objects: int = 4, batch_size: int = 1) -> Config:
    """Small config for tests / the 64x128 CPU mini-clip driver config."""
    cfg = Config()
    cfg.dataset_params.dataset = "synthetic"
    cfg.dataset_params.max_objects = max_objects
    cfg.train_params.input_size = [h, w]
    cfg.train_params.batch_size = batch_size
    cfg.train_params.num_predicted_frames = num_predicted
    cfg.test_params.input_size = [h, w]
    cfg.test_params.num_predicted_frames = num_predicted
    return cfg.validate()


def shrink_model(cfg: Config, block_expansion: int = 16,
                 max_expansion: int = 128) -> Config:
    """Width-shrink every module (structure unchanged: same modules, losses,
    optimizer groups) for cheap-compile tests and the multichip dryrun."""
    mp = cfg.model_params
    for section in (mp.appearance_encoder, mp.generator, mp.discriminator,
                    mp.flow_embedder, mp.motion_estimator.sparse_motion_encoder,
                    mp.motion_estimator.dense_motion_encoder,
                    mp.motion_estimator.dense_motion_decoder):
        if hasattr(section, "block_expansion"):
            section.block_expansion = block_expansion
        if hasattr(section, "max_expansion"):
            section.max_expansion = max_expansion
        if hasattr(section, "ndf"):
            section.ndf = block_expansion
    me = cfg.model_params.motion_estimator
    me.dense_motion_encoder.out_channel_bg = max_expansion
    me.dense_motion_encoder.out_channel_fg = max_expansion
    me.sparse_motion_estimator.h_dim = max_expansion
    me.sparse_motion_estimator.z_dim = max_expansion * 2
    return cfg
