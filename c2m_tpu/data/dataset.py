"""Dataset factory (reference: src/datasets/dataset.py:4-131 — dispatch on
``dataset_params.dataset``)."""

from __future__ import annotations

from c2m_tpu.config import Config


class SyntheticDataset:
    """Hermetic synthetic clips with the full batch contract."""

    def __init__(self, cfg: Config, n: int = 64, seed_offset: int = 0):
        self.cfg, self.n, self.seed_offset = cfg, n, seed_offset

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from c2m_tpu.data.synthetic import make_batch
        b = make_batch(self.cfg, batch_size=1, seed=self.seed_offset + i)
        return {k: v[0] for k, v in b.items()}


def get_training_set(cfg: Config):
    name = cfg.dataset_params.dataset
    if name in ("cityscapes", "kitti"):
        from c2m_tpu.data.cityscapes import ClipDataset
        return ClipDataset(cfg, split="train")
    if name == "mvtid":
        from c2m_tpu.data.mvtid import MvtidDataset
        return MvtidDataset(cfg, split="train")
    if name == "synthetic":
        return SyntheticDataset(cfg)
    raise ValueError(f"unknown dataset {name!r} "
                     "(cityscapes | kitti | mvtid | synthetic)")


def get_test_set(cfg: Config):
    name = cfg.dataset_params.dataset
    if name in ("cityscapes", "kitti"):
        from c2m_tpu.data.cityscapes import ClipDataset
        return ClipDataset(cfg, split="val")
    if name == "mvtid":
        from c2m_tpu.data.mvtid import MvtidDataset
        return MvtidDataset(cfg, split="val")
    if name == "synthetic":
        return SyntheticDataset(cfg, n=8, seed_offset=10_000)
    raise ValueError(f"unknown dataset {name!r}")
