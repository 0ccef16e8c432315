"""Data pipeline: Cityscapes/KITTI clip loading and synthetic fixtures."""
