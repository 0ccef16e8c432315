"""Evaluation: inference driver, FID/FVD/detection metrics, results writer."""
