"""Offline data pipelines: record conversion, alignment, rate training."""
