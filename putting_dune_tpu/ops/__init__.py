"""Pallas TPU kernels for the hottest imaging ops."""
