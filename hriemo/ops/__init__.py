"""Pallas TPU kernels (hot-path compute)."""
