"""Pallas TPU kernels for the hot loops."""
