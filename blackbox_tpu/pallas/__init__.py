"""Pallas TPU kernels for the hot production ops."""
