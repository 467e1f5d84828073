"""Learned models: trail segmentation (ASTA equivalent)."""
