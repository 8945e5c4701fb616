"""Pallas TPU kernels for the engine's hot inner loops."""
