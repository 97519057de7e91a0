"""Pallas TPU kernels — speed-of-light paths for the engine's hot ops."""
