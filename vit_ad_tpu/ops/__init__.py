"""Compute kernels: Pallas TPU kernels for hot ops + XLA reference paths."""
