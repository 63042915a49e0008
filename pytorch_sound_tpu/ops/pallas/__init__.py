"""Pallas TPU kernels for the hot DSP paths."""
