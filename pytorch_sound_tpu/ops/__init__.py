"""Functional JAX DSP ops — the numerical core of pytorch_sound_tpu.

Layout convention follows the reference/torch: spectrograms are
``(..., freq, time)``; waves are ``(..., time)``.
"""
