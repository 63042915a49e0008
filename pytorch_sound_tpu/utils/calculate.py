"""Scalar/array DSP helpers: dB<->log conversion, mel normalization, volume norm.

Numerical parity target: `/root/reference/pytorch_sound/utils/calculate.py`.
All functions are dtype-polymorphic over numpy and jax arrays (jnp ufuncs
accept numpy inputs), so they are usable both host-side and inside jit.
"""

from typing import Union

import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu import settings

ArrayLike = Union[np.ndarray, jnp.ndarray, float, int]


def db2log(db: ArrayLike) -> ArrayLike:
    """Convert decibels to natural-log power scale: log(10^(db/10))."""
    if isinstance(db, (int, float, np.ndarray)):
        return np.log(np.power(10.0, np.asarray(db, dtype=np.float64) / 10.0))
    return jnp.log(jnp.power(10.0, db / 10.0))


def unnorm_mel(x: ArrayLike) -> ArrayLike:
    """Map a [-1, 1]-normalized mel back to log-mel scale."""
    mel_min, mel_max = db2log(settings.MIN_DB), db2log(settings.MAX_DB)
    return ((x + 1) / 2) * (mel_max - mel_min) + mel_min


def norm_mel(x: ArrayLike) -> ArrayLike:
    """Clamp a log-mel to [MIN_DB, MAX_DB] (log scale) and normalize to [-1, 1]."""
    mel_min, mel_max = db2log(settings.MIN_DB), db2log(settings.MAX_DB)
    x = x.clip(mel_min, mel_max) if isinstance(x, np.ndarray) else jnp.clip(x, mel_min, mel_max)
    return (x - mel_min) / (mel_max - mel_min) * 2 - 1


def volume_norm_log(x: np.ndarray, target_db: float = settings.VN_DB) -> np.ndarray:
    """RMS volume normalization (numpy) to the target decibel level."""
    return x / (np.std(x) / 10 ** (target_db / 10))


def volume_norm_log_jax(x: jnp.ndarray, target_db: float = settings.VN_DB) -> jnp.ndarray:
    """RMS volume normalization (jax) to the target decibel level."""
    return x / (jnp.std(x) / 10 ** (target_db / 10))


# alias kept for drop-in compatibility with the reference's torch variant
volume_norm_log_torch = volume_norm_log_jax


def conv_same_padding(filter_size: int, stride: int, dilation: int, x: int = 44100) -> int:
    """'same' padding size for a 1d conv with the given geometry."""
    return int(np.ceil(((x / stride - 1) * stride
                        + (filter_size + (filter_size - 1) * (dilation - 1)) - x) / 2))
