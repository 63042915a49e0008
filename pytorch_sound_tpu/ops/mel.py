"""Log-mel / MFCC feature extraction (functional, jit-compatible).

Numerical parity targets (all at `settings.py` defaults):
- ``log_mel_spectrogram``: `/root/reference/pytorch_sound/models/transforms.py:206-244`
  (conv-STFT magnitude -> librosa mel -> log(+1e-6) -> db->log clamp).
- ``hifigan_mel_spectrogram``: `interface/hifi_gan.py:29-63` (reflect pad
  (n_fft-hop)/2, uncentered stft, sqrt(power + 1e-9), log(clamp 1e-5)).
- ``audio2mel``: `models/transforms.py:322-366` (MelGAN log10 variant).
- ``mfcc`` / ``mel_to_mfcc``: `models/transforms.py:419-455`.

The mel projection is a (F x n_mels) matmul fused by XLA with the magnitude
computation; the fully-fused Pallas path lives in
:mod:`pytorch_sound_tpu.ops.pallas.logmel`.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.ops import filters
from pytorch_sound_tpu.ops import stft as stft_ops


@functools.lru_cache(maxsize=32)
def cached_mel_filter(sample_rate: int, n_fft: int, n_mels: int,
                      fmin: float, fmax: Optional[float],
                      htk: bool = False,
                      norm: Optional[str] = 'slaney') -> jnp.ndarray:
    return np.asarray(
        filters.mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax,
                               htk=htk, norm=norm),
        dtype=np.float32)


@functools.lru_cache(maxsize=8)
def cached_dct(n_mfcc: int, n_mels: int, norm: str = 'ortho') -> jnp.ndarray:
    return np.asarray(filters.dct_matrix(n_mfcc, n_mels, norm), dtype=np.float32)


def db_to_log(db: float) -> float:
    """Decibel -> natural-log power scale (static Python float).

    Algebraic form ``db/10 * ln(10)`` — overflow-free for any finite ``db``
    (the literal ``log(10**(db/10))`` overflows to inf past |db| ~ 3000).
    """
    return float(db / 10.0 * np.log(10.0))


def log_mel_spectrogram(wav: jnp.ndarray, sample_rate: int, mel_size: int,
                        n_fft: int, win_length: int, hop_length: int,
                        min_db: Optional[float] = None, max_db: Optional[float] = None,
                        mel_min: float = 0.0, mel_max: Optional[float] = None,
                        log_offset: float = 1e-6, method: str = 'auto') -> jnp.ndarray:
    """Centered-STFT log-mel, (..., mel_size, T).

    Note: like the reference, the STFT runs at filter_length=win_length (the
    ``n_fft`` argument only sizes the mel filterbank).
    """
    mag = stft_ops.spectrogram_magnitude(wav, win_length, hop_length, win_length,
                                         center=True, pad_mode='reflect', method=method)
    mel_filter = cached_mel_filter(sample_rate, n_fft, mel_size, mel_min, mel_max)
    mel = jnp.einsum('mf,...ft->...mt', mel_filter, mag,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    mel = jnp.log(mel + log_offset)
    if min_db:
        mel = jnp.maximum(mel, db_to_log(min_db))
    if max_db:
        mel = jnp.minimum(mel, db_to_log(max_db))
    return mel


def hifigan_mel_spectrogram(wav: jnp.ndarray, sampling_rate: int = 22050,
                            n_fft: int = 1024, window_size: int = 1024,
                            hop_size: int = 256, num_mels: int = 80,
                            fmin: float = 0.0, fmax: Optional[float] = 8000.0,
                            method: str = 'auto') -> jnp.ndarray:
    """HiFi-GAN's mel frontend: manual (n_fft-hop)//2 reflect pad, uncentered
    STFT, sqrt(power + 1e-9), mel matmul, log(clamp(., 1e-5))."""
    pad = (n_fft - hop_size) // 2
    wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode='reflect')
    mag = stft_ops.spectrogram_magnitude(wav, n_fft, hop_size, window_size,
                                         center=False, power_eps=1e-9, method=method)
    mel_filter = cached_mel_filter(sampling_rate, n_fft, num_mels, fmin, fmax)
    mel = jnp.einsum('mf,...ft->...mt', mel_filter, mag,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, 1e-5))


def audio2mel(wav: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
              win_length: int = 1024, sampling_rate: int = 22050,
              n_mel_channels: int = 80, mel_fmin: float = 0.0,
              mel_fmax: Optional[float] = None, method: str = 'auto') -> jnp.ndarray:
    """MelGAN's log10-mel (Audio2Mel) variant."""
    pad = (n_fft - hop_length) // 2
    wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode='reflect')
    mag = stft_ops.spectrogram_magnitude(wav, n_fft, hop_length, win_length,
                                         center=False, method=method)
    mel_filter = cached_mel_filter(sampling_rate, n_fft, n_mel_channels, mel_fmin, mel_fmax)
    mel = jnp.einsum('mf,...ft->...mt', mel_filter, mag,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log10(jnp.maximum(mel, 1e-5))


def mel_to_mfcc(mel_spec: jnp.ndarray, n_mfcc: int, mel_size: int,
                norm: str = 'ortho') -> jnp.ndarray:
    """(..., mel_size, T) log-mel -> (..., n_mfcc, T) cepstral coefficients."""
    dct = cached_dct(n_mfcc, mel_size, norm)
    return jnp.einsum('km,...mt->...kt', dct, mel_spec,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def mfcc(wav: jnp.ndarray, sample_rate: int, mel_size: int, n_fft: int,
         win_length: int, n_mfcc: int, hop_length: int,
         min_db: float, max_db: float, mel_min: float = 0.0,
         mel_max: Optional[float] = None, norm: str = 'ortho',
         method: str = 'auto') -> jnp.ndarray:
    """Wave -> log-mel -> DCT cepstrum."""
    mel = log_mel_spectrogram(wav, sample_rate, mel_size, n_fft, win_length,
                              hop_length, min_db, max_db, mel_min, mel_max,
                              method=method)
    return mel_to_mfcc(mel, n_mfcc, mel_size, norm)
