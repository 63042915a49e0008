"""Wave-level modules: windowed volume norm, pre-emphasis pair, multi-STFT loss.

API parity target: `/root/reference/pytorch_sound/models/sound.py`.
"""

from typing import List, Tuple

import jax.numpy as jnp

from pytorch_sound_tpu.models.transforms import STFTTorchAudio as STFT  # noqa: F401 (parity import)
from pytorch_sound_tpu.ops import sound as sound_ops


class VolNormConv:
    """Windowed (hop-wise) volume normalization with stored stds for exact
    ``reverse`` (reference `models/sound.py:7-60`).

    The reference looped hop-by-hop in Python; here the per-window unbiased
    stds come from one O(T) cumulative-sum pass and the gains are applied
    vectorized.
    """

    def __init__(self, window_size: int, hop_size: int, target_db: float):
        self.window_size = window_size
        self.hop_size = hop_size
        self.target_db = target_db
        self.prev_wav_len = -1
        self.std_buffer = None

    def forward(self, wav: jnp.ndarray) -> jnp.ndarray:
        self.prev_wav_len = wav.shape[-1]
        normed, stds = sound_ops.windowed_volume_norm(
            wav, self.window_size, self.hop_size, self.target_db)
        self.std_buffer = stds
        return normed

    def reverse(self, wav: jnp.ndarray) -> jnp.ndarray:
        assert self.prev_wav_len >= wav.shape[-1], \
            '{} is smaller than {} !'.format(self.prev_wav_len, wav.shape[-1])
        return sound_ops.windowed_volume_reverse(
            wav, self.std_buffer, self.window_size, self.hop_size, self.target_db)

    __call__ = forward


class PreEmphasis:
    """FIR pre-emphasis on (N, 1, T) (reference `models/sound.py:66-81`)."""

    def __init__(self, coef: float = 0.97):
        self.coef = coef

    def __call__(self, input: jnp.ndarray) -> jnp.ndarray:
        assert input.ndim == 3, 'The number of dimensions of input tensor must be 3!'
        return sound_ops.preemphasis(input, self.coef)

    forward = __call__


class InversePreEmphasis:
    """Inverse pre-emphasis IIR on (N, 1, T) (reference `models/sound.py:84-100`).

    The reference ran a 1-unit RNN; here the recurrence is a parallel
    associative scan (log-depth on TPU).
    """

    def __init__(self, coef: float = 0.97):
        self.coef = coef

    def __call__(self, input: jnp.ndarray) -> jnp.ndarray:
        return sound_ops.inv_preemphasis(input, self.coef)

    forward = __call__


def build_stft_functions(*params: Tuple[int, int, int]) -> List[STFT]:
    """STFT modules for the given (n_fft, win, hop) triples
    (reference `models/sound.py:106-117`; no device pinning needed here)."""
    return [STFT(win, hop, win, fft) for fft, win, hop in params]


def multi_stft_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    stft_params: List[Tuple[int, int, int]],
                    eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-resolution STFT loss (reference `models/sound.py:120-147`).

    Unlike the reference, STFT bases are cached module-level rather than being
    rebuilt every call. Returns (total, spectral convergence, log magnitude).
    """
    return sound_ops.multi_stft_loss(pred, target, stft_params, eps)
