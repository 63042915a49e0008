"""Griffin-Lim phase reconstruction (on-device, jit-compiled).

Classical magnitude -> waveform synthesis: alternate iSTFT/STFT projections
while keeping the target magnitude, optionally with momentum (fast
Griffin-Lim). Complements the neural vocoder path: any magnitude spectrogram
from the transforms in this toolkit can be sounded without a checkpoint.

Entirely complex-free (runs on the matmul DFT core), fixed iteration count
via ``lax.fori_loop`` — one compiled program regardless of iterations.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from pytorch_sound_tpu.ops import stft as stft_ops


def griffin_lim(magnitude: jnp.ndarray, n_fft: int, hop_length: int,
                win_length: Optional[int] = None, n_iter: int = 32,
                momentum: float = 0.99, length: Optional[int] = None,
                rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Reconstruct (..., samples) audio from |STFT| (..., F, T).

    :param momentum: fast-GLA momentum in [0, 1) (0 = classic Griffin-Lim)
    :param rng: phase-init PRNGKey (zero phase when None)
    """
    win_length = win_length or n_fft

    if rng is not None:
        phase = jax.random.uniform(rng, magnitude.shape,
                                   minval=-jnp.pi, maxval=jnp.pi)
        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
    else:
        real, imag = magnitude, jnp.zeros_like(magnitude)

    def project(re, im):
        """iSTFT -> STFT round trip (projection onto consistent spectrograms)."""
        wav = stft_ops.istft(re, im, n_fft, hop_length, win_length)
        re2, im2 = stft_ops.stft(wav, n_fft, hop_length, win_length)
        t = min(re.shape[-1], re2.shape[-1])
        return re2[..., :t], im2[..., :t]

    def body(_, carry):
        re, im, prev_re, prev_im = carry
        # momentum extrapolation (fast Griffin-Lim)
        acc_re = re + momentum * (re - prev_re)
        acc_im = im + momentum * (im - prev_im)
        new_re, new_im = project(acc_re, acc_im)
        # re-impose the target magnitude, keep the new phase
        mag = jnp.sqrt(new_re ** 2 + new_im ** 2) + 1e-12
        t = mag.shape[-1]
        scale = magnitude[..., :t] / mag
        return scale * new_re, scale * new_im, re[..., :t], im[..., :t]

    re0, im0 = project(real, imag)
    t = re0.shape[-1]
    mag0 = jnp.sqrt(re0 ** 2 + im0 ** 2) + 1e-12
    re0 = magnitude[..., :t] / mag0 * re0
    im0 = magnitude[..., :t] / mag0 * im0

    re, im, _, _ = jax.lax.fori_loop(0, n_iter, body, (re0, im0, re0, im0))
    return stft_ops.istft(re, im, n_fft, hop_length, win_length, length=length)
