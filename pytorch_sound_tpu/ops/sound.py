"""Wave-level ops: pre-emphasis pair, windowed volume norm, multi-res STFT loss,
spectrogram masking.

Numerical parity target: `/root/reference/pytorch_sound/models/sound.py` and
`models/transforms.py:397-416` (SpectrogramMasker).

TPU-first notes:
- The inverse pre-emphasis IIR (a sequential recurrence the reference unrolled
  through an RNN cell) is computed with ``jax.lax.associative_scan`` — a
  log-depth parallel scan that maps well onto the VPU instead of a length-T
  sequential loop.
- The multi-resolution STFT loss builds its STFT bases once per (fft, win, hop)
  via the module-level caches in :mod:`pytorch_sound_tpu.ops.stft` — unlike the
  reference, which reconstructed (and `.cuda()`-moved) STFT modules every call
  (`models/sound.py:112-133`, a known inefficiency).
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp

from pytorch_sound_tpu.ops import stft as stft_ops
from pytorch_sound_tpu.ops.stft import frame


def preemphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[t] = x[t] - coef * x[t-1] with a reflected first sample (so lengths
    match), on (..., T)."""
    first = x[..., 1:2]   # reflect padding of size 1
    prev = jnp.concatenate([first, x[..., :-1]], axis=-1)
    return x - coef * prev


def inv_preemphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """Inverse IIR: y[t] = x[t] + coef * y[t-1], via parallel associative scan."""
    a = jnp.full_like(x, coef)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, x), axis=-1)
    return y


def windowed_volume_stats(wav: jnp.ndarray, window_size: int, hop_size: int) -> jnp.ndarray:
    """Unbiased std of wav[h : h+window] for each hop start h in
    range(0, T - window, hop); the final window is truncated at the signal end.
    Returns (..., n_hops). Computed with cumulative sums (O(T))."""
    t = wav.shape[-1]
    starts = list(range(0, t - window_size, hop_size))
    n_hops = len(starts)
    csum = jnp.cumsum(wav, axis=-1)
    csum2 = jnp.cumsum(wav * wav, axis=-1)
    zeros = jnp.zeros_like(csum[..., :1])
    csum = jnp.concatenate([zeros, csum], axis=-1)
    csum2 = jnp.concatenate([zeros, csum2], axis=-1)

    idx_s = jnp.asarray(starts)
    idx_e = jnp.minimum(idx_s + window_size, t)
    n = (idx_e - idx_s).astype(wav.dtype)
    s1 = jnp.take(csum, idx_e, axis=-1) - jnp.take(csum, idx_s, axis=-1)
    s2 = jnp.take(csum2, idx_e, axis=-1) - jnp.take(csum2, idx_s, axis=-1)
    var = (s2 - s1 * s1 / n) / jnp.maximum(n - 1, 1)   # unbiased (torch.std default)
    return jnp.sqrt(jnp.maximum(var, 0.0)).reshape(*wav.shape[:-1], n_hops)


def windowed_volume_norm(wav: jnp.ndarray, window_size: int, hop_size: int,
                         target_db: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hop-wise volume normalization (VolNormConv.forward semantics): each hop
    chunk is divided by (std of its window / 10^(db/10)); the final chunk
    absorbs the tail. Returns (normalized wav, per-hop stds for reverse)."""
    t = wav.shape[-1]
    stds = windowed_volume_stats(wav, window_size, hop_size)
    n_hops = stds.shape[-1]
    last_hop = (n_hops - 1) * hop_size
    # the final hop chunk absorbs the tail only when its window already reaches
    # the signal end (reference condition `hop_point < wav_len - window - 1`)
    out_len = t if last_hop >= t - window_size - 1 else n_hops * hop_size
    gain = stds / (10 ** (target_db / 10))
    sample_chunk = jnp.minimum(jnp.arange(out_len) // hop_size, n_hops - 1)
    per_sample_gain = jnp.take_along_axis(
        gain, jnp.broadcast_to(sample_chunk, (*gain.shape[:-1], out_len)), axis=-1)
    normed = wav[..., :out_len] / jnp.maximum(per_sample_gain, 1e-12)
    return normed, stds


def windowed_volume_reverse(wav: jnp.ndarray, stds: jnp.ndarray, window_size: int,
                            hop_size: int, target_db: float) -> jnp.ndarray:
    """Undo :func:`windowed_volume_norm` with the stored per-hop stds."""
    t = wav.shape[-1]
    n_hops = stds.shape[-1]
    gain = stds / (10 ** (target_db / 10))
    sample_chunk = jnp.minimum(jnp.arange(t) // hop_size, n_hops - 1)
    per_sample_gain = jnp.take_along_axis(
        gain, jnp.broadcast_to(sample_chunk, (*gain.shape[:-1], t)), axis=-1)
    return wav * per_sample_gain


def spectrogram_mask(wav_mask: jnp.ndarray, win_length: int, hop_length: int) -> jnp.ndarray:
    """Wave-level {0,1} mask -> frame-level mask (SpectrogramMasker semantics):
    pad right win//2 zeros + left win//2 ones, windowed mean, ceil."""
    batch_pad = [(0, 0)] * (wav_mask.ndim - 1)
    m = jnp.pad(wav_mask.astype(jnp.float32), batch_pad + [(0, win_length // 2)])
    m = jnp.pad(m, batch_pad + [(win_length // 2, 0)], constant_values=1.0)
    frames = frame(m, win_length, hop_length)
    return jnp.ceil(frames.mean(axis=-1))


def multi_stft_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    stft_params: List[Tuple[int, int, int]],
                    eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-resolution STFT loss over (n_fft, win, hop) triples.

    Returns (total, spectral_convergence, log_magnitude) — each averaged over
    resolutions; total = sc + mag per resolution. Matches
    `models/sound.py:120-147` numerics with bases cached across calls.
    """
    loss = sc_loss = mag_loss = 0.0
    for n_fft, win, hop in stft_params:
        p_mag = _loss_magnitude(pred, n_fft, win, hop)
        t_mag = _loss_magnitude(target, n_fft, win, hop)

        axes = (-2, -1)
        fro = jnp.sqrt(jnp.sum((t_mag - p_mag) ** 2, axis=axes))
        t_fro = jnp.sqrt(jnp.sum(t_mag ** 2, axis=axes))
        sc = jnp.mean(fro / jnp.maximum(t_fro, 1e-12))

        n = t_mag.shape[-1] * t_mag.shape[-2]
        mag = jnp.mean(jnp.sum(jnp.abs(jnp.log(t_mag + eps) - jnp.log(p_mag + eps)),
                               axis=axes)) / n

        loss = loss + sc + mag
        sc_loss = sc_loss + sc
        mag_loss = mag_loss + mag
    k = len(stft_params)
    return loss / k, sc_loss / k, mag_loss / k


def _loss_magnitude(x: jnp.ndarray, n_fft: int, win: int, hop: int) -> jnp.ndarray:
    return stft_ops.spectrogram_magnitude(x, n_fft, hop, win, center=True,
                                          pad_mode='reflect')


def mulaw_encode(x: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """mu-law compand + quantize to ``bins`` levels (settings.MULAW_BINS).

    On-device counterpart of the native codec (csrc ts_mulaw_encode).
    """
    mu = bins - 1.0
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return jnp.round((y + 1.0) / 2.0 * mu).astype(jnp.int32)


def mulaw_decode(q: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Inverse of :func:`mulaw_encode`."""
    mu = bins - 1.0
    y = 2.0 * q.astype(jnp.float32) / mu - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + mu, jnp.abs(y)) - 1.0) / mu
