"""On-device rational resampling (Kaiser polyphase, MXU-formulated).

Numerics-parity port of the native host resampler (`csrc/tpusound.cc`
`ts_resample`: Kaiser(beta=8.6) windowed-sinc prototype, 24 taps per phase) —
the same DSP the reference delegated to sox subprocesses
(`/root/reference/pytorch_sound/scripts/preprocess.py:82-88`). Moving it
on-device removes the single-core host bottleneck from the preprocess
pipeline: decode stays on the host (cheap WAV parse), while
resample -> RMS-normalize -> log-mel run as one jitted device program.

MXU formulation: after reducing the ratio to coprime up/down, output
super-block q (`up` consecutive outputs) depends only on input window
[q*down - half, q*down + down + half): a fixed matrix

    M[r, floor(r*down/up) + j] = bank[(r*down) % up][j]      j < taps

turns the whole resample into ``einsum('bqw,rw->bqr', windows, M)`` — one
(B*Q, down+taps) x (down+taps, up) matmul. Windows are built from shifted
reshapes of the padded signal (static shapes, no gather).
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TAPS_PER_PHASE = 24
KAISER_BETA = 8.6


def _bessel_i0(x: np.ndarray) -> np.ndarray:
    """Power-series modified Bessel I0 (mirrors csrc/tpusound.cc)."""
    x = np.asarray(x, np.float64)
    total = np.ones_like(x)
    term = np.ones_like(x)
    for k in range(1, 64):
        term = term * (x / (2.0 * k)) ** 2
        total = total + term
        if np.all(term < 1e-16 * total):
            break
    return total


@functools.lru_cache(maxsize=32)
def kaiser_polyphase_bank(up: int, down: int,
                          taps_per_phase: int = TAPS_PER_PHASE,
                          beta: float = KAISER_BETA) -> np.ndarray:
    """(up, taps_per_phase) polyphase filter bank, bit-matching the native
    resampler's prototype: bank[r][j] = up * sinc_lp(r + (half_src - j) * up)
    * kaiser(beta)."""
    half = (taps_per_phase // 2) * up
    h_src = taps_per_phase // 2
    cutoff = 1.0 / max(up, down)
    r = np.arange(up)[:, None].astype(np.float64)
    j = np.arange(taps_per_phase)[None, :].astype(np.float64)
    t = r + (h_src - j) * up
    sinc = np.where(t == 0.0, cutoff, np.sin(np.pi * cutoff * t)
                    / np.where(t == 0.0, 1.0, np.pi * t))
    frac = t / (half + 1.0)
    w = _bessel_i0(beta * np.sqrt(np.maximum(0.0, 1.0 - frac * frac)))
    w = w / _bessel_i0(np.asarray(beta))
    return (sinc * w * up).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _block_matrix(up: int, down: int,
                  taps_per_phase: int = TAPS_PER_PHASE,
                  beta: float = KAISER_BETA) -> np.ndarray:
    """(W, up) matrix with W = down + taps: window q of the padded input
    (starting at q*down) matmuls to outputs q*up .. q*up + up - 1."""
    bank = kaiser_polyphase_bank(up, down, taps_per_phase, beta)
    w_len = down + taps_per_phase
    m = np.zeros((w_len, up), np.float32)
    for r in range(up):
        off = (r * down) // up            # floor; phase = (r*down) % up
        m[off:off + taps_per_phase, r] = bank[(r * down) % up]
    return m


def resample_out_len(n_in: int, orig_sr: int, target_sr: int) -> int:
    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    return -(-n_in * up // down)


def resample_poly(x: jnp.ndarray, orig_sr: int, target_sr: int,
                  taps_per_phase: int = TAPS_PER_PHASE,
                  beta: float = KAISER_BETA) -> jnp.ndarray:
    """Rational resample of (..., T) from ``orig_sr`` to ``target_sr``.

    jit-compatible, static shapes; bit-parity (<= 2e-6) with the native
    `ts_resample` / the pure-Python `utils.wavio.resample` fallback.
    """
    if orig_sr == target_sr:
        return x
    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g

    batch_shape = x.shape[:-1]
    n_in = x.shape[-1]
    x2 = x.reshape((-1, n_in))
    n_out = -(-n_in * up // down)
    n_q = -(-n_out // up)                 # super-blocks of `up` outputs

    h_src = taps_per_phase // 2
    w_len = down + taps_per_phase
    # window q reads padded[:, q*down : q*down + w_len]; every shifted view
    # xp[:, s : s + n_q*down] must be full-length, up to the largest shift
    max_s = ((w_len - 1) // down) * down
    pad_back = max(0, max_s + n_q * down - (h_src + n_in))
    xp = jnp.pad(x2, [(0, 0), (h_src, pad_back)])

    views = [xp[:, s:s + n_q * down].reshape(-1, n_q, down)
             for s in range(0, w_len, down)]
    windows = jnp.concatenate(views, axis=-1)[:, :, :w_len]

    m = jnp.asarray(_block_matrix(up, down, taps_per_phase, beta))
    y = jnp.einsum('bqw,wr->bqr', windows, m,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(-1, n_q * up)[:, :n_out].reshape(batch_shape + (n_out,))


def rms_normalize(x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                  target_db: float = -23.0, eps: float = 1e-12) -> jnp.ndarray:
    """Per-row RMS normalization to ``target_db`` dBFS (native
    `ts_rms_normalize` parity). ``lengths`` masks zero padding: padded zeros
    contribute nothing to the sum, so only the divisor needs the true length.
    """
    n = x.shape[-1] if lengths is None else lengths
    sq = jnp.sum(x * x, axis=-1)
    rms = jnp.sqrt(sq / jnp.maximum(jnp.asarray(n, jnp.float32), 1.0))
    gain = (10.0 ** (target_db / 20.0)) / jnp.maximum(rms, eps)
    return x * gain[..., None]
