"""Functional STFT / iSTFT for TPU.

Numerical parity targets:
- ``stft``/``istft`` match torch.stft / torch.istft semantics
  (`/root/reference/pytorch_sound/models/transforms.py:271-319`): hann window,
  optional centered reflect padding, one-sided spectrum, (..., F, T) layout.
- ``conv_stft``/``conv_istft`` match the conv-basis STFT
  (`models/transforms.py:13-101`): reflect pad n_fft//2 always, windowed DFT
  basis, pinv inverse basis + squared-window overlap-add envelope correction.

TPU-first design notes:
- The DFT is computed either with XLA's rfft or as a **matmul against the real
  DFT basis** (``method='matmul'``) — on TPU the (frames x n_fft) @
  (n_fft x 2*cutoff) product maps straight onto the MXU and fuses with
  windowing and downstream mel projection; this is the default on TPU.
- Overlap-add avoids scatter: when hop divides the frame length, OLA decomposes
  into R = L/hop shifted reshapes summed elementwise (pure VPU work).
- Everything is static-shaped and jit/vmap-compatible; batch dims lead.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.ops import filters


def _n_frames(n_samples: int, n_fft: int, hop_length: int) -> int:
    return 1 + (n_samples - n_fft) // hop_length


def frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, frame_length)."""
    n = x.shape[-1]
    n_frames = _n_frames(n, frame_length, hop_length)
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add frames (..., n_frames, L) back to (..., (n_frames-1)*hop + L).

    Scatter-free when hop divides L: the r-th hop-chunk of every frame lands in
    non-overlapping positions, so OLA = sum of R shifted flat reshapes.
    """
    *batch, n_frames, length = frames.shape
    out_len = (n_frames - 1) * hop_length + length
    if length % hop_length == 0:
        ratio = length // hop_length
        flat_len = n_frames * hop_length
        out = jnp.zeros((*batch, out_len), dtype=frames.dtype)
        for r in range(ratio):
            chunk = frames[..., r * hop_length:(r + 1) * hop_length]
            chunk = chunk.reshape(*batch, flat_len)
            pad = [(0, 0)] * len(batch) + [(r * hop_length, out_len - flat_len - r * hop_length)]
            out = out + jnp.pad(chunk, pad)
        return out
    # general fallback: scatter-add
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(length)[None, :]).reshape(-1)
    flat = frames.reshape(*batch, n_frames * length)
    out = jnp.zeros((*batch, out_len), dtype=frames.dtype)
    return out.at[..., idx].add(flat)


@functools.lru_cache(maxsize=32)
def _cached_stft_basis(n_fft: int, win_length: int, window: str):
    return np.asarray(filters.stft_basis(n_fft, win_length, window), dtype=np.float32)


@functools.lru_cache(maxsize=32)
def _cached_window(n_fft: int, win_length: int, window: str):
    """Any scipy get_window name (fftbins), center-padded to n_fft — matching
    the reference's `scipy.signal.get_window` usage (`transforms.py:30-32`)."""
    win = filters.pad_center(filters.get_window_array(window, win_length), n_fft)
    return np.asarray(win, dtype=np.float32)


def stft(x: jnp.ndarray, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, window: str = 'hann',
         center: bool = True, pad_mode: str = 'reflect',
         method: str = 'auto') -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Short-time Fourier transform; returns (real, imag), each (..., F, T).

    Matches torch.stft(..., onesided=True, normalized=False) numerics.
    ``method``: 'fft' (XLA rfft), 'matmul' (MXU DFT basis), 'auto' (matmul on TPU).
    """
    win_length = win_length or n_fft
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)

    if method == 'auto':
        method = 'matmul' if jax.default_backend() == 'tpu' else 'fft'

    frames = frame(x, n_fft, hop_length)                      # (..., T, n_fft)
    if method == 'matmul':
        basis = _cached_stft_basis(n_fft, win_length, window)  # (2F, n_fft)
        proj = jnp.einsum('...tn,fn->...ft', frames, basis,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        real, imag = jnp.split(proj, 2, axis=-2)
    else:
        win = _cached_window(n_fft, win_length, window)
        spec = jnp.fft.rfft(frames * win, axis=-1)             # (..., T, F)
        real = jnp.real(spec).swapaxes(-1, -2).astype(jnp.float32)
        imag = jnp.imag(spec).swapaxes(-1, -2).astype(jnp.float32)
    return real, imag


def magphase(real: jnp.ndarray, imag: jnp.ndarray,
             power_eps: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Magnitude and phase from real/imag parts."""
    mag = jnp.sqrt(real * real + imag * imag + power_eps)
    phase = jnp.arctan2(imag, real)
    return mag, phase


def spectrogram_magnitude(x: jnp.ndarray, n_fft: int, hop_length: int,
                          win_length: Optional[int] = None,
                          center: bool = True, pad_mode: str = 'reflect',
                          power_eps: float = 0.0, method: str = 'auto') -> jnp.ndarray:
    """|STFT| (..., F, T)."""
    real, imag = stft(x, n_fft, hop_length, win_length, center=center,
                      pad_mode=pad_mode, method=method)
    return jnp.sqrt(real * real + imag * imag + power_eps)


@functools.lru_cache(maxsize=32)
def _cached_irdft_basis(n_fft: int):
    """Real inverse-rDFT bases: irfft(spec)[n] = (w*Re) @ C + (w*Im) @ mS, with
    spectral weights w folded in (1 for DC/Nyquist, 2 elsewhere, all / n_fft)."""
    cutoff = n_fft // 2 + 1
    basis = filters.dft_basis(n_fft)          # [cos; -sin] rows, (2*cutoff, n_fft)
    w = np.full((cutoff, 1), 2.0 / n_fft)
    w[0] = w[-1] = 1.0 / n_fft
    cos_b = np.asarray(basis[:cutoff] * w, dtype=np.float32)
    msin_b = np.asarray(basis[cutoff:] * w, dtype=np.float32)
    return cos_b, msin_b


def inverse_rdft(real: jnp.ndarray, imag: jnp.ndarray, n_fft: int,
                 method: str = 'auto') -> jnp.ndarray:
    """Inverse one-sided DFT of (..., T, F) real/imag -> (..., T, n_fft) frames.

    'matmul' avoids complex dtypes entirely (required on TPU, where the axon
    backend has no complex support); 'fft' uses XLA's irfft.
    """
    if method == 'auto':
        method = 'matmul' if jax.default_backend() == 'tpu' else 'fft'
    if method == 'fft':
        return jnp.fft.irfft(real + 1j * imag, n=n_fft, axis=-1).astype(jnp.float32)
    cos_b, msin_b = _cached_irdft_basis(n_fft)
    kwargs = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    # x[n] = sum_k w_k (Re_k cos - Im_k sin); msin_b rows are -sin already
    return (jnp.einsum('...tf,fn->...tn', real, cos_b, **kwargs)
            + jnp.einsum('...tf,fn->...tn', imag, msin_b, **kwargs))


def istft(real: jnp.ndarray, imag: jnp.ndarray, n_fft: int, hop_length: int,
          win_length: Optional[int] = None, window: str = 'hann',
          center: bool = True, length: Optional[int] = None,
          eps: float = 1e-11, method: str = 'auto') -> jnp.ndarray:
    """Inverse STFT with window-envelope normalization (torch.istft semantics).

    Input (..., F, T) real/imag; output (..., samples).
    """
    win_length = win_length or n_fft
    win = _cached_window(n_fft, win_length, window)

    frames = inverse_rdft(real.swapaxes(-1, -2), imag.swapaxes(-1, -2),
                          n_fft, method=method)                # (..., T, n_fft)
    frames = frames * win

    y = overlap_add(frames, hop_length)
    n_frames = frames.shape[-2]
    env = overlap_add(jnp.broadcast_to(win * win, (n_frames, n_fft)), hop_length)
    y = y / (env + eps)

    if center:
        start = n_fft // 2
        # torch.istft: with an explicit length, crop [start : start+length] from
        # the raw OLA (zero-padding if short); otherwise drop n_fft//2 each side.
        end = (start + length) if length is not None else (y.shape[-1] - start)
        if y.shape[-1] < end:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, end - y.shape[-1])])
        y = y[..., start:end]
    elif length is not None:
        if y.shape[-1] < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
        y = y[..., :length]
    return y.astype(jnp.float32)


# ---------------------------------------------------------------------------
# conv-basis STFT (reference STFT class numerics)
# ---------------------------------------------------------------------------

def conv_stft(x: jnp.ndarray, filter_length: int = 1024, hop_length: int = 512,
              win_length: Optional[int] = None, window: str = 'hann',
              method: str = 'auto') -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv-basis STFT: reflect-pad filter_length//2, windowed DFT, (mag, phase).

    Identical numerics to centered :func:`stft` + :func:`magphase` — the
    reference's conv1d-against-Fourier-basis is algebraically the same product.
    """
    win_length = win_length or filter_length
    real, imag = stft(x, filter_length, hop_length, win_length, window,
                      center=True, pad_mode='reflect', method=method)
    return magphase(real, imag)


@functools.lru_cache(maxsize=16)
def _cached_istft_pinv_basis(n_fft: int, hop_length: int, win_length: int, window: str):
    return np.asarray(filters.istft_pinv_basis(n_fft, hop_length, win_length, window),
                      dtype=np.float32)


@functools.lru_cache(maxsize=16)
def _cached_square_window(n_fft: int, win_length: int, window: str):
    win = filters.pad_center(filters.get_window_array(window, win_length), n_fft)
    return np.asarray(win * win, dtype=np.float32)


def conv_istft(magnitude: jnp.ndarray, phase: jnp.ndarray,
               filter_length: int = 1024, hop_length: int = 512,
               win_length: Optional[int] = None, window: str = 'hann',
               eps: float = 1e-9) -> jnp.ndarray:
    """Inverse of :func:`conv_stft` via the pinv basis + squared-window OLA
    envelope correction (reference `models/transforms.py:71-101` numerics)."""
    win_length = win_length or filter_length
    comp = jnp.concatenate([magnitude * jnp.cos(phase),
                            magnitude * jnp.sin(phase)], axis=-2)   # (..., 2F, T)
    inv_basis = _cached_istft_pinv_basis(filter_length, hop_length, win_length, window)

    # conv_transpose1d == per-frame basis projection + OLA
    frames = jnp.einsum('...ct,cn->...tn', comp, inv_basis,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    y = overlap_add(frames, hop_length)

    n_frames = comp.shape[-1]
    sq = _cached_square_window(filter_length, win_length, window)
    env = overlap_add(jnp.broadcast_to(sq, (n_frames, filter_length)), hop_length) + eps
    y = y / env
    y = y * (filter_length / hop_length)

    pad = filter_length // 2
    return y[..., pad:y.shape[-1] - pad]
