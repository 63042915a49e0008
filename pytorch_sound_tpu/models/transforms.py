"""DSP transform modules with the reference's class API over the functional ops.

API parity target: `/root/reference/pytorch_sound/models/transforms.py` —
classes STFT, LearnableSTFT, LogMelSpectrogram, LogMelScale, STFTTorchAudio,
Audio2Mel, LogMelSpectrogramTorchAudio, SpectrogramMasker, MelToMFCC, MFCC,
PQMF, with the same constructor arguments and method names.

Design: these are *stateless callables* holding precomputed constant arrays —
jit/vmap-compatible and free of framework state, per JAX idiom.  The only
trainable transform, :class:`LearnableSTFT`, is a flax module.  Device
placement is implicit (no ``.cuda()``): everything runs wherever jit puts it,
which also fixes the reference's hardcoded-CUDA quirks
(`models/transforms.py:406`, `models/sound.py:116`).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.ops import filters, mel as mel_ops, pqmf as pqmf_ops
from pytorch_sound_tpu.ops import sound as sound_ops
from pytorch_sound_tpu.ops import stft as stft_ops


class STFT:
    """Conv-basis STFT with exact inverse (reference `transforms.py:13-101`).

    ``transform(wav (N, T)) -> (mag (N, F, T'), phase)``;
    ``inverse(mag, phase) -> wav`` via the pinv basis + window-envelope OLA.
    """

    def __init__(self, filter_length: int = 1024, hop_length: int = 512,
                 win_length: int = None, window: str = 'hann'):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length if win_length else filter_length
        self.window = window
        self.pad_amount = filter_length // 2
        assert filter_length >= self.win_length

    def transform(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return stft_ops.conv_stft(wav, self.filter_length, self.hop_length,
                                  self.win_length, self.window)

    def inverse(self, magnitude: jnp.ndarray, phase: jnp.ndarray,
                eps: float = 1e-9) -> jnp.ndarray:
        return stft_ops.conv_istft(magnitude, phase, self.filter_length,
                                   self.hop_length, self.win_length,
                                   self.window, eps=eps)

    __call__ = transform


class LearnableSTFT(nn.Module):
    """STFT whose forward/inverse bases are trainable parameters
    (reference `transforms.py:104-203`, *experimental*).

    Usage: ``mag, phase = module.apply(params, wav)``;
    ``wav = module.apply(params, mag, phase, method=LearnableSTFT.inverse)``.
    """

    filter_length: int = 1024
    hop_length: int = 512
    win_length: Optional[int] = None
    window: str = 'hann'
    trainable_forward: bool = True
    trainable_inverse: bool = True

    def setup(self):
        win_len = self.win_length or self.filter_length
        assert self.filter_length >= win_len
        win = filters.pad_center(filters.hann_window(win_len), self.filter_length)
        self.fft_window = jnp.asarray(win, dtype=jnp.float32)

        fwd = filters.dft_basis(self.filter_length).astype(np.float32)
        inv = filters.istft_pinv_basis(
            self.filter_length, self.hop_length, win_len, self.window)
        inv = (inv / win[None, :].clip(1e-12)).astype(np.float32)  # unwindowed basis
        if self.trainable_forward:
            self.forward_basis = self.param('forward_basis', lambda _: jnp.asarray(fwd))
        else:
            self.forward_basis = jnp.asarray(fwd)
        if self.trainable_inverse:
            self.inverse_basis = self.param('inverse_basis', lambda _: jnp.asarray(inv))
        else:
            self.inverse_basis = jnp.asarray(inv)

    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pad = self.filter_length // 2
        x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode='reflect')
        frames = stft_ops.frame(x, self.filter_length, self.hop_length)
        basis = self.forward_basis * self.fft_window[None, :]
        proj = jnp.einsum('...tn,fn->...ft', frames, basis,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        real, imag = jnp.split(proj, 2, axis=-2)
        return stft_ops.magphase(real, imag)

    def inverse(self, magnitude: jnp.ndarray, phase: jnp.ndarray,
                eps: float = 1e-9) -> jnp.ndarray:
        comp = jnp.concatenate([magnitude * jnp.cos(phase),
                                magnitude * jnp.sin(phase)], axis=-2)
        basis = self.inverse_basis * self.fft_window[None, :]
        frames = jnp.einsum('...ct,cn->...tn', comp, basis,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        y = stft_ops.overlap_add(frames, self.hop_length)
        n_frames = comp.shape[-1]
        sq = self.fft_window * self.fft_window
        env = stft_ops.overlap_add(
            jnp.broadcast_to(sq, (n_frames, self.filter_length)), self.hop_length) + eps
        y = y / env * (self.filter_length / self.hop_length)
        pad = self.filter_length // 2
        return y[..., pad: y.shape[-1] - pad]


class LogMelSpectrogram:
    """Wave -> log-mel (reference `transforms.py:206-244` numerics):
    conv-STFT magnitude, slaney mel filterbank, log(+1e-6), db->log clamping."""

    def __init__(self, sample_rate: int, mel_size: int, n_fft: int, win_length: int,
                 hop_length: int, min_db: float = None, max_db: float = None,
                 mel_min: float = 0., mel_max: float = None):
        self.sample_rate = sample_rate
        self.mel_size = mel_size
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.min_db = min_db
        self.max_db = max_db
        self.mel_min = mel_min
        self.mel_max = mel_max

    def __call__(self, wav: jnp.ndarray, log_offset: float = 1e-6) -> jnp.ndarray:
        # fused Pallas path on TPU when the geometry fits (hop | n_fft == win)
        if (jax.default_backend() == 'tpu' and wav.ndim == 2
                and self.win_length == self.n_fft
                and self.n_fft % self.hop_length == 0):
            from pytorch_sound_tpu.ops.pallas.logmel import fused_log_mel
            return fused_log_mel(
                wav, self.sample_rate, self.mel_size, self.n_fft,
                self.win_length, self.hop_length, self.min_db, self.max_db,
                self.mel_min, self.mel_max, log_offset=log_offset)
        return mel_ops.log_mel_spectrogram(
            wav, self.sample_rate, self.mel_size, self.n_fft, self.win_length,
            self.hop_length, self.min_db, self.max_db, self.mel_min, self.mel_max,
            log_offset=log_offset)

    forward = __call__


class LogMelScale:
    """Externally-computed magnitude -> clamped log-mel.

    (The reference class crashes on construction — `transforms.py:258-259`
    passes an invalid dtype kwarg to ``torch.Tensor`` — documented in
    SURVEY.md; this implementation is the working equivalent.)
    """

    def __init__(self, sample_rate: int, mel_size: int, n_fft: int,
                 min_db: float, max_db: float, mel_min: float = 0.,
                 mel_max: float = None):
        self.mel_size = mel_size
        self.min_db = mel_ops.db_to_log(min_db)
        self.max_db = mel_ops.db_to_log(max_db)
        self.mel_filter = mel_ops.cached_mel_filter(
            sample_rate, n_fft, mel_size, mel_min, mel_max)

    def __call__(self, magnitude: jnp.ndarray, log_offset: float = 1e-6) -> jnp.ndarray:
        mel = jnp.einsum('mf,...ft->...mt', self.mel_filter, magnitude,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        mel = jnp.log(mel + log_offset)
        return jnp.clip(mel, self.min_db, self.max_db)

    forward = __call__


class STFTTorchAudio:
    """torch.stft-interface STFT (reference `transforms.py:271-319`):
    centered reflect padding, hann window, (mag, phase) / exact istft inverse.

    The name is kept for API parity; the implementation is the XLA stft core.
    """

    def __init__(self, filter_length: int = 1024, hop_length: int = 512,
                 win_length: int = None, n_fft: int = None, window: str = 'hann'):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length if win_length else filter_length
        if window != 'hann':
            raise NotImplementedError(f'{window} is not implemented ! Use hann')
        self.n_fft = n_fft if n_fft else self.win_length

    def forward(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return stft_ops.stft(wav, self.n_fft, self.hop_length, self.win_length,
                             center=True, pad_mode='reflect')

    def transform(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        real, imag = self.forward(wav)
        return stft_ops.magphase(real, imag)

    def inverse(self, magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
        return stft_ops.istft(real, imag, self.n_fft, self.hop_length,
                              self.win_length)

    __call__ = transform


class Audio2Mel:
    """MelGAN's log10 mel spectrogram (reference `transforms.py:322-366`)."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, sampling_rate: int = 22050,
                 n_mel_channels: int = 80, mel_fmin: float = 0.0,
                 mel_fmax: float = None):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.sampling_rate = sampling_rate
        self.n_mel_channels = n_mel_channels
        self.mel_fmin = mel_fmin
        self.mel_fmax = mel_fmax

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        if audio.ndim == 3:    # (N, 1, T) -> (N, T), as the reference squeezes
            audio = audio.squeeze(1)
        return mel_ops.audio2mel(audio, self.n_fft, self.hop_length,
                                 self.win_length, self.sampling_rate,
                                 self.n_mel_channels, self.mel_fmin, self.mel_fmax)

    forward = __call__


class LogMelSpectrogramTorchAudio:
    """Power-mel + log + clamp (reference `transforms.py:369-394`).

    The reference delegated to torchaudio.transforms.MelSpectrogram, whose
    defaults are a *power* (magnitude^2) spectrum over a centered hann STFT
    and an HTK-scaled, unnormalized mel filterbank — replicated here
    (``htk=True, norm=None``). Pass ``htk=False, norm='slaney'`` for the
    librosa-style filterbank used elsewhere in the toolkit.
    """

    def __init__(self, sample_rate: int, mel_size: int, n_fft: int, win_length: int,
                 hop_length: int, min_db: float, max_db: float,
                 mel_min: float = 0., mel_max: float = None,
                 htk: bool = True, norm: Optional[str] = None):
        self.sample_rate = sample_rate
        self.mel_size = mel_size
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.min_db = mel_ops.db_to_log(min_db)
        self.max_db = mel_ops.db_to_log(max_db)
        self.mel_min = mel_min
        self.mel_max = mel_max
        self.htk = htk
        self.norm = norm

    def __call__(self, wav: jnp.ndarray, log_offset: float = 1e-6) -> jnp.ndarray:
        mag = stft_ops.spectrogram_magnitude(
            wav, self.n_fft, self.hop_length, self.win_length, center=True)
        mel_filter = mel_ops.cached_mel_filter(
            self.sample_rate, self.n_fft, self.mel_size, self.mel_min, self.mel_max,
            htk=self.htk, norm=self.norm)
        mel = jnp.einsum('mf,...ft->...mt', mel_filter, mag * mag,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        mel = jnp.log(mel + log_offset)
        return jnp.clip(mel, self.min_db, self.max_db)

    forward = __call__


class SpectrogramMasker:
    """Wave-level mask -> frame-level mask (reference `transforms.py:397-416`,
    minus the hardcoded ``.cuda()``)."""

    def __init__(self, win_length: int, hop_length: int):
        self.win_length = win_length
        self.hop_length = hop_length

    def __call__(self, wav_mask: jnp.ndarray) -> jnp.ndarray:
        return sound_ops.spectrogram_mask(wav_mask, self.win_length, self.hop_length)

    forward = __call__


class MelToMFCC:
    """log-mel -> MFCC via DCT-II (reference `transforms.py:419-432`)."""

    def __init__(self, n_mfcc: int, mel_size: int, norm: str = 'ortho'):
        self.n_mfcc = n_mfcc
        self.mel_size = mel_size
        self.norm = norm

    def __call__(self, mel_spec: jnp.ndarray) -> jnp.ndarray:
        assert mel_spec.ndim == 3
        return mel_ops.mel_to_mfcc(mel_spec, self.n_mfcc, self.mel_size, self.norm)

    forward = __call__


class MFCC:
    """Wave -> MFCC (reference `transforms.py:435-455`)."""

    def __init__(self, sample_rate: int, mel_size: int, n_fft: int, win_length: int,
                 n_mfcc: int, hop_length: int, min_db: float, max_db: float,
                 mel_min: float = 0., mel_max: float = None, norm: str = 'ortho'):
        self.n_mfcc = n_mfcc
        self.mel_func = LogMelSpectrogram(
            sample_rate, mel_size, n_fft, win_length, hop_length, min_db, max_db,
            mel_min, mel_max)
        self.mel_size = mel_size
        self.norm = norm

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        assert wav.ndim == 3
        mel = self.mel_func(wav)
        return mel_ops.mel_to_mfcc(mel, self.n_mfcc, self.mel_size, self.norm)

    forward = __call__


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.15,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser PQMF prototype (reference `transforms.py:462-489`)."""
    return filters.pqmf_prototype(taps, cutoff_ratio, beta)


class PQMF:
    """Near-perfect-reconstruction pseudo-QMF bank
    (reference `transforms.py:492-560`)."""

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.15, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        self.cutoff_ratio = cutoff_ratio
        self.beta = beta

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, 1, T) -> (B, subbands, T // subbands)."""
        return pqmf_ops.analysis(x, self.subbands, self.taps,
                                 self.cutoff_ratio, self.beta)

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, subbands, T // subbands) -> (B, 1, T)."""
        return pqmf_ops.synthesis(x, self.subbands, self.taps,
                                  self.cutoff_ratio, self.beta)
