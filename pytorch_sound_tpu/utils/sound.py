"""Host-side sound utilities: midi, filtering, f0, durations, pre-emphasis.

Parity target: `/root/reference/pytorch_sound/utils/sound.py`.  The pyworld /
pysndfx / pretty_midi dependencies are replaced with scipy-based and local
implementations (see each function's note).
"""

import numpy as np
from scipy import signal

from pytorch_sound_tpu.utils.midi import MidiFile
from pytorch_sound_tpu.utils.wavio import read_wav_info


def parse_midi(path: str) -> MidiFile:
    """Parse a MIDI file into a :class:`MidiFile` (piano-roll capable).

    Reference used pretty_midi (`utils/sound.py:10-22`); this uses the local
    SMF parser with the same ``get_piano_roll()`` contract.
    """
    try:
        midi = MidiFile(path)
        midi.remove_invalid_notes()
    except Exception as e:
        raise Exception('%s\nerror reading midi file %s' % (e, path))
    return midi


def lowpass(wav: np.ndarray, frequency: int, sr: int = 22050, order: int = 5) -> np.ndarray:
    """Low-pass filter (Butterworth, zero-phase).

    Reference shelled out to sox via pysndfx (`utils/sound.py:25-35`).
    """
    nyq = sr / 2
    sos = signal.butter(order, min(frequency / nyq, 0.999), btype='low', output='sos')
    return signal.sosfiltfilt(sos, wav).astype(np.float32)


def get_f0(wav: np.ndarray, hop_length: int, sr: int = 22050,
           fmin: float = 60.0, fmax: float = 500.0) -> np.ndarray:
    """Frame-wise f0 with normalized autocorrelation + parabolic refinement.

    Reference used WORLD's dio+stonemask (`utils/sound.py:38-49`, pyworld);
    this is an independent ACF tracker with the same output contract: one f0
    value per hop, 0 for unvoiced frames, float32.
    """
    x = np.asarray(wav, dtype=np.float64)
    frame_len = int(sr / fmin * 2)
    n_frames = max(1, int(np.ceil(len(x) / hop_length)))
    pad = frame_len + hop_length
    x = np.pad(x, (frame_len // 2, pad), mode='reflect' if len(x) > 1 else 'constant')

    lag_min = int(sr / fmax)
    lag_max = int(sr / fmin)
    f0 = np.zeros(n_frames, dtype=np.float32)
    for i in range(n_frames):
        frame = x[i * hop_length: i * hop_length + frame_len]
        frame = frame - frame.mean()
        power = frame.dot(frame)
        if power < 1e-9:
            continue
        acf = signal.correlate(frame, frame, mode='full')[frame_len - 1:]
        acf /= acf[0] + 1e-12
        seg = acf[lag_min:lag_max]
        if len(seg) == 0:
            continue
        peak = int(np.argmax(seg)) + lag_min
        if acf[peak] < 0.3:   # unvoiced
            continue
        # parabolic interpolation around the ACF peak
        if 1 <= peak < len(acf) - 1:
            a, b, c = acf[peak - 1], acf[peak], acf[peak + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
        else:
            shift = 0.0
        f0[i] = sr / (peak + shift)
    return f0


def get_wav_duration(file: str) -> float:
    """Duration of a wav file in seconds; -1 on failure.

    Header-only parse — faster than the reference's full scipy read
    (`utils/sound.py:52-63`) and the filter contract (-1 -> row dropped) is kept.
    """
    try:
        sr, n_frames, _, _ = read_wav_info(file)
        dur = n_frames / sr
    except Exception:
        dur = -1
    return dur


def preemphasis(x: np.ndarray, coeff: float = 0.97) -> np.ndarray:
    """First-order FIR pre-emphasis: y[t] = x[t] - coeff*x[t-1]."""
    return signal.lfilter([1, -coeff], [1], x).astype(np.float32)


def inv_preemphasis(x: np.ndarray, coeff: float = 0.97) -> np.ndarray:
    """Inverse (IIR) of :func:`preemphasis`."""
    return signal.lfilter([1], [1, -coeff], x).astype(np.float32)
