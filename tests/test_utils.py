"""Utils tests: calculate, wavio, silence, sound, midi, tensor helpers."""

import os

import numpy as np
import pytest

from pytorch_sound_tpu.utils import calculate, silence, sound, wavio
from pytorch_sound_tpu.utils.tensor import concat_complex, to_device, to_numpy


def test_db2log_matches_formula():
    assert np.isclose(calculate.db2log(-50), np.log(10 ** (-5.0)))
    assert np.isclose(calculate.db2log(30), np.log(10 ** 3.0))


def test_norm_unnorm_mel_roundtrip(rng):
    mel_min, mel_max = calculate.db2log(-50), calculate.db2log(30)
    x = rng.uniform(mel_min, mel_max, size=(4, 80, 10)).astype(np.float32)
    normed = calculate.norm_mel(x)
    assert normed.min() >= -1 - 1e-6 and normed.max() <= 1 + 1e-6
    np.testing.assert_allclose(calculate.unnorm_mel(normed), x, rtol=1e-5, atol=1e-5)


def test_volume_norm_log(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    y = calculate.volume_norm_log(x, target_db=-11.5)
    assert np.isclose(np.std(y), 10 ** (-1.15), rtol=1e-4)


def test_wav_roundtrip(tmp_path, sine_wav):
    path = os.path.join(tmp_path, 'test.wav')
    wavio.write_wav(path, sine_wav, 22050)
    wav, sr = wavio.read_wav(path)
    assert sr == 22050
    np.testing.assert_allclose(wav, sine_wav, atol=1e-7)

    # int16 roundtrip with quantization error tolerance
    wavio.write_wav(path, sine_wav, 22050, dtype='int16')
    wav, sr = wavio.read_wav(path)
    np.testing.assert_allclose(wav, sine_wav, atol=1e-4)


def test_wav_info_and_duration(tmp_path, sine_wav):
    path = os.path.join(tmp_path, 'd.wav')
    wavio.write_wav(path, sine_wav, 22050)
    sr, n, ch, bits = wavio.read_wav_info(path)
    assert (sr, n, ch, bits) == (22050, len(sine_wav), 1, 32)
    assert np.isclose(sound.get_wav_duration(path), 1.5, atol=1e-3)
    assert sound.get_wav_duration('/nonexistent.wav') == -1


def test_resample_length():
    x = np.zeros(22050, dtype=np.float32)
    y = wavio.resample(x, 22050, 16000)
    assert abs(len(y) - 16000) <= 1


def test_silence_split():
    sr = 1000
    loud = np.sin(np.linspace(0, 100, sr)).astype(np.float32)
    quiet = np.zeros(sr, dtype=np.float32)
    seg = np.concatenate([loud, quiet, loud])
    chunks = silence.split_on_silence(seg, min_silence_len=500,
                                      silence_thresh=-30, keep_silence=10)
    assert len(chunks) == 2
    assert all(len(c) > sr // 2 for c in chunks)
    # fully loud -> one chunk
    assert len(silence.split_on_silence(loud, 500, -30, 0)) == 1


def test_preemphasis_roundtrip(sine_wav):
    y = sound.preemphasis(sine_wav)
    z = sound.inv_preemphasis(y)
    np.testing.assert_allclose(z, sine_wav, atol=1e-4)


def test_get_f0_sine(sine_wav):
    f0 = sound.get_f0(sine_wav, hop_length=256, sr=22050)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 5.0


def test_midi_parse_roundtrip(tmp_path):
    # hand-craft a tiny format-0 midi: note on pitch 60 at t=0, off at 1 beat
    import struct
    track = b''
    track += b'\x00' + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, 'big')  # tempo 120
    track += b'\x00' + bytes([0x90, 60, 100])    # note on
    track += b'\x60' + bytes([0x80, 60, 0])      # note off after 96 ticks (1 beat @ tpb 96)
    track += b'\x00' + bytes([0xFF, 0x2F, 0x00])  # end of track
    data = b'MThd' + struct.pack('>IHHH', 6, 0, 1, 96)
    data += b'MTrk' + struct.pack('>I', len(track)) + track
    path = os.path.join(tmp_path, 't.mid')
    with open(path, 'wb') as f:
        f.write(data)

    mid = sound.parse_midi(path)
    assert len(mid.notes) == 1
    n = mid.notes[0]
    assert n.pitch == 60 and np.isclose(n.end - n.start, 0.5, atol=1e-6)
    roll = mid.get_piano_roll()
    assert roll.shape[0] == 128
    assert (roll[60] == 100).sum() >= 49  # 0.5 s at fs=100


def test_to_device_and_back(sine_wav):
    (d,) = to_device(sine_wav)
    out = to_numpy(d)
    np.testing.assert_allclose(out, sine_wav)


def test_concat_complex():
    a = np.arange(8, dtype=np.float32).reshape(1, 4, 2)
    b = np.arange(8, 16, dtype=np.float32).reshape(1, 4, 2)
    out = np.asarray(concat_complex(a, b, dim=1))
    np.testing.assert_array_equal(out[0, :, 0], [0, 2, 8, 10, 4, 6, 12, 14])


def test_wav_multichannel_roundtrip(tmp_path):
    """(channels, T) input must produce a stereo header + interleaved data
    (the channel count was once computed after flattening — ADVICE round 1)."""
    t = np.linspace(0, 1, 22050, dtype=np.float32)
    stereo = np.stack([np.sin(2 * np.pi * 440 * t),
                       np.sin(2 * np.pi * 220 * t)]) * 0.5
    path = str(tmp_path / 'stereo.wav')
    wavio.write_wav(path, stereo, 22050)
    sr, n_frames, ch, bits = wavio.read_wav_info(path)
    assert (sr, ch, bits) == (22050, 2, 32)
    assert n_frames == stereo.shape[1]
    back, sr2 = wavio.read_wav(path)
    assert back.shape == stereo.shape
    np.testing.assert_allclose(back, stereo, atol=1e-6)


def test_get_f0_accuracy_stationary_tones():
    """YIN tracker accuracy gate: < 1% relative error on stationary tones
    across the supported range (the reference used WORLD dio+stonemask)."""
    sr, hop = 22050, 256
    t = np.arange(int(sr * 0.6)) / sr
    for freq in (82.4, 110.0, 220.0, 329.6, 440.0):
        wav = np.sin(2 * np.pi * freq * t).astype(np.float32)
        f0 = sound.get_f0(wav, hop_length=hop, sr=sr)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.9 * len(f0), freq
        rel_err = np.abs(voiced - freq) / freq
        assert np.median(rel_err) < 0.005, (freq, np.median(rel_err))
        assert rel_err.max() < 0.01, (freq, rel_err.max())


def test_get_f0_accuracy_glissando():
    """< 2% tracking error on a 100 -> 400 Hz exponential sweep (synthetic
    sweep tolerance per the round-1 review)."""
    sr, hop = 22050, 256
    dur = 1.0
    n = int(sr * dur)
    t = np.arange(n) / sr
    f_inst = 100.0 * (4.0 ** (t / dur))       # 100 -> 400 Hz
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    wav = np.sin(phase).astype(np.float32)
    f0 = sound.get_f0(wav, hop_length=hop, sr=sr)
    centers = np.arange(len(f0)) * hop
    expected = 100.0 * (4.0 ** (np.minimum(centers, n - 1) / sr / dur))
    # ignore the first/last few frames (window edge effects)
    sl = slice(3, len(f0) - 3)
    voiced = f0[sl] > 0
    assert voiced.mean() > 0.95
    rel_err = np.abs(f0[sl][voiced] - expected[sl][voiced]) / expected[sl][voiced]
    assert np.median(rel_err) < 0.01, np.median(rel_err)
    assert np.percentile(rel_err, 95) < 0.02, np.percentile(rel_err, 95)


def test_get_f0_unvoiced_and_silence():
    sr, hop = 22050, 256
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(sr // 2).astype(np.float32)
    f0_noise = sound.get_f0(noise, hop_length=hop, sr=sr)
    assert (f0_noise == 0).mean() > 0.7          # mostly unvoiced
    silence = np.zeros(sr // 2, dtype=np.float32)
    f0_sil = sound.get_f0(silence, hop_length=hop, sr=sr)
    assert (f0_sil == 0).all()


def test_get_f0_harmonic_complex():
    """Harmonic-rich tone (octave-error trap): fundamental must win."""
    sr, hop = 22050, 256
    t = np.arange(int(sr * 0.5)) / sr
    f = 150.0
    wav = sum((0.6 ** k) * np.sin(2 * np.pi * f * (k + 1) * t)
              for k in range(5)).astype(np.float32)
    f0 = sound.get_f0(wav, hop_length=hop, sr=sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.9 * len(f0)
    assert np.abs(np.median(voiced) - f) / f < 0.01


def test_enable_compilation_cache_strips_locations(tmp_path):
    """Pallas/Mosaic kernels serialize MLIR *call-site locations* into the
    HLO custom_call payload, so identical models jitted from different
    scripts produce different persistent-cache keys and recompile from
    scratch (verified on v5e — the 15-min GAN recompile root cause).
    enable_compilation_cache must disable location tracking."""
    import jax
    from pytorch_sound_tpu.utils.commons import enable_compilation_cache
    before_tb = jax.config.jax_include_full_tracebacks_in_locations
    before_lim = jax.config.jax_traceback_in_locations_limit
    try:
        enable_compilation_cache(cache_dir=str(tmp_path))
        assert jax.config.jax_include_full_tracebacks_in_locations is False
        assert jax.config.jax_traceback_in_locations_limit == 0
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update('jax_include_full_tracebacks_in_locations',
                          before_tb)
        jax.config.update('jax_traceback_in_locations_limit', before_lim)


def test_get_f0_dio_stationary_and_sweep():
    """The dio-style tracker (band-filtered interval analysis + stonemask
    instantaneous-frequency refinement) matches ground truth within 1% on a
    stationary tone and 2% on a glissando, and stays unvoiced on noise."""
    from pytorch_sound_tpu.utils import sound
    sr, hop = 22050, 256
    t = np.arange(sr) / sr

    # harmonic-rich 220 Hz (sawtooth-ish: 3 harmonics)
    f = 220.0
    wav = sum((1.0 / k) * np.sin(2 * np.pi * k * f * t) for k in range(1, 4))
    f0 = sound.get_f0_dio(wav.astype(np.float32), hop_length=hop, sr=sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert np.abs(np.median(voiced) - f) / f < 0.01

    # 100 -> 400 Hz exponential sweep
    f_inst = 100.0 * (4.0 ** t)
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    wav = np.sin(phase).astype(np.float32)
    f0 = sound.get_f0_dio(wav, hop_length=hop, sr=sr)
    centers = np.arange(len(f0)) * hop / sr
    truth = 100.0 * (4.0 ** centers)
    sel = (f0 > 0) & (centers > 0.1) & (centers < 0.9)
    assert sel.sum() > 0.6 * ((centers > 0.1) & (centers < 0.9)).sum()
    rel = np.abs(f0[sel] - truth[sel]) / truth[sel]
    assert np.median(rel) < 0.02

    # white noise must be mostly unvoiced
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(sr).astype(np.float32)
    f0 = sound.get_f0_dio(noise, hop_length=hop, sr=sr)
    assert (f0 > 0).mean() < 0.2
