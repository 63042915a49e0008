"""On-device Kaiser polyphase resampler: golden parity with the native/host
resampler (csrc/tpusound.cc ts_resample — itself the replacement for the
reference's sox subprocess, `/root/reference/pytorch_sound/scripts/preprocess.py:82-88`).
"""

import math
import os
import tempfile

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sound_tpu.ops.resample import (kaiser_polyphase_bank,
                                            resample_out_len, resample_poly,
                                            rms_normalize)


def _ref_resample(x, orig_sr, target_sr, taps=24):
    """Scalar transcription of the native ts_resample loop."""
    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    if up == down:
        return x.copy()
    bank = kaiser_polyphase_bank(up, down)
    h_src = taps // 2
    n_in = len(x)
    n_out = (n_in * up + down - 1) // down
    out = np.zeros(n_out, np.float32)
    for m in range(n_out):
        up_idx = m * down
        src0 = up_idx // up - h_src
        h = bank[up_idx % up]
        acc = 0.0
        for j in range(taps):
            s = src0 + j
            if 0 <= s < n_in:
                acc += float(h[j]) * float(x[s])
        out[m] = acc
    return out


@pytest.mark.parametrize('orig_sr,target_sr,n', [
    (48000, 22050, 4801),    # the standard corpus downsample (147/320)
    (44100, 22050, 2000),    # 1/2
    (16000, 22050, 1600),    # upsample with large up (441/320)
    (22050, 44100, 999),     # 2/1
    (22050, 22050, 500),     # identity
])
def test_resample_matches_native_semantics(orig_sr, target_sr, n):
    rng = np.random.default_rng(n)
    x = (0.3 * rng.standard_normal(n)).astype(np.float32)
    ref = _ref_resample(x, orig_sr, target_sr)
    got = np.asarray(resample_poly(jnp.asarray(x), orig_sr, target_sr))
    assert got.shape[-1] == resample_out_len(n, orig_sr, target_sr) == len(ref)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_resample_batched_and_jitted():
    rng = np.random.default_rng(1)
    xb = (0.3 * rng.standard_normal((3, 4801))).astype(np.float32)
    f = jax.jit(lambda x: resample_poly(x, 48000, 22050))
    got = np.asarray(f(jnp.asarray(xb)))
    ref = np.stack([_ref_resample(r, 48000, 22050) for r in xb])
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_resample_preserves_tone_frequency():
    """A 1 kHz tone stays a 1 kHz tone through 48000 -> 22050."""
    sr_in, sr_out = 48000, 22050
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), sr_in, sr_out))
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 400)
    assert abs(peak_hz - 1000.0) < 5.0
    # passband amplitude preserved (Kaiser ripple is tiny)
    assert abs(np.abs(y[500:-500]).max() - 1.0) < 0.02


def test_rms_normalize_masked_lengths():
    rng = np.random.default_rng(2)
    x = (0.5 * rng.standard_normal((2, 1000))).astype(np.float32)
    xp = np.pad(x, [(0, 0), (0, 200)])
    out = np.asarray(rms_normalize(jnp.asarray(xp),
                                   lengths=jnp.asarray([1000, 1000])))
    target = 10 ** (-23.0 / 20.0)
    for row in out:
        assert abs(np.sqrt((row[:1000] ** 2).mean()) - target) < 1e-4
    assert (out[:, 1000:] == 0).all()          # padding untouched (zeros)


def test_native_batch_load_i16_roundtrip():
    from pytorch_sound_tpu import native
    from pytorch_sound_tpu.utils import wavio
    if not native.available():
        pytest.skip('native library not built and no toolchain')
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(3)
    paths, refs = [], []
    for i, (sr, n) in enumerate([(48000, 5000), (22050, 3000)]):
        w = (0.2 * rng.standard_normal(n)).astype(np.float32)
        p = os.path.join(d, 'x%d.wav' % i)
        wavio.write_wav(p, w, sr, dtype='int16')   # PCM16 = memcpy fast path
        paths.append(p)
        refs.append((wavio.load_wav(p)[0], sr))
    mat, lens, srs = native.batch_load_i16(paths, 6000)
    assert mat.shape == (2, 6000) and mat.dtype == np.int16
    for i, (w, sr) in enumerate(refs):
        assert lens[i] == len(w) and srs[i] == sr
        got = mat[i, :lens[i]].astype(np.float32) / 32768.0
        np.testing.assert_allclose(got, w, atol=1e-6)   # exact passthrough
        assert (mat[i, lens[i]:] == 0).all()


@pytest.mark.parametrize('orig_sr,target_sr', [
    (8000, 22050),     # large up factor (441/160)
    (48000, 16000),    # exact 1/3
    (22050, 48000),    # large up (320/147)
])
def test_resample_extreme_ratios(orig_sr, target_sr):
    rng = np.random.default_rng(orig_sr)
    x = (0.3 * rng.standard_normal(3000)).astype(np.float32)
    ref = _ref_resample(x, orig_sr, target_sr)
    got = np.asarray(resample_poly(jnp.asarray(x), orig_sr, target_sr))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)
