"""Native C++ audio runtime tests (skipped when csrc/libtpusound.so not built)."""

import os

import numpy as np
import pytest

from pytorch_sound_tpu import native
from pytorch_sound_tpu.utils import wavio

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='libtpusound.so not built (make -C csrc)')


@pytest.fixture(scope='module')
def wav_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp('native') / 'a.wav')
    t = np.arange(22050 * 2) / 22050
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    wavio.write_wav(path, wav, 22050)
    return path, wav


def test_native_wav_info(wav_file):
    path, wav = wav_file
    sr, frames, ch, bits = native.wav_info(path)
    assert (sr, frames, ch, bits) == (22050, len(wav), 1, 32)


def test_native_read_matches_python(wav_file):
    path, wav = wav_file
    n_wav, sr = native.read_wav(path)
    p_wav, p_sr = wavio.read_wav(path)
    assert sr == p_sr
    np.testing.assert_allclose(n_wav, p_wav, atol=1e-7)


def test_native_write_roundtrip(tmp_path, wav_file):
    _, wav = wav_file
    out = os.path.join(tmp_path, 'w.wav')
    native.write_wav(out, wav, 22050)
    back, sr = wavio.read_wav(out)
    assert sr == 22050
    np.testing.assert_allclose(back, wav, atol=1e-7)


def test_native_int16_decode(tmp_path):
    rng = np.random.default_rng(1)
    wav = (0.3 * rng.standard_normal(10000)).astype(np.float32).clip(-1, 1)
    path = os.path.join(tmp_path, 'i16.wav')
    wavio.write_wav(path, wav, 16000, dtype='int16')
    n_wav, sr = native.read_wav(path)
    p_wav, _ = wavio.read_wav(path)
    np.testing.assert_allclose(n_wav, p_wav, atol=1e-6)


def test_native_resample_quality():
    sr_in, sr_out = 48000, 22050
    t = np.arange(sr_in) / sr_in
    sine = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    out = native.resample(sine, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 2
    # the resampled signal is still a clean 1 kHz tone
    t2 = np.arange(len(out)) / sr_out
    ref = np.sin(2 * np.pi * 1000 * t2)
    corr = np.corrcoef(out[200:-200], ref[200:-200])[0, 1]
    assert corr > 0.999


def test_native_rms_normalize():
    rng = np.random.default_rng(2)
    wav = (0.01 * rng.standard_normal(40000)).astype(np.float32)
    out = native.rms_normalize(wav, -23.0)
    rms_db = 20 * np.log10(np.sqrt(np.mean(out ** 2)))
    assert abs(rms_db + 23.0) < 0.1


def test_native_mulaw_roundtrip():
    rng = np.random.default_rng(3)
    wav = np.tanh(rng.standard_normal(5000)).astype(np.float32)
    q = native.mulaw_encode(wav, 256)
    assert q.min() >= 0 and q.max() <= 255
    back = native.mulaw_decode(q, 256)
    # mu-law 8-bit quantization error bound
    assert np.abs(back - wav).max() < 0.04
    # companding gives finer resolution near zero
    small = np.linspace(-0.01, 0.01, 100).astype(np.float32)
    qs = native.mulaw_encode(small, 256)
    assert len(np.unique(qs)) > 10


def test_native_batch_load(tmp_path):
    rng = np.random.default_rng(4)
    paths = []
    wavs = []
    for i in range(6):
        p = os.path.join(tmp_path, 'b%d.wav' % i)
        w = (0.2 * rng.standard_normal(48000)).astype(np.float32)
        wavio.write_wav(p, w, 48000)
        paths.append(p)
        wavs.append(w)
    paths.append(os.path.join(tmp_path, 'missing.wav'))

    outs = native.batch_load(paths, target_sr=22050, normalize=True,
                             n_threads=4)
    assert len(outs) == 7
    assert outs[-1] is None                  # missing file -> None
    for o in outs[:-1]:
        assert o is not None
        assert abs(len(o) - 22050) <= 2      # resampled to 1s at 22.05k
        rms_db = 20 * np.log10(np.sqrt(np.mean(o ** 2)))
        assert abs(rms_db + 23.0) < 1.0


def test_load_wav_uses_native_consistently(wav_file):
    path, _ = wav_file
    via_loader, sr = wavio.load_wav(path, sr=16000)
    assert sr == 16000
    assert abs(len(via_loader) - 16000 * 2) <= 2


def _write_wav16(path, pcm16, sr, fmt_tag=1, extensible=False):
    """Hand-rolled 16-bit mono RIFF writer with a controllable wFormatTag."""
    import struct
    data = pcm16.astype('<i2').tobytes()
    if extensible:
        # WAVE_FORMAT_EXTENSIBLE: 40-byte fmt, real tag in the GUID prefix
        fmt = struct.pack('<HHIIHHHHI', 0xFFFE, 1, sr, sr * 2, 2, 16, 22, 16,
                          fmt_tag) + b'\x00\x00\x00\x00\x10\x00\x80\x00' \
              b'\x00\xAA\x00\x38\x9B\x71'
    else:
        fmt = struct.pack('<HHIIHH', fmt_tag, 1, sr, sr * 2, 2, 16)
    with open(path, 'wb') as w:
        w.write(b'RIFF' + struct.pack('<I', 20 + len(fmt) + len(data))
                + b'WAVE')
        w.write(b'fmt ' + struct.pack('<I', len(fmt)) + fmt)
        w.write(b'data' + struct.pack('<I', len(data)) + data)


def test_batch_load_i16_fast_path_checks_format_tag(tmp_path):
    """The PCM16-mono memcpy fast path must fire only for true PCM:
    a plain PCM file and an extensible-PCM file stream bit-exactly, while a
    16-bit non-PCM tag falls through to the general decoder (which reads the
    payload by its PCM layout — same bytes here — rather than blind memcpy).
    """
    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(7)
    pcm = (rng.integers(-20000, 20000, 1000)).astype(np.int16)
    plain = os.path.join(tmp_path, 'plain.wav')
    ext = os.path.join(tmp_path, 'ext.wav')
    nonpcm = os.path.join(tmp_path, 'nonpcm.wav')
    _write_wav16(plain, pcm, 16000)
    _write_wav16(ext, pcm, 16000, extensible=True)
    _write_wav16(nonpcm, pcm, 16000, fmt_tag=2)    # claims ADPCM

    mat, lens, srs = native.batch_load_i16([plain, ext, nonpcm], 1200)
    assert list(srs) == [16000] * 3
    assert list(lens) == [1000] * 3
    np.testing.assert_array_equal(mat[0, :1000], pcm)
    np.testing.assert_array_equal(mat[1, :1000], pcm)   # extensible-PCM fast
    # the non-PCM file went through the general decoder (float roundtrip of
    # int16 is exact) — decoded-as-PCM bytes equal the original payload here
    np.testing.assert_array_equal(mat[2, :1000], pcm)
    assert not mat[:, 1000:].any()


def test_batch_load_wire_matches_batch_load(tmp_path):
    """The one-pass C wire loader (decode->resample->reflect->quantize) is
    the f32 pipeline + quantization, exactly: i16 within 1 LSB, mu-law-256
    within the companding bound; crop happens AFTER resampling (no edge
    transient at pad_len)."""
    import numpy as np
    import pytest
    from pytorch_sound_tpu import native
    from pytorch_sound_tpu.utils import wavio

    if not native.available():
        pytest.skip('native library not built')
    rng = np.random.default_rng(5)
    paths = []
    for i, n in enumerate((48000, 48999, 50000)):   # last exceeds pad
        p = str(tmp_path / ('%d.wav' % i))
        wavio.write_wav(p, (0.1 * rng.standard_normal(n)).astype(np.float32),
                        48000, dtype='int16')
        paths.append(p)
    pad = 22050 + 512
    m16, l16 = native.batch_load_wire(paths, 22050, pad, mode='i16',
                                      tail_ext=516)
    m8, l8 = native.batch_load_wire(paths, 22050, pad, mode='mulaw8',
                                    tail_ext=516)
    ref = native.batch_load(paths, target_sr=22050)
    assert m16.dtype == np.int16 and m8.dtype == np.uint8
    for i in range(3):
        n = min(len(ref[i]), pad)
        assert l16[i] == n and l8[i] == n
        err = np.abs(m16[i, :n].astype(np.float32) / 32768.0
                     - ref[i][:n]).max()
        assert err < 1.0 / 32768 + 1e-6
        dec = native.mulaw_decode(m8[i, :n].astype(np.int32))
        assert np.abs(dec - ref[i][:n]).max() < 0.02
        # reflect tail: row continues past n with mirrored samples
        if pad - n > 4:
            got = m16[i, n:n + 3].astype(np.float32) / 32768.0
            want = ref[i][n - 2:n - 5:-1]
            assert np.abs(got - want).max() < 1.0 / 32768 + 1e-6
