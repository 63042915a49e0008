"""Decompose the preprocess-e2e pipeline into its four legs.

bench_preprocess_e2e (BASELINE config 1: decode -> on-device resample+RMS ->
fused log-mel -> fetch) measured 102 utt/s in round 2 vs the >=200 target.
This probe times each leg in isolation at the bench's exact shapes so the
fix targets the real wall:

  decode  : host WAV parse (native batch_load_i16 or the numpy fallback)
  h2d     : jnp.asarray of the int16 batch + block_until_ready
  compute : the jitted resample+rms+logmel program, device-loop slope timed
  d2h     : np.asarray fetch of FRESH f32 / bf16 / int8-wire features
  e2e     : the real double-buffered pipeline (same as the bench)

Run from repo root: python benchmarks/probes/exp_e2e.py
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
from pytorch_sound_tpu import native, settings
from pytorch_sound_tpu.ops.mel import log_mel_spectrogram
from pytorch_sound_tpu.ops.pallas.logmel import fused_log_mel
from pytorch_sound_tpu.ops.resample import resample_poly, rms_normalize
from pytorch_sound_tpu.utils import wavio
from timing import slope_timeit

N_FILES, SECONDS, SRC_SR, BATCH = 192, 4.0, 48000, 64
TARGET_SR = settings.SAMPLE_RATE
PAD_LEN = int(SECONDS * SRC_SR) + 512
ARGS = (TARGET_SR, settings.MEL_SIZE, settings.N_FFT, settings.WIN_LENGTH,
        settings.HOP_LENGTH, settings.MIN_DB, settings.MAX_DB,
        settings.MEL_MIN, settings.MEL_MAX)
ON_TPU = jax.default_backend() == 'tpu'

import tempfile
rng = np.random.default_rng(3)
d = tempfile.mkdtemp(prefix='probe_e2e_')
paths = []
for i in range(N_FILES):
    p = '%s/%d.wav' % (d, i)
    wavio.write_wav(p, (0.1 * rng.standard_normal(
        int(SRC_SR * SECONDS))).astype(np.float32), SRC_SR, dtype='int16')
    paths.append(p)


def decode(chunk):
    if native.available():
        mat, _l, _s = native.batch_load_i16(chunk, PAD_LEN)
        return mat
    wavs = [wavio.load_wav(p)[0] for p in chunk]
    return np.stack([np.pad(w[:PAD_LEN], (0, max(0, PAD_LEN - len(w))))
                     for w in wavs])


# ---- leg 1: host decode --------------------------------------------------
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    for i in range(0, N_FILES, BATCH):
        decode(paths[i:i + BATCH])
dt = (time.perf_counter() - t0) / reps
print('decode    : %6.1f ms/run  -> %7.1f utt/s  (native=%s)'
      % (dt * 1e3, N_FILES / dt, native.available()), flush=True)

# ---- leg 2: H2D ----------------------------------------------------------
mats = [decode(paths[i:i + BATCH]) for i in range(0, N_FILES, BATCH)]
for m in mats:
    jnp.asarray(m).block_until_ready()           # warm
t0 = time.perf_counter()
for k in range(reps):
    for m in mats:
        m = m.copy()
        m[0, 0] = k + 7                          # content-unique vs dedup
        jnp.asarray(m).block_until_ready()
dt = (time.perf_counter() - t0) / reps
mb = sum(m.nbytes for m in mats) / 1e6
print('h2d       : %6.1f ms/run  -> %7.1f utt/s  (%.0f MB, %.2f GB/s)'
      % (dt * 1e3, N_FILES / dt, mb, mb / 1e3 / dt), flush=True)


# ---- leg 3: device compute (resample+rms+logmel), device-loop ------------
def mel_core(w_src):
    w_src = w_src.astype(jnp.float32) * (1.0 / 32768.0)
    w = rms_normalize(resample_poly(w_src, SRC_SR, TARGET_SR))
    if ON_TPU:
        return fused_log_mel(w, *ARGS, precision='bf16x3')
    return log_mel_spectrogram(w, *ARGS)


w0 = jnp.asarray(mats[0].astype(np.float32))

def mk(c):
    w, = c
    mel = mel_core(w.astype(jnp.int16))
    s = mel.mean()
    return (jnp.roll(w, 1, axis=-1) * (1.0 + 1e-3 * jnp.tanh(s)),), s

dt = slope_timeit(mk, (w0,), n1=6, n2=18)
print('compute   : %6.1f ms/batch -> %7.1f utt/s' %
      (dt * 1e3, BATCH / dt), flush=True)

# ---- leg 4: D2H fetch of fresh features ----------------------------------
mel_fn = jax.jit(mel_core)
base = jnp.asarray(mats[0])
for wire, conv in (('f32', lambda m: m),
                   ('bf16', lambda m: m.astype(jnp.bfloat16)),
                   ('int8', None)):
    outs = []
    for k in range(reps * len(mats)):
        m = mel_fn(base + jnp.int16(k))          # fresh content each fetch
        if wire == 'int8':
            mn = jnp.min(m, axis=(1, 2), keepdims=True)
            mx = jnp.max(m, axis=(1, 2), keepdims=True)
            sc = jnp.maximum(mx - mn, 1e-6) / 254.0
            m = jnp.round((m - mn) / sc - 127.0).astype(jnp.int8)
        else:
            m = conv(m)
        outs.append(m)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for m in outs:
        np.asarray(m)
    dt = (time.perf_counter() - t0) / reps
    mb = sum(int(np.prod(m.shape)) * m.dtype.itemsize for m in outs) / 1e6 / reps
    print('d2h %-5s : %6.1f ms/run  -> %7.1f utt/s  (%.0f MB, %.1f MB/s)'
          % (wire, dt * 1e3, N_FILES / dt, mb, mb * 1e3 / dt), flush=True)

# ---- e2e: the real pipeline (import from bench) --------------------------
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import bench
for wire in ('bf16', 'int8', 'f32'):
    try:
        v = bench.bench_preprocess_e2e(wire=wire)
        print('e2e %-5s : %7.1f utt/s' % (wire, v), flush=True)
    except Exception as e:
        print('e2e %-5s : FAILED %r' % (wire, str(e)[:140]), flush=True)
