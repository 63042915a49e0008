"""Fused single-jit GAN step at the BEST config (NTC gen + measured masks).

Round-2 never A/B'd fused-vs-split at equal config: 'fused' was measured
only with the NCT generator + old masks (6.02 steps/s), split with NTC +
pallas-2 (6.91). With the round-4 masks the split step measures 12.53
steps/s (exp_ganstep) and contains NO Pallas kernels in the discriminators,
so the fused program can compile without the remote-helper OOM. Fused wins
if XLA CSEs the disc-phase generator forward (5.8 ms) against the gen-phase
tape forward and saves one dispatch.
"""
import os
import sys
import time
import tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import optax
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()

from pytorch_sound_tpu.examples.hifi_gan import HiFiGANTrainer
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators as disc
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401

BATCH, T = 16, 8192
gen = build_model('hifi_gan_v2', extra_kwargs=dict(data_format='NTC'))
mpd = build_model('hifi_gan_mpd_base')
msd = disc.MultiScaleDiscriminator(n_scales=3, width=1.0)   # measured mask
print('fused step, gen=NTC msd_mask=%s' % (msd.backends,), flush=True)

trainer = HiFiGANTrainer(
    gen, mpd, msd,
    optax.adamw(2e-4, b1=0.8, b2=0.99), optax.adamw(2e-4, b1=0.8, b2=0.99),
    None, None, max_step=1, valid_max_step=1, save_interval=10 ** 9,
    log_interval=10 ** 9, save_dir=tempfile.mkdtemp(prefix='bench_gan_'),
    save_prefix='bench', seed=0, split_step=False)

rng = np.random.default_rng(4)
wav = jax.device_put(rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1)
device_batch = [wav]
trainer._ensure_initialized(device_batch)
step_fn = trainer._get_train_step()

t0 = time.perf_counter()
params, opt, loss, _ = step_fn(trainer.params, trainer.opt_state,
                               device_batch, is_logging=False)
jax.block_until_ready(loss)
print('first fused step (compile): %.1f s  loss=%.4f'
      % (time.perf_counter() - t0, float(loss)), flush=True)


def run_n(params, opt, n):
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt, loss, _ = step_fn(params, opt, device_batch,
                                       is_logging=False)
    l = float(loss)
    return time.perf_counter() - t0, params, opt, l


_, params, opt, _ = run_n(params, opt, 2)
t1s, t2s = [], []
for trial in range(3):
    t1, params, opt, _ = run_n(params, opt, 6)
    t2, params, opt, l = run_n(params, opt, 18)
    t1s.append(t1)
    t2s.append(t2)
slopes = [(b - a) / 12 for a, b in zip(t1s, t2s) if b > a]
dt = float(np.median(slopes)) if slopes else min(t2s) / 18
print('fused step: %.2f ms -> %.2f steps/s  (loss %.4f)'
      % (dt * 1e3, 1.0 / dt, l), flush=True)
