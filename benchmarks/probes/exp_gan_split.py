"""Split GAN step timing: NTC generator + configurable MSD backend mask.

Slope timing over the python step loop: (T(n2 steps) - T(n1 steps)) / (n2-n1)
cancels fixed per-run overhead; params update every step so content is unique.
"""
import os, sys, time, tempfile
sys.path.insert(0, '/root/repo')
import numpy as np, jax, optax
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()

from pytorch_sound_tpu.examples.hifi_gan import HiFiGANTrainer
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators as disc
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa

BATCH, T = 16, 8192
GEN_FMT = os.environ.get('GEN_FMT', 'NTC')
N_PALLAS = int(os.environ.get('MSD_PALLAS', '2'))   # first N layers on Pallas
MPD_PALLAS = int(os.environ.get('MPD_PALLAS', '0'))  # 1 = MPD all-auto
mask = tuple(['auto'] * N_PALLAS + ['xla'] * (8 - N_PALLAS))

gen = build_model('hifi_gan_v2', extra_kwargs=dict(data_format=GEN_FMT))
if MPD_PALLAS:
    mpd = disc.MultiPeriodDiscriminator(backends=('auto',) * 6)
else:
    mpd = build_model('hifi_gan_mpd_base')
msd = disc.MultiScaleDiscriminator(n_scales=3, width=1.0, backends=mask)
print('gen=%s msd_mask=%s mpd_pallas=%d' % (GEN_FMT, mask, MPD_PALLAS),
      flush=True)

trainer = HiFiGANTrainer(
    gen, mpd, msd,
    optax.adamw(2e-4, b1=0.8, b2=0.99), optax.adamw(2e-4, b1=0.8, b2=0.99),
    None, None, max_step=1, valid_max_step=1, save_interval=10 ** 9,
    log_interval=10 ** 9, save_dir=tempfile.mkdtemp(prefix='bench_gan_'),
    save_prefix='bench', seed=0, split_step=True)

rng = np.random.default_rng(4)
wav = rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1
device_batch = [jax.device_put(wav)]
trainer._ensure_initialized(device_batch)
step_fn = trainer._get_train_step()

t_c0 = time.perf_counter()
params, opt, loss, _ = step_fn(trainer.params, trainer.opt_state,
                               device_batch, is_logging=False)
jax.block_until_ready(loss)
print('first step (compile): %.1f s  loss=%.4f' %
      (time.perf_counter() - t_c0, float(loss)), flush=True)

def run_n(params, opt, n):
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt, loss, _ = step_fn(params, opt, device_batch,
                                       is_logging=False)
    l = float(loss)   # host sync
    return time.perf_counter() - t0, params, opt, l

# warmup + slope
_, params, opt, _ = run_n(params, opt, 2)
for trial in range(3):
    t1, params, opt, _ = run_n(params, opt, 4)
    t2, params, opt, l = run_n(params, opt, 16)
    dt = (t2 - t1) / 12
    print('steady: %.1f ms/step -> %.2f steps/s  (loss %.4f)' %
          (dt * 1e3, 1.0 / dt, l), flush=True)
