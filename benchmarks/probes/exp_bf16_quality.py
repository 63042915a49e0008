"""bf16-critic quality guard: 200-step CPU loss-curve A/B vs f32.

Runs the full adversarial recipe twice from the same seed and data stream —
once with f32 critics, once with compute_dtype='bf16' critics (and the folded
MSD, the round-5 speed config) — and reports the relative drift of the
smoothed generator/discriminator loss curves. Gate: <= 1e-2 relative drift of
the trailing-50-step means (VERDICT round-4 ask #4's quality bar).

CPU-only (no TPU needed): JAX_PLATFORMS=cpu python exp_bf16_quality.py [steps]
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import tempfile

import numpy as np
import jax
import optax

from pytorch_sound_tpu.examples.hifi_gan import HiFiGANTrainer
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators as disc
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
BATCH, T = 2, 2048

rng = np.random.default_rng(23)
# a fixed stream of pseudo-audio batches (tonal + noise so the mel loss has
# structure), shared between both runs
batches = [np.sin(np.linspace(0, 50 * (i + 1), T, dtype=np.float32))[None]
           * 0.3 + 0.05 * rng.standard_normal((BATCH, T)).astype(np.float32)
           for i in range(STEPS)]


def run(cdt, folded):
    gen = build_model('hifi_gan_v3',
                      extra_kwargs={'upsample_initial_channel': 32})
    trainer = HiFiGANTrainer(
        gen,
        disc.MultiPeriodDiscriminator(periods=(2, 3), channels=(8, 16),
                                      compute_dtype=cdt),
        disc.MultiScaleDiscriminator(n_scales=2, width=0.0625,
                                     compute_dtype=cdt),
        optax.adamw(2e-4, b1=0.8, b2=0.99), optax.adamw(2e-4, b1=0.8, b2=0.99),
        None, None, max_step=1, valid_max_step=1, save_interval=10 ** 9,
        log_interval=10 ** 9, save_dir=tempfile.mkdtemp(prefix='bf16q_'),
        save_prefix='q', seed=31, msd_folded=folded)
    trainer._ensure_initialized([jax.numpy.asarray(batches[0])])
    step_fn = trainer._get_train_step()
    params, opt = trainer.params, trainer.opt_state
    losses = []
    for i, b in enumerate(batches):
        params, opt, loss, _ = step_fn(params, opt, [jax.numpy.asarray(b)],
                                       is_logging=False)
        losses.append(float(loss))
        if (i + 1) % 50 == 0:
            print('  [%s] step %d loss %.4f' % (cdt or 'f32', i + 1,
                                                losses[-1]), flush=True)
    return np.asarray(losses)


print('f32 baseline (%d steps)...' % STEPS, flush=True)
l_f32 = run(None, False)
print('bf16 + folded MSD (%d steps)...' % STEPS, flush=True)
l_b16 = run('bf16', True)

tail = max(10, STEPS // 4)
m_f32 = float(l_f32[-tail:].mean())
m_b16 = float(l_b16[-tail:].mean())
drift = abs(m_b16 - m_f32) / max(abs(m_f32), 1e-9)

# smoothed-curve max relative deviation (window 20)
k = np.ones(20) / 20.0
s_f32 = np.convolve(l_f32, k, mode='valid')
s_b16 = np.convolve(l_b16, k, mode='valid')
curve_dev = float(np.max(np.abs(s_b16 - s_f32) / np.maximum(np.abs(s_f32),
                                                            1e-9)))

print('trailing-%d mean: f32 %.5f  bf16 %.5f  rel drift %.4f  (gate 1e-2)'
      % (tail, m_f32, m_b16, drift), flush=True)
print('smoothed-curve max rel deviation: %.4f' % curve_dev, flush=True)
print('PASS' if drift <= 1e-2 else 'FAIL (drift > 1e-2)', flush=True)
