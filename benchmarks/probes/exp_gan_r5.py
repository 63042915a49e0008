"""Round-5 GAN step A/B: folded MSD x bf16 critics, plus the v1-generator row.

At the round-4 best config (fused single-jit step, NTC generator, measured
MSD backend table, XLA MPD, batch 16 x 8192) this measures four variants:
  r4base  — round-4 defaults (f32 critics, per-scale MSD)     [14.04 st/s ref]
  folded  — MSD as one block-diagonal grouped stack (8 convs/pass vs 24)
  bf16    — both critics at compute_dtype='bf16' (f32 master params)
  both    — folded + bf16
and one architecture row:
  v1_both — hifi_gan_v1 generator (the reference's 14M-param flagship,
            /root/reference/pytorch_sound/models/vocoders/hifi_gan.py:153-176)
            with the winning critic config.

Each row records steps/s (slope method — cancels tunnel dispatch RTT),
compile seconds, the compiled step's cost_analysis() FLOPs, and MFU against
the v5e bf16 peak (197 TFLOP/s).
"""
import os
import sys
import time
import tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
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
V5E_BF16_PEAK = 197e12

rng = np.random.default_rng(4)
wav = jax.device_put(rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1)
device_batch = [wav]


def measure(name, arch, folded, cdt):
    gen = build_model(arch, extra_kwargs=dict(data_format='NTC'))
    mpd = disc.MultiPeriodDiscriminator(compute_dtype=cdt)
    msd = disc.MultiScaleDiscriminator(n_scales=3, width=1.0,
                                       compute_dtype=cdt)
    trainer = HiFiGANTrainer(
        gen, mpd, msd,
        optax.adamw(2e-4, b1=0.8, b2=0.99), optax.adamw(2e-4, b1=0.8, b2=0.99),
        None, None, max_step=1, valid_max_step=1, save_interval=10 ** 9,
        log_interval=10 ** 9, save_dir=tempfile.mkdtemp(prefix='bench_gan_'),
        save_prefix='bench', seed=0, split_step=False, msd_folded=folded)
    trainer._ensure_initialized(device_batch)
    step_fn = trainer._get_train_step()

    t0 = time.perf_counter()
    params, opt, loss, _ = step_fn(trainer.params, trainer.opt_state,
                                   device_batch, is_logging=False)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    print('%s: first step %.1f s, loss=%.4f' % (name, compile_s, float(loss)),
          flush=True)

    flops = None
    try:
        lowered = step_fn.lower(params, opt, device_batch, is_logging=False)
        flops = lowered.compile().cost_analysis().get('flops')
    except Exception as e:
        print('%s: cost_analysis failed: %r' % (name, e), flush=True)

    def run_n(params, opt, n):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt, loss, _ = step_fn(params, opt, device_batch,
                                           is_logging=False)
        l = float(loss)
        return time.perf_counter() - t0, params, opt, l

    _, params, opt, _ = run_n(params, opt, 2)
    t1s, t2s = [], []
    for _ in range(3):
        t1, params, opt, _ = run_n(params, opt, 6)
        t2, params, opt, l = run_n(params, opt, 18)
        t1s.append(t1)
        t2s.append(t2)
    slopes = [(b - a) / 12 for a, b in zip(t1s, t2s) if b > a]
    dt = float(np.median(slopes)) if slopes else min(t2s) / 18
    mfu = (flops / dt / V5E_BF16_PEAK) if flops else None
    print('%s: %.2f ms -> %.2f steps/s  flops=%s  mfu_bf16peak=%s  loss=%.4f'
          % (name, dt * 1e3, 1.0 / dt,
             ('%.3e' % flops) if flops else 'n/a',
             ('%.3f' % mfu) if mfu is not None else 'n/a', l), flush=True)
    return 1.0 / dt


which = sys.argv[1:] or ['r4base', 'folded', 'bf16', 'both', 'v1']
rows = {
    'r4base': ('hifi_gan_v2', False, None),
    'folded': ('hifi_gan_v2', True, None),
    'bf16': ('hifi_gan_v2', False, 'bf16'),
    'both': ('hifi_gan_v2', True, 'bf16'),
    'v1_both': ('hifi_gan_v1', True, 'bf16'),
    # v1 at the MEASURED winning critic config (f32 per-scale MSD): the
    # folded+bf16 combination SIGABRTs the XLA TPU compiler (fusion_util
    # TransformWindow check on bf16[16,8192,1] — see the round-2 log rows)
    'v1': ('hifi_gan_v1', False, None),
}
for name in which:
    arch, folded, cdt = rows[name]
    try:
        measure(name, arch, folded, cdt)
    except Exception as e:
        print('%s: FAILED %r' % (name, e), flush=True)
