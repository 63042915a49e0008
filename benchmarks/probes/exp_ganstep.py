"""Per-PHASE timing of the split GAN step: where do the 145 ms go?

ganprof measured components (grad w.r.t. INPUT only — no dw); knobs measured
the raw MSD stack fwd+dx+dw. Summing them predicts ~90-95 ms/step at B=16,
but the recorded step is ~145 ms (6.91 steps/s). This probe times the two
jitted phases of the ACTUAL trainer step separately (python-loop chained
slope: each call consumes the previous call's updated params, so content is
unique and tunnel dedup/RTT cancel in the slope).

Env: MSD_PALLAS (default 0 = all-XLA per the kvar decision), MPD_PALLAS,
GEN_FMT. Prints: disc-phase ms, gen-phase ms, full-step ms, steps/s.
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

SMALL = int(os.environ.get('SMALL', '0'))   # 1 = tiny-CPU smoke of the probe
BATCH, T = (2, 2048) if SMALL else (16, 8192)
GEN_FMT = os.environ.get('GEN_FMT', 'NTC')
# MSD_MASK: 'default' = the ScaleDiscriminator default (measured table);
# 'xla' = all-XLA; an integer N = first-N layers forced onto the kernel
MSD_MASK = os.environ.get('MSD_MASK', 'default')
MPD_PALLAS = int(os.environ.get('MPD_PALLAS', '0'))
if MSD_MASK == 'default':
    mask = tuple(disc.ScaleDiscriminator.backends)
elif MSD_MASK == 'xla':
    mask = ('xla',) * 8
else:
    n = int(MSD_MASK)
    mask = ('pallas',) * n + ('xla',) * (8 - n)

if SMALL:
    gen = build_model('hifi_gan_v3',
                      extra_kwargs=dict(data_format=GEN_FMT,
                                        upsample_initial_channel=32))
    mpd = build_model('hifi_gan_mpd_small')
    msd = disc.MultiScaleDiscriminator(n_scales=2, width=0.0625,
                                       backends=mask)
else:
    gen = build_model('hifi_gan_v2', extra_kwargs=dict(data_format=GEN_FMT))
    mpd = (disc.MultiPeriodDiscriminator(backends=('pallas',) * 6)
           if MPD_PALLAS else build_model('hifi_gan_mpd_base'))
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
wav = jax.device_put(rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1)
device_batch = [wav]
trainer._ensure_initialized(device_batch)
step_fn = trainer._get_train_step()

t0 = time.perf_counter()
params, opt, loss, _ = step_fn(trainer.params, trainer.opt_state,
                               device_batch, is_logging=False)
jax.block_until_ready(loss)
print('first full step (compile both phases): %.1f s  loss=%.4f'
      % (time.perf_counter() - t0, float(loss)), flush=True)

disc_jit, gen_jit = trainer._disc_step_jit, trainer._gen_step_jit


def chain_slope(run_one, state, n1=6, n2=18, trials=3):
    """run_one(state) -> (state', scalar_loss); python-loop chained slope."""
    def run_n(state, n):
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = run_one(state)
        l = float(loss)    # host sync ends the chain
        return time.perf_counter() - t0, state, l

    _, state, _ = run_n(state, 2)   # warmup
    t1s, t2s = [], []
    for _ in range(trials):
        t1, state, _ = run_n(state, n1)
        t2, state, l = run_n(state, n2)
        t1s.append(t1)
        t2s.append(t2)
    slopes = [(b - a) / (n2 - n1) for a, b in zip(t1s, t2s) if b > a]
    dt = float(np.median(slopes)) if slopes else min(t2s) / n2
    return dt, state


def copy_tree(t):
    # the phase jits donate their param/opt args; every timing section works
    # on its own device copies so `params`/`opt` stay valid throughout
    return jax.tree_util.tree_map(lambda a: a.copy(), t)


# --- disc phase alone (donated args threaded through the chain) -----------
def disc_one(state):
    dp, dopt = state
    dp, dopt, d_loss, _ = disc_jit(dp, dopt, params['gen'], wav)
    return (dp, dopt), d_loss

disc_params = copy_tree({'mpd': params['mpd'], 'msd': params['msd']})
disc_opt = copy_tree({'mpd': opt['mpd'], 'msd': opt['msd']})
dt_disc, (disc_params, disc_opt) = chain_slope(disc_one,
                                               (disc_params, disc_opt))
print('disc phase: %8.2f ms' % (dt_disc * 1e3), flush=True)

# --- gen phase alone -------------------------------------------------------
_, _, d_loss0, mel_real = disc_jit(
    copy_tree(disc_params), copy_tree(disc_opt), params['gen'], wav)


def gen_one(state):
    gp, gopt = state
    gp, gopt, g_loss, _ = gen_jit(gp, gopt, disc_params, wav, mel_real,
                                  d_loss0, is_logging=False)
    return (gp, gopt), g_loss

dt_gen, _ = chain_slope(gen_one,
                        (copy_tree(params['gen']), copy_tree(opt['gen'])))
print('gen phase:  %8.2f ms' % (dt_gen * 1e3), flush=True)

# --- full step -------------------------------------------------------------
def full_one(state):
    p, o = state
    p, o, loss, _ = step_fn(p, o, device_batch, is_logging=False)
    return (p, o), loss

dt_full, _ = chain_slope(full_one, (params, opt))
print('full step:  %8.2f ms -> %.2f steps/s   (disc+gen sum %.2f ms)'
      % (dt_full * 1e3, 1.0 / dt_full, (dt_disc + dt_gen) * 1e3), flush=True)
