"""Dissect the GAN step: robust per-component fwd / fwd+bwd timings.

Each component is its own jit, timed with the spike-robust slope method, so
we can see exactly where the 145 ms goes (MSD vs MPD vs generator vs mel).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators  # noqa
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa
from pytorch_sound_tpu.ops import mel as mel_ops
from timing import slope_timeit

B, T = 32, 8192          # disc-phase effective batch (16 real + 16 fake)
rng = np.random.default_rng(11)
wav = jnp.asarray(rng.standard_normal((B, 1, T)) * 0.1, jnp.float32)

MEL_KW = dict(sampling_rate=22050, n_fft=1024, window_size=1024, hop_size=256,
              num_mels=80, fmin=0.0, fmax=8000.0)

def timed(name, f, x, grad=False):
    if grad:
        g = jax.grad(lambda p, xx: f(p, xx), argnums=1)
        run = lambda xx: g(None, xx)
    else:
        run = lambda xx: f(None, xx)
    def mk(c):
        x_, = c
        out = run(x_)
        s = jax.tree_util.tree_reduce(
            lambda a, b: a + b.mean(), jax.tree_util.tree_leaves(out),
            jnp.float32(0)) if grad else _scal(out)
        return (x_ * (1.0 + 1e-5 * jnp.tanh(s)),), s
    try:
        dt = slope_timeit(mk, (x,), n1=8, n2=24)
        print('%-28s %8.2f ms' % (name, dt * 1e3), flush=True)
    except Exception as e:
        print('%-28s FAILED %r' % (name, str(e)[:140]), flush=True)

def _scal(out):
    leaves = jax.tree_util.tree_leaves(out)
    s = jnp.float32(0)
    for l in leaves:
        s = s + l.mean()
    return s

msd = build_model('hifi_gan_msd_base')
mpd = build_model('hifi_gan_mpd_base')
msd_p = msd.init(jax.random.PRNGKey(0), wav[:2])
mpd_p = mpd.init(jax.random.PRNGKey(1), wav[:2])
gen = build_model('hifi_gan_v2')
mel0 = mel_ops.hifigan_mel_spectrogram(wav[:16, 0], **MEL_KW)
gen_p = gen.init(jax.random.PRNGKey(2), mel0)

timed('msd fwd (B=32)', lambda p, x: _scal(msd.apply(msd_p, x)), wav)
timed('msd fwd+bwd (B=32)',
      lambda p, x: _scal(msd.apply(msd_p, x)), wav, grad=True)
timed('mpd fwd (B=32)', lambda p, x: _scal(mpd.apply(mpd_p, x)), wav)
timed('mpd fwd+bwd (B=32)',
      lambda p, x: _scal(mpd.apply(mpd_p, x)), wav, grad=True)
# MPD with every layer on the Pallas dense path (new planner: 512-lane out
# tiles + batch-fold over the period-folded rows)
import pytorch_sound_tpu.models.vocoders.discriminators as _disc
mpd_k = _disc.MultiPeriodDiscriminator(
    periods=(2, 3, 5, 7, 11), backends=('auto',) * 6)
timed('mpd all-auto fwd (B=32)', lambda p, x: _scal(mpd_k.apply(mpd_p, x)),
      wav)
timed('mpd all-auto fwd+bwd (B=32)',
      lambda p, x: _scal(mpd_k.apply(mpd_p, x)), wav, grad=True)
timed('gen fwd (B=16)', lambda p, m: gen.apply(gen_p, m).mean(), mel0)
timed('gen fwd+bwd (B=16)',
      lambda p, m: gen.apply(gen_p, m).mean(), mel0, grad=True)
gen_ntc = build_model('hifi_gan_v2', extra_kwargs=dict(data_format='NTC'))
genn_p = gen_ntc.init(jax.random.PRNGKey(2), mel0)
timed('gen NTC fwd (B=16)',
      lambda p, m: gen_ntc.apply(genn_p, m).mean(), mel0)
timed('gen NTC fwd+bwd (B=16)',
      lambda p, m: gen_ntc.apply(genn_p, m).mean(), mel0, grad=True)
timed('mel (B=16)',
      lambda p, x: mel_ops.hifigan_mel_spectrogram(x, **MEL_KW).mean(),
      wav[:16, 0])
