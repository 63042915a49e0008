"""GAN step ledger: where the 72.3 ms goes, at MFU granularity.

VERDICT r4 #4's alternative done-condition: a committed probe table showing
where the adversarial step's time physically goes, with a FLOP/utilization
denominator per component instead of raw milliseconds.

Components are timed at the exact bench config (fused defaults: NTC v2
generator, measured MSD backend table, XLA MPD, batch 16 x 8192 samples;
discriminators see the concat([real, fake]) batch of 32) with the slope
method (cancels tunnel dispatch RTT), and each component's FLOPs come from
its own compiled program's cost_analysis(). MFU denominator: v5e bf16 peak
197 TFLOP/s (f32-HIGHEST components execute 3-6 MXU passes per logical
FLOP, so their ceiling against the bf16 peak is 1/3-1/6 by construction).

Reference anchor for the step being decomposed:
/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:96-147 (generator)
trained adversarially with MPD+MSD critics per the HiFi-GAN objective.
"""
import os
import sys
import json
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
import optax
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()

from timing import slope_timeit
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators as disc
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401
from pytorch_sound_tpu.ops import mel as mel_ops
from pytorch_sound_tpu.examples.hifi_gan import MEL_KW

B = int(os.environ.get('LEDGER_B', '16'))
T = int(os.environ.get('LEDGER_T', '8192'))
PEAK = 197e12

rng = np.random.default_rng(7)
wav16 = jax.device_put(
    rng.standard_normal((B, 1, T)).astype(np.float32) * 0.1)
wav32 = jax.device_put(
    rng.standard_normal((2 * B, 1, T)).astype(np.float32) * 0.1)

gen = build_model('hifi_gan_v2', extra_kwargs=dict(data_format='NTC'))
mpd = disc.MultiPeriodDiscriminator()
msd = disc.MultiScaleDiscriminator(n_scales=3, width=1.0)

mel16 = jax.jit(
    lambda w: mel_ops.hifigan_mel_spectrogram(w[:, 0], **MEL_KW))(wav16)
r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 3)
pg = jax.jit(gen.init)(r1, mel16)
pm = jax.jit(mpd.init)(r2, wav16)
ps = jax.jit(msd.init)(r3, wav16)
jax.block_until_ready((pg, pm, ps))
print('params ready', flush=True)


def tree_sum(t):
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(t))


def chain(c, s):
    # keep a data dependence on s so the loop body cannot be hoisted/DCE'd
    return jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(1e-20 * s, a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, c)


def disc_out_sum(outs):
    return sum(jnp.sum(sc) + sum(jnp.sum(f) for f in feats)
               for sc, feats in outs)


# -- component definitions: fn(carry) -> (carry', scalar) -------------------

def c_mel(w):
    s = tree_sum(mel_ops.hifigan_mel_spectrogram(w[:, 0], **MEL_KW))
    return chain(w, s), s


def c_gen_fwd(m):
    s = jnp.sum(gen.apply(pg, m))
    return chain(m, s), s


def c_gen_fwd_bwd(m):
    g = jax.grad(lambda p: jnp.sum(gen.apply(p, m)))(pg)
    s = tree_sum(g)
    return chain(m, s), s


def make_disc_fwd(mod, params):
    def f(w):
        s = disc_out_sum(mod.apply(params, w))
        return chain(w, s), s
    return f


def make_disc_fwd_bwd(mod, params):
    # grads wrt params AND input = the disc-phase cost (dw + dx through
    # the concat pass; dx w.r.t. the fake half feeds nothing in the real
    # step but XLA computes the same conv-transpose data grads)
    def f(w):
        gp, gx = jax.grad(
            lambda p, x: disc_out_sum(mod.apply(p, x)), argnums=(0, 1)
        )(params, w)
        s = tree_sum(gp) + jnp.sum(gx)
        return chain(w, s), s
    return f


def make_disc_fwd_dx(mod, params):
    # gen-phase fake branch: fwd + data-grad only (no dw)
    def f(w):
        gx = jax.grad(
            lambda x: disc_out_sum(mod.apply(params, x)))(w)
        s = jnp.sum(gx)
        return chain(w, s), s
    return f


adamw = optax.adamw(2e-4, b1=0.8, b2=0.99)
opt_disc_state = adamw.init({'mpd': pm, 'msd': ps})
opt_gen_state = adamw.init(pg)


def _opt_step(carry):
    g, st, p = carry
    up, st2 = adamw.update(g, st, p)
    p2 = optax.apply_updates(p, up)
    # scalar must cover params AND optimizer state, or the one-shot flops
    # lowering DCEs every per-leaf update that doesn't feed the first leaf
    s = tree_sum(p2) + tree_sum(st2)
    return (g, st2, p2), s


c_opt_disc = _opt_step
c_opt_gen = _opt_step


disc_params = {'mpd': pm, 'msd': ps}
disc_grads = jax.tree_util.tree_map(lambda a: a * 1e-3, disc_params)
gen_grads = jax.tree_util.tree_map(lambda a: a * 1e-3, pg)

COMPONENTS = [
    # (name, fn, carry0, n1, n2)
    ('mel_b16', c_mel, wav16, 40, 240),
    ('gen_fwd_b16', c_gen_fwd, mel16, 20, 120),
    ('gen_fwd_bwd_b16', c_gen_fwd_bwd, mel16, 10, 60),
    ('mpd_fwd_b32', make_disc_fwd(mpd, pm), wav32, 20, 120),
    ('mpd_fwd_bwd_b32', make_disc_fwd_bwd(mpd, pm), wav32, 10, 60),
    ('mpd_fwd_dx_b16', make_disc_fwd_dx(mpd, pm), wav16, 20, 120),
    ('msd_fwd_b32', make_disc_fwd(msd, ps), wav32, 10, 60),
    ('msd_fwd_bwd_b32', make_disc_fwd_bwd(msd, ps), wav32, 6, 36),
    ('msd_fwd_dx_b16', make_disc_fwd_dx(msd, ps), wav16, 10, 60),
    ('adamw_disc_84M', c_opt_disc, (disc_grads, opt_disc_state, disc_params),
     10, 60),
    ('adamw_gen_0.93M', c_opt_gen, (gen_grads, opt_gen_state, pg), 20, 120),
]

which = set(sys.argv[1:])
rows = {}
for name, fn, carry0, n1, n2 in COMPONENTS:
    if which and name not in which:
        continue
    t0 = time.perf_counter()
    try:
        flops = None
        try:
            low = jax.jit(lambda c: fn(c)[1]).lower(carry0)
            ca = low.compile().cost_analysis()
            flops = float(ca.get('flops', 0.0)) or None
        except Exception as e:
            print('%s: cost_analysis failed: %r' % (name, e), flush=True)
        dt = slope_timeit(fn, carry0, n1=n1, n2=n2, trials=3)
        mfu = (flops / dt / PEAK) if flops else None
        rows[name] = {'ms': round(dt * 1e3, 3),
                      'flops': flops,
                      'tflops_per_sec': round(flops / dt / 1e12, 1)
                      if flops else None,
                      'mfu_bf16peak': round(mfu, 3) if mfu else None}
        print('%s: %.3f ms  flops=%s  mfu=%s  (wall %.0fs)'
              % (name, dt * 1e3,
                 ('%.3e' % flops) if flops else 'n/a',
                 ('%.3f' % mfu) if mfu else 'n/a',
                 time.perf_counter() - t0), flush=True)
    except Exception as e:
        rows[name] = {'error': repr(e)[:200]}
        print('%s: FAILED %r' % (name, e), flush=True)

print(json.dumps(rows, indent=1), flush=True)
