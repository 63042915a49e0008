"""Dense-expansion decision probe: xla grouped vs xla_dense per MSD geometry.

kvar measured L1 (g4: dense 2.2x) / L3 (g8: tie) / L5 (g8 short-T: grouped
7x). This fills in the unprobed rows (L2 g8 cg=16 wide-T, L4 g8 mid-T) and
re-times the FULL 3-scale MSD stack fwd+dx+dw at B=32 under the new 'auto'
table vs all-'xla', so the ScaleDiscriminator default mask decision is
end-to-end measured, not extrapolated.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
from timing import slope_timeit

SMALL = int(os.environ.get('SMALL', '0'))   # 1 = tiny-CPU smoke of the probe
B = 2 if SMALL else 32
_TS = 16 if SMALL else 1
# every grouped MSD layer geometry at scale-1 T (8192 in, downsampled by
# the preceding strides); scale 2/3 halve T again
GEOMS = [
    ('L1 128->128 k41 s2 g4 T8192', 128, 128, 41, 2, 4, 8192 // _TS),
    ('L2 128->256 k41 s2 g8 T4096', 128, 256, 41, 2, 8, 4096 // _TS),
    ('L3 256->512 k41 s4 g8 T2048', 256, 512, 41, 4, 8, 2048 // _TS),
    ('L4 512->1024 k41 s4 g8 T512', 512, 1024, 41, 4, 8, max(128, 512 // _TS)),
    ('L5 1024->1024 k41 s1 g8 T128', 1024, 1024, 41, 1, 8, 128),
]


def t_of(fn, *args):
    def mk(c):
        out = fn(*c)
        s = out.mean()
        return tuple(a * (1.0 + 1e-5 * jnp.tanh(s)) for a in c), s
    return slope_timeit(mk, args, n1=8, n2=24)


def t_of_grad(fn, *args):
    g = jax.grad(lambda xs: fn(*xs).mean(), argnums=0)

    def mk(c):
        outs = g(c)
        s = sum(o.mean() for o in outs)
        return tuple(a * (1.0 + 1e-5 * jnp.tanh(s)) for a in c), s
    return slope_timeit(mk, args, n1=8, n2=24)


for name, cin, cout, k, stride, groups, t_in in GEOMS:
    print('=== %s (B=%d)' % (name, B), flush=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, t_in, cin)), jnp.float32) * .1
    w = jnp.asarray(rng.standard_normal((cout, cin // groups, k)),
                    jnp.float32) * .05
    bias = jnp.zeros((cout,), jnp.float32)
    pad = (k - 1) // 2
    tflop = 2 * B * ((t_in + 2 * pad - k) // stride + 1) * cout \
        * (cin // groups) * k / 1e12
    for bk in ('xla', 'xla_dense'):
        fn = lambda a, ww, bk=bk: gc.grouped_conv1d_ntc(
            a, ww, bias, stride=stride, padding=pad, groups=groups,
            slope=0.1, backend=bk)
        try:
            dt = t_of(fn, x, w)
            dtg = t_of_grad(fn, x, w)
            print('  %-10s fwd %8.3f ms (%5.1f TF/s)   fwd+dx+dw %8.3f ms'
                  % (bk, dt * 1e3, tflop / dt, dtg * 1e3), flush=True)
        except Exception as e:
            print('  %-10s FAILED %r' % (bk, str(e)[:140]), flush=True)

# ---- full 3-scale MSD stack, new auto vs all-xla --------------------------
# (same timing structure as exp_knobs.time_stack, proven on this tunnel)
import pytorch_sound_tpu.models.vocoders.discriminators as disc

wav = jnp.asarray(
    np.random.default_rng(3).standard_normal((B, 1, 8192 // _TS)),
    jnp.float32) * 0.1
for label, mask in (('msd all-xla', ('xla',) * 8),
                    ('msd new-auto', ('auto',) * 8)):
    msd = disc.MultiScaleDiscriminator(n_scales=3, width=1.0, backends=mask)
    params = msd.init(jax.random.PRNGKey(0), wav[:2])

    def fwd(x, msd=msd, params=params):
        outs = msd.apply(params, x)
        return sum(jnp.sum(s * s) for s, _ in outs) * 1e-6

    def mk_f(c, fwd=fwd):
        x, = c
        s = fwd(x)
        return (x * (1.0 + 1e-6 * jnp.tanh(s)),), s

    def loss(p, x, msd=msd):
        outs = msd.apply(p, x)
        l = 0.0
        for sc, feats in outs:
            l = l + jnp.mean((1.0 - sc) ** 2)
            for f in feats:
                l = l + 1e-3 * jnp.mean(jnp.abs(f))
        return l

    g = jax.grad(loss)

    def mk_b(c, g=g, params=params):
        x, = c
        gr = g(params, x)
        s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(gr)) * 1e-6
        return (x * (1.0 + 1e-6 * jnp.tanh(s)),), s

    try:
        tf = slope_timeit(mk_f, (wav,), n1=6, n2=18)
        tb = slope_timeit(mk_b, (wav,), n1=4, n2=12)
        print('%-14s fwd %8.2f ms   fwd+dx+dw %8.2f ms' %
              (label, tf * 1e3, tb * 1e3), flush=True)
    except Exception as e:
        print('%-14s FAILED %r' % (label, str(e)[:140]), flush=True)
