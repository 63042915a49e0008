"""Full-MSD-stack timing per grouped-conv executor knob combo.

Times msd.apply (fwd) and grad-wrt-params (fwd+dx+dw) at the GAN disc-phase
shape (B=32, T=8192) with backends all-'auto' (everything eligible rides the
Pallas kernel) for each (TAP_MODE, X_WIRE) combo, plus the all-XLA mask as
the baseline. The winner becomes the kernel default + informs the MSD mask.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
import pytorch_sound_tpu.models.vocoders.discriminators as disc
from timing import slope_timeit

B, T = 32, 8192
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.standard_normal((B, 1, T)).astype(np.float32) * 0.1)


def time_stack(backends, tap_mode, x_wire, cost='rate', fold='auto',
               exec_mode='grid'):
    gc.TAP_MODE, gc.X_WIRE = tap_mode, x_wire
    gc.COST_MODE, gc.BATCH_FOLD = cost, fold
    gc.EXEC_MODE = exec_mode
    msd = disc.MultiScaleDiscriminator(n_scales=3, width=1.0,
                                       backends=backends)
    params = msd.init(jax.random.PRNGKey(0), wav[:2])

    def fwd(x):
        outs = msd.apply(params, x)
        return sum(jnp.sum(s * s) for s, _ in outs) * 1e-6

    def mk_f(c):
        x, = c
        s = fwd(x)
        return (x * (1.0 + 1e-6 * jnp.tanh(s)),), s

    def loss(p, x):
        outs = msd.apply(p, x)
        l = 0.0
        for sc, feats in outs:
            l = l + jnp.mean((1.0 - sc) ** 2)
            for f in feats:
                l = l + 1e-3 * jnp.mean(jnp.abs(f))
        return l

    g = jax.grad(loss)

    def mk_b(c):
        x, = c
        gr = g(params, x)
        s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(gr)) * 1e-6
        return (x * (1.0 + 1e-6 * jnp.tanh(s)),), s

    tf = slope_timeit(mk_f, (wav,), n1=6, n2=18)
    tb = slope_timeit(mk_b, (wav,), n1=4, n2=12)
    return tf, tb



def parity_gate(tap_mode, x_wire, cost='rate', fold='auto',
                exec_mode='grid'):
    """Compiled parity of the kernel path vs the XLA mask on one batch."""
    gc.TAP_MODE, gc.X_WIRE = tap_mode, x_wire
    gc.COST_MODE, gc.BATCH_FOLD = cost, fold
    gc.EXEC_MODE = exec_mode
    small = wav[:4]
    msd_k = disc.MultiScaleDiscriminator(n_scales=3, width=1.0,
                                         backends=('auto',) * 8)
    msd_x = disc.MultiScaleDiscriminator(n_scales=3, width=1.0,
                                         backends=('xla',) * 8)
    params = msd_k.init(jax.random.PRNGKey(0), small)
    ok = True
    outs_k = msd_k.apply(params, small)
    outs_x = msd_x.apply(params, small)
    for (sk, fk), (sx, fx) in zip(outs_k, outs_x):
        rel = float(jnp.abs(sk - sx).max() / (jnp.abs(sx).max() + 1e-9))
        ok = ok and rel < 3e-2
    print('  parity(%s,%s): %s' % (tap_mode, x_wire,
                                   'ok' if ok else 'FAILED'), flush=True)
    return ok

# (backends, tap_mode, x_wire, cost_model, batch_fold, label)
COMBOS = [
    (('xla',) * 8, 'slice', 'f32', 'macs', 'never', 'all-XLA baseline'),
    (('auto',) * 8, 'slice', 'f32', 'macs', 'never', 'kernel r2 planner'),
    (('auto',) * 8, 'slice', 'f32', 'rate', 'auto', 'kernel rate+fold'),
    (('auto',) * 8, 'slice', 'f32', 'rate', 'never', 'kernel rate only'),
    (('auto',) * 8, 'slice', 'f32', 'macs', 'auto', 'kernel fold only'),
    (('auto',) * 8, 'rot8', 'bf16', 'rate', 'auto', 'rate+fold rot8+bf16'),
    (('auto',) * 8, 'rot8', 'bf16', 'macs', 'never', 'r2 rot8+bf16'),
    (('auto', 'auto') + ('xla',) * 6, 'rot8', 'bf16', 'rate', 'auto',
     'tuned mask rate+fold'),
    (('auto',) * 8, 'slice', 'f32', 'rate', 'auto', 'rate+fold PIPE', 'pipe'),
]
for combo in COMBOS:
    backends, tm, xw, cm, bf, label = combo[:6]
    em = combo[6] if len(combo) > 6 else 'grid'
    try:
        if 'auto' in backends and not parity_gate(tm, xw, cm, bf, em):
            print('%-24s SKIPPED (parity failed)' % label, flush=True)
            continue
        tf, tb = time_stack(backends, tm, xw, cm, bf, em)
        print('%-24s fwd %7.2f ms   fwd+dx+dw %7.2f ms' %
              (label, tf * 1e3, tb * 1e3), flush=True)
    except Exception as e:
        print('%-24s FAILED %r' % (label, str(e)[:140]), flush=True)
