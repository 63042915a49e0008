"""Generator training-path A/B: conv backend x precision for the NTC v2
generator's fwd and fwd+bwd at the GAN bench config (B=16, T=8192).

Why: the round-5 GAN ledger (`results/ganledger.log`) shows the step's
discriminator components already run at 0.78-0.84 MFU of bf16 peak, while the
generator — ~GFLOPs of intrinsic work, every layer 8-128 channels — costs
5.9 ms fwd / 21.6 ms fwd+bwd of the 72.3 ms step. The generator is purely
HBM/dispatch-bound (activation traffic for all 78 convs is ~0.8 GB fwd ->
~1 ms at v5e bandwidth), so the lever is backend choice + activation width,
not MXU shaping. This probe times, per backend:

  pallas_f32 — the current 'auto' path (Pallas dense kernels, custom VJP)
  xla_f32    — backend='xla' end-to-end (XLA NTC convs, XLA AD; lets the
               compiler fuse leaky_relu/residual chains across layer edges)
  xla_bf16   — same with x/w/b cast to bf16 per conv (bf16 inter-layer
               activations in HBM; MXU accumulates f32 either way)

Reference anchor for the module being trained:
/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:96-147.
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
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()

from timing import slope_timeit
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401
from pytorch_sound_tpu.ops.pallas import grouped_conv as gc

B = int(os.environ.get('LEDGER_B', '16'))
T = int(os.environ.get('LEDGER_T', '8192'))
FRAMES = T // 256

rng = np.random.default_rng(7)
mel0 = jax.device_put(
    rng.standard_normal((B, 80, FRAMES)).astype(np.float32))

gen = build_model('hifi_gan_v2', extra_kwargs=dict(data_format='NTC'))
pg = jax.jit(gen.init)(jax.random.PRNGKey(0), mel0)
jax.block_until_ready(pg)
print('params ready', flush=True)

_orig_conv = gc.grouped_conv1d_ntc
_orig_convt = gc.conv_transpose1d_ntc


def _force(backend, bf16, convt_backend=None):
    convt_backend = backend if convt_backend is None else convt_backend

    def conv(x, w, b=None, **kw):
        kw['backend'] = backend
        if bf16:
            x, w = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
            b = None if b is None else b.astype(jnp.bfloat16)
        return _orig_conv(x, w, b, **kw)

    def convt(x, w, b=None, **kw):
        kw['backend'] = convt_backend
        if bf16:
            x, w = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
            b = None if b is None else b.astype(jnp.bfloat16)
        return _orig_convt(x, w, b, **kw)

    gc.grouped_conv1d_ntc = conv
    gc.conv_transpose1d_ntc = convt


def _restore():
    gc.grouped_conv1d_ntc = _orig_conv
    gc.conv_transpose1d_ntc = _orig_convt


def chain(c, s):
    return c * (1.0 + 1e-20 * s)


VARIANTS = [
    # (name, conv_backend, bf16, convt_backend)
    ('pallas_f32', 'auto', False, None),
    ('xla_f32', 'xla', False, None),
    ('xla_bf16', 'xla', True, None),
    # attribution: which of the two op families drives the XLA win
    ('xlaconv_pallasconvt_f32', 'xla', False, 'auto'),
    ('pallasconv_xlaconvt_f32', 'auto', False, 'xla'),
    # time-folded narrow convs (ops/fold_conv.py): ResBlock convs at
    # <= 32 channels run as 128-lane folded convs, rest XLA
    ('fold_f32', 'fold', False, 'xla'),
]

which = set(sys.argv[1:])
rows = {}
for name, backend, bf16, convt_backend in VARIANTS:
    if which and name not in which:
        continue
    _force(backend, bf16, convt_backend)
    try:
        def c_fwd(m):
            s = jnp.sum(gen.apply(pg, m).astype(jnp.float32))
            return chain(m, s), s

        def c_fwd_bwd(m):
            g = jax.grad(lambda p: jnp.sum(
                gen.apply(p, m).astype(jnp.float32)))(pg)
            s = sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(g))
            return chain(m, s), s

        for tag, fn, n1, n2 in [('fwd', c_fwd, 20, 120),
                                ('fwd_bwd', c_fwd_bwd, 10, 60)]:
            t0 = time.perf_counter()
            dt = slope_timeit(fn, mel0, n1=n1, n2=n2, trials=3)
            key = '%s_%s' % (name, tag)
            rows[key] = {'ms': round(dt * 1e3, 3)}
            print('%s: %.3f ms  (wall %.0fs)'
                  % (key, dt * 1e3, time.perf_counter() - t0), flush=True)
    except Exception as e:
        rows[name] = {'error': repr(e)[:200]}
        print('%s: FAILED %r' % (name, e), flush=True)
    finally:
        _restore()

print(json.dumps(rows, indent=1), flush=True)
