"""Flash attention: block-size sweep at T=4096 + long-T (8k/16k) evidence.

Usage: python exp_flash.py sweep   — block_q/kv sweep at T=4096 bf16x3
       python exp_flash.py long    — flash at T=8192/16384 + dense attempt
"""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
from pytorch_sound_tpu.ops.pallas.flash_attention import (
    flash_attention_trainable)
from timing import slope_timeit

N, H, D = 4, 8, 64

def make_qkv(t, seed=5):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((N, H, t, D)), jnp.float32)
                 for _ in range(3))

def loss_of(f):
    return lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v)))

def dense(q, k, v):
    s = jnp.einsum('nhqd,nhkd->nhqk', q, k,
                   precision=jax.lax.Precision.HIGHEST) / (D ** 0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('nhqk,nhkd->nhqd', p, v,
                      precision=jax.lax.Precision.HIGHEST)

def time_fwd_bwd(f, t, n1=6, n2=30):
    q, k, v = make_qkv(t)
    vg = jax.value_and_grad(loss_of(f), argnums=(0, 1, 2))
    def mk(c):
        qq, = c
        val, (dq, dk, dv) = vg(qq, k, v)
        return (qq * (1.0 + 1e-5 * jnp.tanh(val)) + 1e-6 * dq,), \
            val + jnp.sum(dk[..., 0, 0]) + jnp.sum(dv[..., 0, 0])
    return slope_timeit(mk, (q,), n1=n1, n2=n2)

mode = sys.argv[1] if len(sys.argv) > 1 else 'sweep'

if mode == 'sweep':
    T = 4096
    # dense baseline first
    dt = time_fwd_bwd(dense, T)
    print('dense T=%d: %.2f ms' % (T, dt * 1e3), flush=True)
    for bq, bkv in [(128, 512), (256, 512), (256, 1024), (512, 1024),
                    (128, 1024), (512, 2048)]:
        def flash(q, k, v, bq=bq, bkv=bkv):
            return flash_attention_trainable(q, k, v, None, bq, bkv, False,
                                             'bf16x3')
        try:
            dt = time_fwd_bwd(flash, T)
            print('flash bq=%d bkv=%d: %.2f ms' % (bq, bkv, dt * 1e3),
                  flush=True)
        except Exception as e:
            print('flash bq=%d bkv=%d: FAIL %r' % (bq, bkv, str(e)[:120]),
                  flush=True)
else:
    for T in (8192, 16384):
        def flash(q, k, v):
            # (512, 1024): the sweep winner at T=4096 (see sweep mode)
            return flash_attention_trainable(q, k, v, None, 512, 1024, False,
                                             'bf16x3')
        dt = time_fwd_bwd(flash, T, n1=4, n2=12)
        print('flash T=%d: %.2f ms' % (T, dt * 1e3), flush=True)
        try:
            dt = time_fwd_bwd(dense, T, n1=2, n2=6)
            print('dense T=%d: %.2f ms' % (T, dt * 1e3), flush=True)
        except Exception as e:
            print('dense T=%d: FAILED %r' % (T, str(e)[:200]), flush=True)
