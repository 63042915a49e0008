"""Flash-attention forward kernel (Pallas TPU).

O = softmax(Q K^T / sqrt(d)) V computed with online softmax over KV blocks —
the (T, T) score matrix only ever exists one (block_q, block_kv) tile at a
time in VMEM. Grid (batch*heads, q_blocks, kv_blocks) with the KV axis as the
sequential reduction; running (max, denom, acc) live in VMEM scratch across KV
steps, and the output tile is written once on the final step.

This is the compiled counterpart of
:func:`pytorch_sound_tpu.ops.attention.blockwise_attention` (the lax.scan
formulation); both produce identical results and that function dispatches here
on TPU via ``backend='auto'``.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, m_scr, l_scr, acc_scr,
            *, scale: float, kv_steps: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # (bq, d)
    k = k_ref[0]                                   # (bk, d)
    v = v_ref[0]                                   # (bk, d)
    valid = valid_ref[0]                           # (1, bk) float {0,1}

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(valid > 0.5, s, NEG_INF)         # broadcast over q rows

    m_prev = m_scr[...]                            # (bq, LANE) row-replicated
    m_cur = jnp.max(s, axis=1, keepdims=True)      # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

    alpha = jnp.exp(m_prev - m_new)                # (bq, LANE)
    p = jnp.exp(s - m_new[:, :1])                  # (bq, bk)

    l_scr[...] = l_scr[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha[:, :acc_scr.shape[-1]] + jnp.dot(
        p, v, preferred_element_type=jnp.float32)
    m_scr[...] = m_new

    @pl.when(j == kv_steps - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[...][:, :1], 1e-30)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    block_q: int = 128, block_kv: int = 128,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Softmax attention, (N, H, Tq, D) x (N, H, Tk, D) -> (N, H, Tq, D).

    :param mask: optional (N, Tk) boolean, True = key masked out.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d ** 0.5)

    d_pad = _round_up(d, LANE)
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, block_kv)

    def pad4(x, t_pad):
        return jnp.pad(x, [(0, 0), (0, 0), (0, t_pad - x.shape[2]),
                           (0, d_pad - d)]).reshape(n * h, t_pad, d_pad)

    qf = pad4(q, tq_pad)
    kf = pad4(k, tk_pad)
    vf = pad4(v, tk_pad)

    key_valid = (jnp.arange(tk_pad) < tk)[None, :]
    if mask is not None:
        key_valid = key_valid & ~jnp.pad(mask, [(0, 0), (0, tk_pad - tk)],
                                         constant_values=True)
    key_valid = jnp.broadcast_to(key_valid[:, None, :], (n, h, tk_pad))
    key_valid = key_valid.reshape(n * h, 1, tk_pad).astype(jnp.float32)

    kv_steps = tk_pad // block_kv
    kernel = functools.partial(_kernel, scale=scale, kv_steps=kv_steps)

    out = pl.pallas_call(
        kernel,
        grid=(n * h, tq_pad // block_q, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n * h, tq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running max
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running denom
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(qf, kf, vf, key_valid)

    return out.reshape(n, h, tq_pad, d_pad)[:, :, :tq, :d]
