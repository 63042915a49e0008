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


def _split_bf16(h):
    hi = h.astype(jnp.bfloat16)
    lo = (h - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, dims, precision: str):
    """dot_general honoring precision: 'highest' (6-pass f32), 'bf16x3'
    (3 single-pass bf16 contractions of hi/lo splits, ~1e-5 rel error), or
    'default' (single bf16 pass)."""
    kw = dict(preferred_element_type=jnp.float32)
    if precision == 'bf16x3':
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        return (jax.lax.dot_general(a_hi, b_hi, dims, **kw)
                + jax.lax.dot_general(a_lo, b_hi, dims, **kw)
                + jax.lax.dot_general(a_hi, b_lo, dims, **kw))
    prec = {'highest': jax.lax.Precision.HIGHEST,
            'default': jax.lax.Precision.DEFAULT}[precision]
    return jax.lax.dot_general(a, b, dims, precision=prec, **kw)


def _kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, m_scr, l_scr, acc_scr,
            *, scale: float, kv_steps: int, precision):
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

    s = _dot(q, k, (((1,), (1,)), ((), ())),
                                 precision) * scale
    s = jnp.where(valid > 0.5, s, NEG_INF)         # broadcast over q rows

    m_prev = m_scr[...]                            # (bq, LANE) row-replicated
    m_cur = jnp.max(s, axis=1, keepdims=True)      # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

    alpha = jnp.exp(m_prev - m_new)                # (bq, LANE)
    p = jnp.exp(s - m_new[:, :1])                  # (bq, bk)

    l_scr[...] = l_scr[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_scr.shape)
    # alpha columns are row-replicated; a (bq, 1) slice broadcasts to any d_pad
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + _dot(
        p, v, (((1,), (0,)), ((), ())), precision)
    m_scr[...] = m_new

    @pl.when(j == kv_steps - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[...][:, :1], 1e-30)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    block_q: int = 128, block_kv: int = 128,
                    interpret: Optional[bool] = None,
                    precision: str = 'highest') -> jnp.ndarray:
    """Softmax attention, (N, H, Tq, D) x (N, H, Tk, D) -> (N, H, Tq, D).

    :param mask: optional (N, Tk) boolean, True = key masked out.
    :param precision: 'highest' (f32 contractions, ~1e-6 parity vs the dense
        HIGHEST path) or 'default' (single-pass bf16 MXU, ~3e-3 error).
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
    kernel = functools.partial(_kernel, scale=scale, kv_steps=kv_steps,
                               precision=precision)

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


# ---------------------------------------------------------------------------
# Backward pass (custom VJP): separate dKV and dQ kernels, as in the
# production TPU flash implementations. Residuals are O and the per-row
# logsumexp; softmax tiles are recomputed as p = exp(s - lse).
# ---------------------------------------------------------------------------


def _fwd_res_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr, *, scale: float, kv_steps: int,
                    precision):
    """Forward kernel that also writes the logsumexp residual."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    valid = valid_ref[0]

    s = _dot(q, k, (((1,), (1,)), ((), ())),
                                 precision) * scale
    s = jnp.where(valid > 0.5, s, NEG_INF)

    m_prev = m_scr[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :1])

    l_scr[...] = l_scr[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + _dot(
        p, v, (((1,), (0,)), ((), ())), precision)
    m_scr[...] = m_new

    @pl.when(j == kv_steps - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0] = (acc_scr[...] / denom[:, :1]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(denom)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, valid_ref, do_ref, lse_ref, di_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, q_steps: int, precision):
    """Accumulate dK/dV for one KV block while scanning Q blocks."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    di = di_ref[0][:, :1]
    valid = valid_ref[0]

    s = _dot(q, k, (((1,), (1,)), ((), ())),
                                 precision) * scale
    s = jnp.where(valid > 0.5, s, NEG_INF)
    p = jnp.exp(s - lse)                                      # (bq, bk)

    dv_scr[...] += _dot(p, do, (((0,), (0,)), ((), ())),
                                            precision)
    dp = _dot(do, v, (((1,), (1,)), ((), ())),
                                  precision)
    ds = p * (dp - di) * scale
    dk_scr[...] += _dot(ds, q, (((0,), (0,)), ((), ())),
                                            precision)

    @pl.when(i == q_steps - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, valid_ref, do_ref, lse_ref, di_ref,
                   dq_ref, dq_scr, *, scale: float, kv_steps: int, precision):
    """Accumulate dQ for one Q block while scanning KV blocks."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    di = di_ref[0][:, :1]
    valid = valid_ref[0]

    s = _dot(q, k, (((1,), (1,)), ((), ())),
                                 precision) * scale
    s = jnp.where(valid > 0.5, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = _dot(do, v, (((1,), (1,)), ((), ())),
                                  precision)
    ds = p * (dp - di) * scale
    dq_scr[...] += _dot(ds, k, (((1,), (0,)), ((), ())), precision)

    @pl.when(j == kv_steps - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _pad_and_flatten(x, t_pad, d, d_pad):
    n, h = x.shape[:2]
    return jnp.pad(x, [(0, 0), (0, 0), (0, t_pad - x.shape[2]),
                       (0, d_pad - d)]).reshape(n * h, t_pad, d_pad)


def _key_valid_mask(mask, n, h, tk, tk_pad):
    key_valid = (jnp.arange(tk_pad) < tk)[None, :]
    if mask is not None:
        key_valid = key_valid & ~jnp.pad(mask, [(0, 0), (0, tk_pad - tk)],
                                         constant_values=True)
    key_valid = jnp.broadcast_to(key_valid[:, None, :], (n, h, tk_pad))
    return key_valid.reshape(n * h, 1, tk_pad).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention_trainable(q, k, v, key_valid_ext,
                              block_q: int = 128, block_kv: int = 128,
                              interpret: Optional[bool] = None,
                              precision: str = 'highest'):
    """Differentiable flash attention with Pallas forward AND backward kernels.

    ``key_valid_ext``: optional (N, Tk) float {0,1} validity (1 = attend);
    None = all valid. Same output as :func:`flash_attention`.
    """
    out, _ = _flash_fwd_impl(q, k, v, key_valid_ext, block_q, block_kv,
                             interpret, precision)
    return out


def _flash_fwd_impl(q, k, v, key_valid_ext, block_q, block_kv, interpret,
                    precision='highest'):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    d_pad = _round_up(d, LANE)
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, block_kv)

    qf = _pad_and_flatten(q, tq_pad, d, d_pad)
    kf = _pad_and_flatten(k, tk_pad, d, d_pad)
    vf = _pad_and_flatten(v, tk_pad, d, d_pad)
    mask = None if key_valid_ext is None else (key_valid_ext < 0.5)
    valid = _key_valid_mask(mask, n, h, tk, tk_pad)

    kv_steps = tk_pad // block_kv
    kernel = functools.partial(_fwd_res_kernel, scale=scale,
                               kv_steps=kv_steps, precision=precision)
    o, lse = pl.pallas_call(
        kernel,
        grid=(n * h, tq_pad // block_q, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANE), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * h, tq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((n * h, tq_pad, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(qf, kf, vf, valid)
    out = o.reshape(n, h, tq_pad, d_pad)[:, :, :tq, :d]
    return out, (qf, kf, vf, valid, o, lse)


def _flash_fwd_rule(q, k, v, key_valid_ext, block_q, block_kv, interpret,
                    precision):
    out, res = _flash_fwd_impl(q, k, v, key_valid_ext, block_q, block_kv,
                               interpret, precision)
    return out, (res, q.shape, k.shape)


def _flash_bwd_rule(block_q, block_kv, interpret, precision, saved, dout):
    (qf, kf, vf, valid, o, lse), q_shape, k_shape = saved
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, h, tq, d = q_shape
    tk = k_shape[2]
    scale = 1.0 / (d ** 0.5)
    d_pad = qf.shape[-1]
    tq_pad = qf.shape[1]
    tk_pad = kf.shape[1]

    dof = _pad_and_flatten(dout, tq_pad, d, d_pad)
    # di = rowsum(o * do), broadcast to lanes
    di = jnp.sum(o * dof, axis=-1, keepdims=True)
    di = jnp.broadcast_to(di, (n * h, tq_pad, LANE))

    q_steps = tq_pad // block_q
    kv_steps = tk_pad // block_kv

    dkv_kernel = functools.partial(_bwd_dkv_kernel, scale=scale,
                                   q_steps=q_steps, precision=precision)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(n * h, kv_steps, q_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0)),   # q
            pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0)),  # k
            pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0)),  # v
            pl.BlockSpec((1, 1, block_kv), lambda b, j, i: (b, 0, j)),      # valid
            pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0)),   # do
            pl.BlockSpec((1, block_q, LANE), lambda b, j, i: (b, i, 0)),    # lse
            pl.BlockSpec((1, block_q, LANE), lambda b, j, i: (b, i, 0)),    # di
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * h, tk_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((n * h, tk_pad, d_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(qf, kf, vf, valid, dof, lse, di)

    dq_kernel = functools.partial(_bwd_dq_kernel, scale=scale,
                                  kv_steps=kv_steps, precision=precision)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(n * h, tq_pad // block_q, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANE), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANE), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n * h, tq_pad, d_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(qf, kf, vf, valid, dof, lse, di)

    def unflatten(x, t, t_pad):
        return x.reshape(n, h, t_pad, d_pad)[:, :, :t, :d]

    return (unflatten(dq, tq, tq_pad).astype(jnp.float32),
            unflatten(dk, tk, tk_pad).astype(jnp.float32),
            unflatten(dv, tk, tk_pad).astype(jnp.float32),
            None)


flash_attention_trainable.defvjp(_flash_fwd_rule, _flash_bwd_rule)
