"""Blockwise (flash-style) attention that never materializes the (T, T) map.

New capability vs the reference (SURVEY.md §2.2): the reference's attention is
a full bmm materializing (T x T)
(`/root/reference/pytorch_sound/models/modules.py:62-79`), with sequence
length controlled purely data-side. This op computes the same softmax
attention with an **online-softmax scan over key blocks** — peak memory
O(T x block) instead of O(T^2) — so long spectrogram sequences fit in HBM.
``lax.scan`` keeps it a single compiled loop; XLA pipelines the blocks.

For multi-chip sequence parallelism, shard the key/value sequence axis over a
mesh axis and wrap the call in ``shard_map``; the per-device partial
(acc, max, denom) triples combine associatively (see
``combine_attention_partials``), which is exactly the ring-attention reduction.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def blockwise_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        mask: Optional[jnp.ndarray] = None,
                        block_size: int = 256,
                        backend: str = 'auto',
                        precision: str = 'bf16x3',
                        autotune_block: bool = True) -> jnp.ndarray:
    """Softmax attention over key blocks with online renormalization.

    :param q: queries (N, H, Tq, D)
    :param k: keys    (N, H, Tk, D)
    :param v: values  (N, H, Tk, D)
    :param mask: optional (N, Tk) boolean, True = key masked out
    :param block_size: key-block length (rounded up by padding). NOTE: with
        ``autotune_block=True`` (default) the pallas backend widens KV blocks
        to >= 512 (measured much faster: fewer online-softmax rescale rounds,
        full MXU tiles) — short sequences are padded up to that width. Pass
        ``autotune_block=False`` to honor ``block_size`` exactly (e.g. for
        VMEM headroom on very wide heads).
    :param backend: 'pallas' (compiled flash kernel), 'lax' (scan), or 'auto'
        (pallas on TPU — measured 1.65x faster than the scan at T=4096)
    :param precision: contraction precision — 'bf16x3' (default; pallas
        backend runs 3-pass hi/lo bf16 splits: measured on-chip 5e-6 fwd /
        2e-5 grad error vs the dense HIGHEST path — same grad error as
        'highest' — while beating dense end-to-end), 'highest' (6-pass f32),
        or 'default' (single-pass bf16 MXU, fastest, ~3e-3 error). The lax
        backend treats 'bf16x3' as f32-HIGHEST.
    :param autotune_block: when True (default) the pallas backend IGNORES
        ``block_size`` and uses the measured-winner tiles (512, 1024), clamped
        to the padded sequence length (see above); set False to honor
        ``block_size`` exactly (e.g. to bound VMEM). The lax backend always
        honors ``block_size`` exactly.
    :return: (N, H, Tq, D) attention output
    """
    if backend == 'auto':
        backend = 'pallas' if jax.default_backend() == 'tpu' else 'lax'
    if backend == 'pallas':
        # trainable variant: Pallas forward AND backward kernels (custom_vjp).
        from pytorch_sound_tpu.ops.pallas.flash_attention import (
            flash_attention_trainable)
        key_valid = None if mask is None else (~mask).astype(jnp.float32)
        if autotune_block:
            # measured on v5e (benchmarks/probes/results/flash_sweep.log,
            # 2026-08-19, fwd+bwd T=4096): (128,512) 34.0 ms, (256,1024)
            # 24.2 ms, (512,1024) 22.3 ms vs dense 35.8 ms — bigger tiles
            # amortize the per-visit grid cost; (512,2048) exceeds the
            # compile VMEM budget. Clamp to the padded sequence so short
            # inputs don't pay tile padding.
            def _ru128(v):
                return -(-v // 128) * 128
            block_q = min(512, _ru128(q.shape[2]))
            block_kv = min(1024, max(512, _ru128(k.shape[2])))
        else:
            block_q = block_kv = block_size
        return flash_attention_trainable(q, k, v, key_valid,
                                         block_q, block_kv,
                                         None, precision)
    n, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    prec = (jax.lax.Precision.DEFAULT if precision == 'default'
            else jax.lax.Precision.HIGHEST)

    pad = (-tk) % block_size
    if pad:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pad), (0, 0)])
    key_valid = jnp.arange(tk + pad) < tk                       # (Tk+pad,)
    if mask is not None:
        key_valid = key_valid[None, :] & ~jnp.pad(mask, [(0, 0), (0, pad)],
                                                  constant_values=True)
    else:
        key_valid = jnp.broadcast_to(key_valid[None, :], (n, tk + pad))

    acc, _, denom = _blockwise_scan_partials(q, k, v, key_valid, block_size,
                                             scale, prec)
    return acc / jnp.maximum(denom, 1e-30)


def _blockwise_scan_partials(q, k, v, key_valid, block_size, scale, prec):
    """(acc, m, denom) online-softmax partials of q against key blocks.

    k/v must already be padded to a block multiple; ``key_valid`` is the
    (N, Tk_pad) validity mask. Peak memory is O(Tq x block_size)."""
    n, h, tq, d = q.shape
    tk_pad = k.shape[2]
    n_blocks = tk_pad // block_size
    k_blocks = k.reshape(n, h, n_blocks, block_size, d).transpose(2, 0, 1, 3, 4)
    v_blocks = v.reshape(n, h, n_blocks, block_size, d).transpose(2, 0, 1, 3, 4)
    valid_blocks = key_valid.reshape(n, n_blocks, block_size).transpose(1, 0, 2)

    def step(carry, xs):
        acc, m, denom = carry
        kb, vb, validb = xs                                      # (N,H,B,D) ...
        s = jnp.einsum('nhqd,nhbd->nhqb', q, kb,
                       precision=prec) * scale
        s = jnp.where(validb[:, None, None, :], s, NEG_INF)

        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))    # (N,H,Tq,1)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        acc = acc * alpha + jnp.einsum('nhqb,nhbd->nhqd', p, vb,
                                       precision=prec)
        denom = denom * alpha + p.sum(axis=-1, keepdims=True)
        return (acc, m_new, denom), None

    init = (jnp.zeros((n, h, tq, d), q.dtype),
            jnp.full((n, h, tq, 1), NEG_INF, q.dtype),
            jnp.zeros((n, h, tq, 1), q.dtype))
    (acc, m, denom), _ = jax.lax.scan(
        step, init, (k_blocks, v_blocks, valid_blocks))
    return acc, m, denom


def blockwise_attention_partials(q: jnp.ndarray, k: jnp.ndarray,
                                 v: jnp.ndarray, *, block_size: int = 512,
                                 scale: Optional[float] = None,
                                 precision: str = 'highest'):
    """(acc, m, denom) partials of q against this k/v shard in O(Tq x block)
    memory — the ring-attention local step (`parallel/ring_attention.py`)
    without materializing the (Tq, Tk) score matrix."""
    n, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    prec = (jax.lax.Precision.DEFAULT if precision == 'default'
            else jax.lax.Precision.HIGHEST)
    pad = (-tk) % block_size
    if pad:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pad), (0, 0)])
    key_valid = jnp.broadcast_to((jnp.arange(tk + pad) < tk)[None, :],
                                 (n, tk + pad))
    return _blockwise_scan_partials(q, k, v, key_valid, block_size, scale,
                                    prec)


def combine_attention_partials(a: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                               b: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]):
    """Associatively merge two (acc, max, denom) attention partials — the
    cross-device reduction for sequence-sharded (ring) attention."""
    acc_a, m_a, d_a = a
    acc_b, m_b, d_b = b
    m = jnp.maximum(m_a, m_b)
    wa = jnp.exp(m_a - m)
    wb = jnp.exp(m_b - m)
    return acc_a * wa + acc_b * wb, m, d_a * wa + d_b * wb
