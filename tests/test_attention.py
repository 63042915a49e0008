"""Blockwise attention tests: equivalence with dense softmax attention."""

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.models.modules import MultiHeadAttention
from pytorch_sound_tpu.ops.attention import (blockwise_attention,
                                             combine_attention_partials)


def _dense_attention(q, k, v, mask=None):
    d = q.shape[-1]
    s = jnp.einsum('nhqd,nhkd->nhqk', q, k) / (d ** 0.5)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('nhqk,nhkd->nhqd', p, v)


def _qkv(rng, n=2, h=4, t=100, d=16):
    return tuple(jnp.asarray(rng.standard_normal((n, h, t, d)),
                             dtype=jnp.float32) for _ in range(3))


def test_blockwise_matches_dense():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    out_b = blockwise_attention(q, k, v, block_size=32)
    out_d = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), atol=1e-5)


def test_blockwise_matches_dense_with_mask():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, t=77)   # non-multiple of block size
    mask = jnp.zeros((2, 77), dtype=bool).at[:, 60:].set(True)
    out_b = blockwise_attention(q, k, v, mask=mask, block_size=32)
    out_d = _dense_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), atol=1e-5)


def test_mha_blockwise_path_matches_dense_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 50)), dtype=jnp.float32)
    dense = MultiHeadAttention(hidden_dim=32, heads=4)
    blocky = MultiHeadAttention(hidden_dim=32, heads=4, block_size=16)
    params = dense.init(jax.random.PRNGKey(0), x)
    out_d, att = dense.apply(params, x)
    out_b, att_b = blocky.apply(params, x)
    assert att_b is None
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), atol=1e-5)


def test_combine_partials_is_consistent():
    """Splitting keys across two 'devices' and merging partials must equal
    full attention — the ring-attention reduction invariant."""
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, t=64)
    half = 32

    def partial_state(ks, vs):
        d = q.shape[-1]
        s = jnp.einsum('nhqd,nhkd->nhqk', q, ks) / (d ** 0.5)
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        return jnp.einsum('nhqk,nhkd->nhqd', p, vs), m, p.sum(-1, keepdims=True)

    a = partial_state(k[:, :, :half], v[:, :, :half])
    b = partial_state(k[:, :, half:], v[:, :, half:])
    acc, m, denom = combine_attention_partials(a, b)
    merged = acc / denom
    full = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full), atol=1e-5)


def test_flash_kernel_matches_dense():
    """The Pallas flash kernel (interpret mode on CPU) vs dense attention."""
    from pytorch_sound_tpu.ops.pallas.flash_attention import flash_attention
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, t=100, d=16)
    out_f = flash_attention(q, k, v, block_q=32, block_kv=32)
    out_d = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d), atol=1e-5)

    mask = jnp.zeros((2, 100), dtype=bool).at[:, 70:].set(True)
    out_fm = flash_attention(q, k, v, mask=mask, block_q=32, block_kv=32)
    out_dm = _dense_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out_fm), np.asarray(out_dm), atol=1e-5)


def test_blockwise_backend_dispatch():
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng, t=64, d=16)
    out_lax = blockwise_attention(q, k, v, block_size=32, backend='lax')
    out_pal = blockwise_attention(q, k, v, block_size=32, backend='pallas',
                                  precision='highest')
    np.testing.assert_allclose(np.asarray(out_lax), np.asarray(out_pal), atol=1e-5)


def test_flash_precision_modes():
    """The precision knob: 'highest' is exact-grade everywhere; 'bf16x3' is
    bounded loosely here because the CPU interpreter accumulates the hi/lo
    passes sloppily — measured on-chip it is 5e-6 fwd / 2e-5 grads
    (BENCH_DETAILS.json flash_attention_compiled)."""
    from pytorch_sound_tpu.ops.pallas.flash_attention import (
        flash_attention_trainable)
    rng = np.random.default_rng(11)
    q, k, v = _qkv(rng, t=96, d=16)
    ref = _dense_attention(q, k, v)
    hi = flash_attention_trainable(q, k, v, None, 32, 32, True, 'highest')
    b3 = flash_attention_trainable(q, k, v, None, 32, 32, True, 'bf16x3')
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ref), atol=1e-5)
    assert float(jnp.abs(b3 - ref).max()) < 5e-3
    # grads flow through every mode (custom_vjp plumbing)
    g = jax.grad(lambda q: jnp.sum(flash_attention_trainable(
        q, k, v, None, 32, 32, True, 'bf16x3') ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_flash_asymmetric_blocks():
    """Non-square block shapes (block_kv > block_q, and block_q > T) with
    ragged lengths — the geometry the tuned TPU defaults use (256/1024)."""
    from pytorch_sound_tpu.ops.pallas.flash_attention import (
        flash_attention_trainable)
    rng = np.random.default_rng(23)
    q, k, v = _qkv(rng, t=150, d=16)
    ref = _dense_attention(q, k, v)
    for bq, bkv in ((32, 128), (256, 64), (64, 256)):
        out = flash_attention_trainable(q, k, v, None, bq, bkv, True,
                                        'highest')
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        g = jax.grad(lambda q: jnp.sum(jnp.sin(flash_attention_trainable(
            q, k, v, None, bq, bkv, True, 'highest'))))(q)
        g_ref = jax.grad(lambda q: jnp.sum(jnp.sin(_dense_attention(
            q, k, v))))(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-4)


def test_ring_attention_matches_dense_on_mesh():
    """Exact sequence-parallel attention over the 8-device virtual mesh."""
    from pytorch_sound_tpu.parallel import make_mesh
    from pytorch_sound_tpu.parallel.ring_attention import ring_attention

    assert len(jax.devices()) == 8
    mesh = make_mesh(axis_names=('seq',))
    rng = np.random.default_rng(6)
    q, k, v = _qkv(rng, n=2, h=2, t=128, d=16)   # 16 timesteps per device
    out_r = ring_attention(q, k, v, mesh, axis='seq')
    assert len(out_r.sharding.device_set) == 8   # stays sequence-sharded
    out_d = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_d), atol=1e-5)

    # blockwise local partials (the long-shard O(T_local x block) path)
    # must produce the identical ring result
    out_b = ring_attention(q, k, v, mesh, axis='seq', local='blockwise')
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), atol=1e-5)


def test_blockwise_partials_match_dense_softmax():
    """blockwise_attention_partials' (acc, m, denom) normalize to exact
    attention and compose with combine_attention_partials across splits."""
    from pytorch_sound_tpu.ops.attention import (
        blockwise_attention_partials, combine_attention_partials)
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng, n=2, h=2, t=160, d=16)
    acc, m, denom = blockwise_attention_partials(q, k, v, block_size=64)
    out = acc / jnp.maximum(denom, 1e-30)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_dense_attention(q, k, v)),
                               atol=1e-5)
    # split keys in two shards, combine partials — same result
    pa = blockwise_attention_partials(q, k[:, :, :96], v[:, :, :96],
                                      block_size=32)
    pb = blockwise_attention_partials(q, k[:, :, 96:], v[:, :, 96:],
                                      block_size=32)
    acc2, _, denom2 = combine_attention_partials(pa, pb)
    out2 = acc2 / jnp.maximum(denom2, 1e-30)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)


def test_flash_backward_matches_dense_grads():
    """The Pallas backward kernels (custom_vjp) vs dense autodiff, incl. mask."""
    from pytorch_sound_tpu.ops.pallas.flash_attention import (
        flash_attention_trainable)
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, n=2, h=2, t=77, d=16)   # ragged length
    mask = jnp.zeros((2, 77), dtype=bool).at[:, 60:].set(True)
    key_valid = (~mask).astype(jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(
            flash_attention_trainable(q, k, v, key_valid, 32, 32)))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_dense_attention(q, k, v, mask=mask)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_blockwise_pallas_backend_is_differentiable():
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng, t=64, d=16)

    def loss(backend):
        return lambda q: jnp.sum(
            blockwise_attention(q, k, v, block_size=32, backend=backend,
                                precision='highest') ** 2)

    g_pal = jax.grad(loss('pallas'))(q)
    g_lax = jax.grad(loss('lax'))(q)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_lax), atol=1e-5)


def test_flash_kernel_wide_head_dim():
    """Head dims > 128 (d_pad = 256) must work — the alpha rescale slice was
    once capped at LANE=128 columns (ADVICE round 1)."""
    from pytorch_sound_tpu.ops.pallas.flash_attention import (
        flash_attention, flash_attention_trainable)
    rng = np.random.default_rng(9)
    q, k, v = _qkv(rng, n=1, h=2, t=96, d=160)
    out_f = flash_attention(q, k, v, block_q=32, block_kv=32)
    out_d = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d), atol=1e-4)

    g_f = jax.grad(lambda q: jnp.sum(
        flash_attention_trainable(q, k, v, None, 32, 32) ** 2))(q)
    g_d = jax.grad(lambda q: jnp.sum(_dense_attention(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_d), atol=1e-4)
