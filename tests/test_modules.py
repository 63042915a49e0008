"""Tests for NN building blocks (attention, FFN, positional encoding)."""

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.models.modules import (MultiHeadAttention,
                                              PointwiseFeedForward,
                                              PositionalEncoding)


def test_mha_shapes_and_mask():
    m = MultiHeadAttention(hidden_dim=32, heads=4, dropout_rate=0.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 10)),
                    dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out, att = m.apply(params, x)
    assert out.shape == (2, 32, 10)
    assert att.shape == (2, 4, 10, 10)
    # softmax over keys sums to 1
    np.testing.assert_allclose(np.asarray(att.sum(axis=2)), 1.0, atol=1e-5)

    # masked positions get zero attention as queries and are excluded as keys
    mask = jnp.zeros((2, 10), dtype=bool).at[:, 7:].set(True)
    out_m, att_m = m.apply(params, x, mask)
    assert np.asarray(att_m)[:, :, 7:, :].max() == 0.0   # masked keys
    assert np.asarray(att_m)[:, :, :, 7:].max() == 0.0   # masked queries
    assert np.isfinite(np.asarray(out_m)).all()


def test_mha_auto_dispatches_blockwise_above_threshold():
    """block_size=0 (default) auto-selects the blockwise path once T reaches
    auto_threshold: same output as dense, att=None (no (T,T) map exists)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 64)), dtype=jnp.float32)
    mask = jnp.zeros((2, 64), dtype=bool).at[:, 50:].set(True)

    dense = MultiHeadAttention(hidden_dim=32, heads=4, block_size=-1)
    auto = MultiHeadAttention(hidden_dim=32, heads=4, auto_threshold=64)
    params = dense.init(jax.random.PRNGKey(0), x)

    out_d, att_d = dense.apply(params, x, mask)
    out_a, att_a = auto.apply(params, x, mask)     # T=64 >= threshold
    assert att_d is not None and att_a is None
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_d),
                               rtol=2e-5, atol=2e-5)

    # below the threshold, auto stays dense (att map returned)
    short = x[:, :, :32]
    _, att_s = auto.apply(params, short, mask[:, :32])
    assert att_s is not None and att_s.shape == (2, 4, 32, 32)


def test_ffn():
    m = PointwiseFeedForward(hidden_dim=16, dropout_rate=0.0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 16, 5)),
                    dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (3, 16, 5)
    assert (np.asarray(out) >= 0).all()   # final ReLU


def test_positional_encoding():
    m = PositionalEncoding(dim=8, max_seq_len=100)
    x = jnp.zeros((1, 8, 20))
    params = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(params, x))
    assert out.shape == (1, 8, 20)
    # with zero input, output is exactly the PE table: sin(0)=0, cos(0)=1 at t=0
    assert np.isclose(out[0, 0, 0], 0.0)
    assert np.isclose(out[0, 1, 0], 1.0)
    # PE values bounded
    assert np.abs(out).max() <= 1.0 + 1e-6
