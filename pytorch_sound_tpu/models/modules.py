"""NN building blocks: multi-head self-attention, pointwise FFN, positional encoding.

API/semantic parity target: `/root/reference/pytorch_sound/models/modules.py`
(channel-first (N, C, T) interface, post-residual LayerNorm-over-channels,
softmax over the key axis, mask-fill semantics).

TPU-first notes: projections are dense matmuls on (N, T, C) internally (MXU);
attention is computed per-head with einsum instead of the reference's
fold-heads-into-batch bmm trick — same math, better XLA fusion.  Long
sequences auto-dispatch to a blockwise (flash-style) path (``block_size`` /
``auto_threshold`` on :class:`MultiHeadAttention`).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    """Self-attention returning (output (N, C, T), attention weights).

    Matches the reference contract: qkv from a bias-free 1x1 conv, scaled dot
    product with 1/sqrt(head_dim), softmax over keys, optional (N, T) boolean
    mask (True = masked out), residual + LayerNorm over channels.
    """

    hidden_dim: int
    heads: int
    dropout_rate: float = 0.0
    # 0 (default): AUTO — dense below ``auto_threshold`` frames, blockwise
    #   (flash-style, O(T*block) memory) at/above it. >0: always blockwise
    #   with that key-block size. <0: always dense (the reference's O(T^2)
    #   bmm semantics, which fails to even compile at T=8192 on v5e).
    block_size: int = 0
    # measured crossover (flash_sweep, v5e 2026-08: bf16x3 flash 1.7x dense
    # at T=4096 fwd+bwd; dense OOMs the compiler at T=8192). Note the
    # blockwise path returns att=None (the (T, T) map never exists).
    auto_threshold: int = 4096

    @nn.compact
    def __call__(self, input: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n, c, t = input.shape
        assert c == self.hidden_dim
        head_dim = c // self.heads

        x = input.swapaxes(1, 2)                                   # (N, T, C)
        kvq = nn.Dense(3 * c, use_bias=False, name='linear_kvq')(x)
        k, v, q = jnp.split(kvq, 3, axis=-1)
        # (N, T, H, D)
        k = k.reshape(n, t, self.heads, head_dim)
        v = v.reshape(n, t, self.heads, head_dim)
        q = q.reshape(n, t, self.heads, head_dim)

        use_blockwise = (self.block_size > 0 or
                         (self.block_size == 0 and t >= self.auto_threshold))
        if use_blockwise:
            from pytorch_sound_tpu.ops.attention import blockwise_attention
            out = blockwise_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mask=mask,
                block_size=self.block_size if self.block_size > 0 else 512)
            # out: (N, H, T, D)
            if mask is not None:
                out = jnp.where(mask[:, None, :, None], 0.0, out)
            out = out.transpose(0, 2, 1, 3).reshape(n, t, c)
            att = None   # the (T, T) map is never materialized on this path
        else:
            att = jnp.einsum('nkhd,nqhd->nhkq', k, q) / (head_dim ** 0.5)
            if mask is not None:
                # mask (N, T): True -> masked; applied along the key axis
                att = jnp.where(mask[:, None, :, None], -jnp.inf, att)
            att = nn.softmax(att, axis=2)                          # over keys
            if mask is not None:
                att = jnp.where(mask[:, None, None, :], 0.0, att)  # zero masked queries
            out = jnp.einsum('nkhd,nhkq->nqhd', v, att).reshape(n, t, c)
        out = nn.Dense(c, use_bias=False, name='linear')(out)
        if 0 < self.dropout_rate < 1:
            out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)

        out = nn.LayerNorm(name='layernorm')(out + x)              # add & norm (over C)
        # fold heads back to the reference's (N*?, T, T)-style map: (N, H, Tk, Tq)
        return out.swapaxes(1, 2), att


class PointwiseFeedForward(nn.Module):
    """1x1-conv FFN with 4x expansion, residual + LayerNorm + ReLU
    (reference `modules.py:82-116`); (N, C, T) interface."""

    hidden_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, input: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = input.swapaxes(1, 2)                                   # (N, T, C)
        h = nn.Dense(self.hidden_dim * 4, name='ff1')(x)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, name='ff2')(h)
        if 0 < self.dropout_rate < 1:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.LayerNorm(name='layernorm')(h + x)
        return nn.relu(h).swapaxes(1, 2)


class PositionalEncoding(nn.Module):
    """Sinusoidal positional encoding added channel-wise on (N, C, T)
    (reference `modules.py:119-145`): input scaled by sqrt(dim) + PE table."""

    dim: int
    max_seq_len: int

    def setup(self):
        self.pe = jnp.asarray(self.get_embedding(self.max_seq_len, self.dim).T[None])

    @staticmethod
    def get_embedding(num_embeddings: int, embedding_dim: int) -> jnp.ndarray:
        import numpy as np
        inv = 10000 ** (2 * (np.arange(embedding_dim) // 2) / embedding_dim)
        table = np.arange(num_embeddings)[:, None] / inv[None, :]
        table[:, 0::2] = np.sin(table[:, 0::2])
        table[:, 1::2] = np.cos(table[:, 1::2])
        return jnp.asarray(table, dtype=jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x * (self.dim ** 0.5)
        seq_len = x.shape[-1]
        return x + self.pe[..., :seq_len]
