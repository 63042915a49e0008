"""Transformer-TTS acoustic model: text -> mel spectrogram.

Beyond-parity capability: the reference ships English/Korean text frontends
and a vocoder but no acoustic model connecting them. This is a compact
Transformer-TTS (arXiv 1809.08895 family): text encoder + autoregressive mel
decoder with causal self-attention and cross-attention, trained teacher-forced
(fully parallel on TPU) with masked L1 mel + stop-token losses. Paired with
``InterfaceHifiGAN.decode`` (or Griffin-Lim) it closes the text -> speech path.

Layout: (N, C, T) at the API boundary like the reference's modules; internal
compute is (N, T, C).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.models import register_model, register_model_architecture
from pytorch_sound_tpu.models.modules import PositionalEncoding

NEG = -1e30


class _Attention(nn.Module):
    """Generic multi-head attention on (N, T, C) with causal / key masking.

    Besides the full (teacher-forced) ``__call__``, exposes the two pieces
    incremental decoding needs: :meth:`kv` (project keys/values once, e.g.
    the cross-attention memory or the newest decoder frame) and
    :meth:`attend_step` (one query frame against a cached K/V buffer) — the
    O(T)-per-frame path used by :func:`synthesize`.
    """

    hidden_dim: int
    heads: int
    causal: bool = False

    def setup(self):
        c = self.hidden_dim
        self.q = nn.Dense(c, use_bias=False)
        self.k = nn.Dense(c, use_bias=False)
        self.v = nn.Dense(c, use_bias=False)
        self.out = nn.Dense(c, use_bias=False)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        n, t, c = x.shape
        return x.reshape(n, t, self.heads, c // self.heads)

    def __call__(self, x_q: jnp.ndarray, x_kv: jnp.ndarray,
                 kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, tq, c = x_q.shape
        tk = x_kv.shape[1]
        head_dim = c // self.heads
        q = self._heads(self.q(x_q))
        k = self._heads(self.k(x_kv))
        v = self._heads(self.v(x_kv))

        s = jnp.einsum('nqhd,nkhd->nhqk', q, k) / (head_dim ** 0.5)
        if kv_mask is not None:                     # (N, Tk): True = masked out
            s = jnp.where(kv_mask[:, None, None, :], NEG, s)
        if self.causal:
            tri = np.triu(np.ones((tq, tk), bool), k=1)
            s = jnp.where(jnp.asarray(tri)[None, None], NEG, s)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum('nhqk,nkhd->nqhd', p, v).reshape(n, tq, c)
        return self.out(out)

    def kv(self, x_kv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project (N, T, C) -> cached K, V of shape (N, T, H, D)."""
        return self._heads(self.k(x_kv)), self._heads(self.v(x_kv))

    def attend_step(self, x_q1: jnp.ndarray, k_all: jnp.ndarray,
                    v_all: jnp.ndarray,
                    kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """One query frame (N, 1, C) against cached K/V (N, Tk, H, D)."""
        n, _, c = x_q1.shape
        head_dim = c // self.heads
        q = self._heads(self.q(x_q1))
        s = jnp.einsum('nqhd,nkhd->nhqk', q, k_all) / (head_dim ** 0.5)
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, :], NEG, s)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum('nhqk,nkhd->nqhd', p, v_all).reshape(n, 1, c)
        return self.out(out)


class _FFN(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden_dim * 4)(x)
        h = nn.gelu(h)
        return nn.Dense(self.hidden_dim)(h)


@register_model('transformer_tts')
class TransformerTTS(nn.Module):
    """Teacher-forced forward: (text_ids (N, Tt), mel_in (N, M, Tm)) ->
    (mel_out (N, M, Tm), stop_logits (N, Tm))."""

    vocab_size: int = 65          # ENG_VOCA_SIZE + EOS
    mel_size: int = 80
    hidden_dim: int = 256
    heads: int = 4
    enc_layers: int = 4
    dec_layers: int = 4
    prenet_dim: int = 128
    max_len: int = 4096

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden_dim)
        self.enc_pe = PositionalEncoding(self.hidden_dim, self.max_len)
        self.dec_pe = PositionalEncoding(self.hidden_dim, self.max_len)

        self.enc_attn = [_Attention(self.hidden_dim, self.heads,
                                    name='enc_attn_%d' % i)
                         for i in range(self.enc_layers)]
        self.enc_ffn = [_FFN(self.hidden_dim, name='enc_ffn_%d' % i)
                        for i in range(self.enc_layers)]
        self.enc_ln = [nn.LayerNorm(name='enc_ln_%d' % i)
                       for i in range(2 * self.enc_layers)]

        self.prenet1 = nn.Dense(self.prenet_dim, name='prenet1')
        self.prenet2 = nn.Dense(self.hidden_dim, name='prenet2')

        self.dec_self = [_Attention(self.hidden_dim, self.heads, causal=True,
                                    name='dec_self_%d' % i)
                         for i in range(self.dec_layers)]
        self.dec_cross = [_Attention(self.hidden_dim, self.heads,
                                     name='dec_cross_%d' % i)
                          for i in range(self.dec_layers)]
        self.dec_ffn = [_FFN(self.hidden_dim, name='dec_ffn_%d' % i)
                        for i in range(self.dec_layers)]
        self.dec_ln = [nn.LayerNorm(name='dec_ln_%d' % i)
                       for i in range(3 * self.dec_layers)]

        self.mel_head = nn.Dense(self.mel_size, name='mel_head')
        self.stop_head = nn.Dense(1, name='stop_head')

    def encode_text(self, text_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(N, Tt) int ids -> ((N, Tt, C) memory, (N, Tt) pad mask)."""
        pad_mask = text_ids == 0
        x = self.embed(text_ids)                              # (N, Tt, C)
        x = self.enc_pe(x.swapaxes(1, 2)).swapaxes(1, 2)
        for i in range(self.enc_layers):
            x = self.enc_ln[2 * i](
                x + self.enc_attn[i](x, x, kv_mask=pad_mask))
            x = self.enc_ln[2 * i + 1](x + self.enc_ffn[i](x))
        return x, pad_mask

    def decode_mel(self, memory, pad_mask, mel_in: jnp.ndarray):
        """Teacher-forced decode: mel_in (N, M, Tm) (shifted targets)."""
        y = mel_in.swapaxes(1, 2)                             # (N, Tm, M)
        y = nn.relu(self.prenet1(y))
        y = nn.relu(self.prenet2(y))
        y = self.dec_pe(y.swapaxes(1, 2)).swapaxes(1, 2)
        for i in range(self.dec_layers):
            y = self.dec_ln[3 * i](y + self.dec_self[i](y, y))
            y = self.dec_ln[3 * i + 1](
                y + self.dec_cross[i](y, memory, kv_mask=pad_mask))
            y = self.dec_ln[3 * i + 2](y + self.dec_ffn[i](y))
        mel_out = self.mel_head(y).swapaxes(1, 2)             # (N, M, Tm)
        stop = self.stop_head(y)[..., 0]                      # (N, Tm)
        return mel_out, stop

    def precompute_cross_kv(self, memory: jnp.ndarray):
        """Project the encoder memory through every cross-attention layer's
        K/V once: returns stacked (L, N, Tt, H, D) keys and values."""
        ks, vs = [], []
        for i in range(self.dec_layers):
            k, v = self.dec_cross[i].kv(memory)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def decode_step(self, mem_k, mem_v, pad_mask, y_frame: jnp.ndarray,
                    t: jnp.ndarray, self_k, self_v):
        """One autoregressive decoder step with KV caches — O(T) per frame.

        ``y_frame`` (N, M) is the previous mel frame, ``t`` its (traced)
        position; ``self_k``/``self_v`` are (L, N, Tmax, H, D) caches holding
        positions < t; ``mem_k``/``mem_v`` come from
        :meth:`precompute_cross_kv`. Returns (mel_frame (N, M), stop_logit
        (N,), updated self_k, self_v). Numerics match :meth:`decode_mel`
        column ``t`` exactly (cache positions > t are masked out).
        """
        tmax = self_k.shape[2]
        y = nn.relu(self.prenet1(y_frame[:, None, :]))        # (N, 1, C)
        y = nn.relu(self.prenet2(y))
        # positional encoding column t (dec_pe.pe is (1, C, Tmax))
        pe_t = jax.lax.dynamic_slice_in_dim(self.dec_pe.pe, t, 1, axis=2)
        y = y * (self.hidden_dim ** 0.5) + pe_t.swapaxes(1, 2)
        future = (jnp.arange(tmax)[None, :] > t)              # (1, Tmax)
        for i in range(self.dec_layers):
            k1, v1 = self.dec_self[i].kv(y)                   # (N, 1, H, D)
            self_k = jax.lax.dynamic_update_slice(
                self_k, k1[None], (i, 0, t, 0, 0))
            self_v = jax.lax.dynamic_update_slice(
                self_v, v1[None], (i, 0, t, 0, 0))
            y = self.dec_ln[3 * i](y + self.dec_self[i].attend_step(
                y, self_k[i], self_v[i], kv_mask=future))
            y = self.dec_ln[3 * i + 1](y + self.dec_cross[i].attend_step(
                y, mem_k[i], mem_v[i], kv_mask=pad_mask))
            y = self.dec_ln[3 * i + 2](y + self.dec_ffn[i](y))
        mel_frame = self.mel_head(y)[:, 0]                    # (N, M)
        stop = self.stop_head(y)[:, 0, 0]                     # (N,)
        return mel_frame, stop, self_k, self_v

    def __call__(self, text_ids: jnp.ndarray, mel_in: jnp.ndarray):
        memory, pad_mask = self.encode_text(text_ids)
        return self.decode_mel(memory, pad_mask, mel_in)


def synthesize(model: TransformerTTS, params, text_ids: jnp.ndarray,
               max_frames: int = 400, stop_threshold: float = 0.5,
               go_frame_value: float = None) -> jnp.ndarray:
    """Greedy autoregressive inference: (N, Tt) ids -> (N, M, <=max_frames) mel.

    KV-cached incremental decode — O(T) per frame instead of re-running the
    decoder over the whole prefix — and the entire generation loop runs as a
    single jitted ``lax.while_loop`` dispatch (early exit when every batch
    row has emitted a stop token).
    """
    from pytorch_sound_tpu.ops.mel import db_to_log
    n = text_ids.shape[0]
    m = model.mel_size
    c = model.hidden_dim
    h = model.heads
    go = db_to_log(-50.0) if go_frame_value is None else go_frame_value

    memory, pad_mask = model.apply(params, text_ids,
                                   method=TransformerTTS.encode_text)
    mem_k, mem_v = model.apply(params, memory,
                               method=TransformerTTS.precompute_cross_kv)

    @jax.jit
    def run(mem_k, mem_v, pad_mask):
        kv_shape = (model.dec_layers, n, max_frames, h, c // h)
        state0 = (
            jnp.full((n, m, max_frames), go, dtype=jnp.float32),  # mel_buf
            jnp.zeros(kv_shape, jnp.float32),                     # self_k
            jnp.zeros(kv_shape, jnp.float32),                     # self_v
            jnp.zeros(n, bool),                                   # stopped
            jnp.int32(0),                                         # t
        )

        def cond(state):
            _, _, _, stopped, t = state
            return (t < max_frames - 1) & ~jnp.all(stopped)

        def body(state):
            mel_buf, self_k, self_v, stopped, t = state
            y_frame = jax.lax.dynamic_slice_in_dim(
                mel_buf, t, 1, axis=2)[:, :, 0]                   # (N, M)
            out, stop, self_k, self_v = model.apply(
                params, mem_k, mem_v, pad_mask, y_frame, t, self_k, self_v,
                method=TransformerTTS.decode_step)
            mel_buf = jax.lax.dynamic_update_slice(
                mel_buf, out[:, :, None], (0, 0, t + 1))
            stopped = stopped | (jax.nn.sigmoid(stop) > stop_threshold)
            return mel_buf, self_k, self_v, stopped, t + 1

        mel_buf, _, _, _, t = jax.lax.while_loop(cond, body, state0)
        return mel_buf, t

    mel_buf, t = run(mem_k, mem_v, pad_mask)
    produced = int(t)
    return mel_buf[:, :, 1:produced + 1]


@register_model_architecture('transformer_tts', 'transformer_tts_base')
def transformer_tts_base():
    return {'vocab_size': 65, 'mel_size': 80, 'hidden_dim': 256, 'heads': 4,
            'enc_layers': 4, 'dec_layers': 4, 'prenet_dim': 128}


@register_model_architecture('transformer_tts', 'transformer_tts_small')
def transformer_tts_small():
    return {'vocab_size': 65, 'mel_size': 80, 'hidden_dim': 64, 'heads': 2,
            'enc_layers': 1, 'dec_layers': 1, 'prenet_dim': 32}
