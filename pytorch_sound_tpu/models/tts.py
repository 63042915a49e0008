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
    """Generic multi-head attention on (N, T, C) with causal / key masking."""

    hidden_dim: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x_q: jnp.ndarray, x_kv: jnp.ndarray,
                 kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, tq, c = x_q.shape
        tk = x_kv.shape[1]
        head_dim = c // self.heads
        q = nn.Dense(c, use_bias=False, name='q')(x_q)
        k = nn.Dense(c, use_bias=False, name='k')(x_kv)
        v = nn.Dense(c, use_bias=False, name='v')(x_kv)
        q = q.reshape(n, tq, self.heads, head_dim)
        k = k.reshape(n, tk, self.heads, head_dim)
        v = v.reshape(n, tk, self.heads, head_dim)

        s = jnp.einsum('nqhd,nkhd->nhqk', q, k) / (head_dim ** 0.5)
        if kv_mask is not None:                     # (N, Tk): True = masked out
            s = jnp.where(kv_mask[:, None, None, :], NEG, s)
        if self.causal:
            tri = np.triu(np.ones((tq, tk), bool), k=1)
            s = jnp.where(jnp.asarray(tri)[None, None], NEG, s)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum('nhqk,nkhd->nqhd', p, v).reshape(n, tq, c)
        return nn.Dense(c, use_bias=False, name='out')(out)


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

    def __call__(self, text_ids: jnp.ndarray, mel_in: jnp.ndarray):
        memory, pad_mask = self.encode_text(text_ids)
        return self.decode_mel(memory, pad_mask, mel_in)


def synthesize(model: TransformerTTS, params, text_ids: jnp.ndarray,
               max_frames: int = 400, stop_threshold: float = 0.5,
               go_frame_value: float = None) -> jnp.ndarray:
    """Greedy autoregressive inference: (N, Tt) ids -> (N, M, <=max_frames) mel.

    Re-runs the decoder over the growing prefix each step (jitted per length
    bucket by padding the prefix to max_frames — one compilation).
    """
    from pytorch_sound_tpu.ops.mel import db_to_log
    n = text_ids.shape[0]
    m = model.mel_size
    go = db_to_log(-50.0) if go_frame_value is None else go_frame_value

    memory, pad_mask = model.apply(params, text_ids,
                                   method=TransformerTTS.encode_text)

    @jax.jit
    def step(mel_buf):
        out, stop = model.apply(params, memory, pad_mask, mel_buf,
                                method=TransformerTTS.decode_mel)
        return out, stop

    mel_buf = jnp.full((n, m, max_frames), go, dtype=jnp.float32)
    stopped = np.zeros(n, bool)
    produced = 0
    for t in range(max_frames - 1):
        out, stop = step(mel_buf)
        mel_buf = mel_buf.at[:, :, t + 1].set(out[:, :, t])
        produced = t + 1
        stopped |= np.asarray(jax.nn.sigmoid(stop[:, t])) > stop_threshold
        if stopped.all():
            break
    return mel_buf[:, :, 1:produced + 1]


@register_model_architecture('transformer_tts', 'transformer_tts_base')
def transformer_tts_base():
    return {'vocab_size': 65, 'mel_size': 80, 'hidden_dim': 256, 'heads': 4,
            'enc_layers': 4, 'dec_layers': 4, 'prenet_dim': 128}


@register_model_architecture('transformer_tts', 'transformer_tts_small')
def transformer_tts_small():
    return {'vocab_size': 65, 'mel_size': 80, 'hidden_dim': 64, 'heads': 2,
            'enc_layers': 1, 'dec_layers': 1, 'prenet_dim': 32}
