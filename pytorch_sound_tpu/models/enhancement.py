"""Spectrogram-masking speech enhancement network (the minimum end-to-end model).

This is the model for the VoiceBank enhancement config (BASELINE.json config 2,
SURVEY.md §7 step 5): a conv stack over STFT magnitudes predicting a sigmoid
mask. The reference bundles no enhancement model (users supply their own);
this one exercises registry + transforms + trainer end-to-end.

TPU notes: operates on (N, F, T) magnitudes, computed internally as (N, T, F)
so the channel dim (F=513) rides the MXU through 1-d convs; all shapes static.
"""


import flax.linen as nn
import jax.numpy as jnp

from pytorch_sound_tpu.models import register_model, register_model_architecture


@register_model('spec_masker')
class SpectrogramMaskNet(nn.Module):
    """Magnitude (N, F, T) -> sigmoid mask (N, F, T)."""

    spec_size: int = 513
    hidden_dim: int = 256
    n_blocks: int = 4
    kernel_size: int = 5

    @nn.compact
    def __call__(self, mag: jnp.ndarray) -> jnp.ndarray:
        x = jnp.log1p(mag).swapaxes(1, 2)                  # (N, T, F), compressed
        x = nn.Conv(self.hidden_dim, (self.kernel_size,), name='conv_in')(x)
        for i in range(self.n_blocks):
            h = nn.LayerNorm(name='ln_%d' % i)(x)
            h = nn.Conv(self.hidden_dim, (self.kernel_size,),
                        name='conv_a%d' % i)(h)
            h = nn.gelu(h)
            h = nn.Conv(self.hidden_dim, (1,), name='conv_b%d' % i)(h)
            x = x + h                                       # residual
        mask = nn.Conv(self.spec_size, (1,), name='conv_out')(x)
        return nn.sigmoid(mask).swapaxes(1, 2)              # (N, F, T)


@register_model_architecture('spec_masker', 'spec_masker_base')
def spec_masker_base():
    return {'spec_size': 513, 'hidden_dim': 256, 'n_blocks': 4, 'kernel_size': 5}


@register_model_architecture('spec_masker', 'spec_masker_small')
def spec_masker_small():
    return {'spec_size': 513, 'hidden_dim': 96, 'n_blocks': 2, 'kernel_size': 3}
