"""Frame-level piano transcription network for the Maestro path.

The model for BASELINE config 5 (Maestro streaming + per-step on-device STFT):
log-mel frames -> conv stack -> per-frame 128-pitch activation logits, trained
against pretty_midi-style piano rolls. The reference ships Maestro loaders but
no transcription model; this is the standard onsets-and-frames-style frame
stack (conv + BiLSTM-free, TPU-friendly dilated conv context).
"""


import flax.linen as nn
import jax.numpy as jnp

from pytorch_sound_tpu.models import register_model, register_model_architecture


@register_model('frame_pitch')
class FramePitchNet(nn.Module):
    """log-mel (N, M, T) -> pitch logits (N, 128, T)."""

    mel_size: int = 80
    hidden_dim: int = 256
    n_blocks: int = 4
    kernel_size: int = 3
    n_pitches: int = 128

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = mel.swapaxes(1, 2)                                 # (N, T, M)
        x = nn.Conv(self.hidden_dim, (self.kernel_size,), name='conv_in')(x)
        for i in range(self.n_blocks):
            h = nn.LayerNorm(name='ln_%d' % i)(x)
            # growing dilation for multi-frame context without downsampling
            h = nn.Conv(self.hidden_dim, (self.kernel_size,),
                        kernel_dilation=(2 ** i,), name='conv_a%d' % i)(h)
            h = nn.gelu(h)
            h = nn.Conv(self.hidden_dim, (1,), name='conv_b%d' % i)(h)
            x = x + h
        logits = nn.Dense(self.n_pitches, name='head')(x)      # (N, T, 128)
        return logits.swapaxes(1, 2)


@register_model_architecture('frame_pitch', 'frame_pitch_base')
def frame_pitch_base():
    return {'mel_size': 80, 'hidden_dim': 256, 'n_blocks': 4, 'kernel_size': 3}


@register_model_architecture('frame_pitch', 'frame_pitch_small')
def frame_pitch_small():
    return {'mel_size': 80, 'hidden_dim': 96, 'n_blocks': 2, 'kernel_size': 3}
