"""U-Net magnitude-STFT masking network for source separation.

The model for the DSD100/MUSDB18/MedleyDB separation configs (BASELINE
config 3, the tests/test_dsd100 path). The reference ships the loaders but no
separation model (users supply their own); this 2-D conv U-Net over
(freq, time) magnitudes is the standard spectrogram-masking architecture
for that data.

TPU notes: encoder/decoder convs are NHWC 2-D convs (freq x time as the
spatial dims) with stride-2 downsampling — everything static-shaped; inputs
are padded to a multiple of 2^depth frames by the trainer.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pytorch_sound_tpu.models import register_model, register_model_architecture


class _DownBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (4, 4), strides=(2, 2), padding='SAME')(x)
        x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        return nn.leaky_relu(x, 0.2)


class _UpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding='SAME')(x)
        x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        x = nn.relu(x)
        return jnp.concatenate([x, skip], axis=-1)


@register_model('spec_unet')
class SpectrogramUNet(nn.Module):
    """Magnitude (N, F, T) -> sigmoid source mask (N, F, T)."""

    channels: Sequence[int] = (16, 32, 64, 128)
    spec_size: int = 513

    @nn.compact
    def __call__(self, mag: jnp.ndarray) -> jnp.ndarray:
        depth = len(self.channels)
        scale = 2 ** depth
        n, f, t = mag.shape
        # pad freq/time up to the stride pyramid; slice back at the end
        f_pad = (-f) % scale
        t_pad = (-t) % scale
        x = jnp.log1p(mag)[..., None]                        # (N, F, T, 1)
        x = jnp.pad(x, [(0, 0), (0, f_pad), (0, t_pad), (0, 0)])

        skips = []
        for ch in self.channels:
            skips.append(x)
            x = _DownBlock(ch)(x)
        for ch in reversed(self.channels[:-1]):
            x = _UpBlock(ch)(x, skips.pop())
        x = nn.ConvTranspose(self.channels[0], (4, 4), strides=(2, 2),
                             padding='SAME')(x)
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = nn.Conv(self.channels[0], (3, 3), padding='SAME')(x)
        x = nn.relu(x)
        mask = nn.Conv(1, (1, 1))(x)[..., 0]                  # (N, F+pad, T+pad)
        return nn.sigmoid(mask)[:, :f, :t]


@register_model_architecture('spec_unet', 'spec_unet_base')
def spec_unet_base():
    return {'channels': (16, 32, 64, 128), 'spec_size': 513}


@register_model_architecture('spec_unet', 'spec_unet_small')
def spec_unet_small():
    return {'channels': (8, 16, 32), 'spec_size': 513}
