"""DSD100/MUSDB18 vocal separation training (BASELINE config 3).

U-Net magnitude masking with per-step on-device STFT at 44.1 kHz data:
mixture -> |STFT| -> mask -> vocal estimate, L1 against the vocal magnitude
plus a mixture-consistency term against (mixture - vocal) = background.

Run: ``python -m pytorch_sound_tpu.examples.dsd100 meta_dir save_dir [...]``
"""

from typing import Dict, Tuple

import jax.numpy as jnp
import optax

from pytorch_sound_tpu import settings
from pytorch_sound_tpu.data.meta import dsd100
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.separation  # noqa: F401 (registration)
from pytorch_sound_tpu.ops import stft as stft_ops
from pytorch_sound_tpu.trainer import LogType, Trainer


class DSD100Trainer(Trainer):
    """Vocal-mask separation: forward over (mixture, voice, background)."""

    def _magnitude(self, wav: jnp.ndarray) -> jnp.ndarray:
        return stft_ops.spectrogram_magnitude(
            wav, settings.N_FFT, settings.HOP_LENGTH, settings.WIN_LENGTH)

    def forward(self, params, mixture, voice, *rest, is_logging: bool = False
                ) -> Tuple[jnp.ndarray, Dict]:
        mix_mag = self._magnitude(mixture)
        voice_mag = self._magnitude(voice)

        mask = self.model.apply(params, mix_mag)
        est_voice = mask * mix_mag
        est_background = (1.0 - mask) * mix_mag

        voice_l1 = jnp.mean(jnp.abs(est_voice - voice_mag))
        if rest:   # background column present (DSD100; MUSDB18 has none)
            bg_mag = self._magnitude(rest[0])
            bg_l1 = jnp.mean(jnp.abs(est_background - bg_mag))
        else:
            bg_l1 = jnp.mean(jnp.abs(est_background - (mix_mag - voice_mag)))
        loss = voice_l1 + bg_l1

        meta = {}
        if is_logging:
            meta = {
                'loss': (loss, LogType.SCALAR),
                'voice_l1': (voice_l1, LogType.SCALAR),
                'background_l1': (bg_l1, LogType.SCALAR),
                'est_voice': (jnp.log1p(est_voice[0]), LogType.IMAGE),
            }
        return loss, meta

    def init_params(self, rng, batch):
        return self.model.init(rng, self._magnitude(batch[0]))


def separate(model, params, mixture: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference: (N, T) mixture -> (voice, background) waveforms.

    Masks the mixture magnitude and reconstructs both sources with the
    mixture phase through the exact iSTFT. Jit-compatible.
    """
    real, imag = stft_ops.stft(mixture, settings.N_FFT, settings.HOP_LENGTH,
                               settings.WIN_LENGTH)
    mag = jnp.sqrt(real * real + imag * imag)
    mask = model.apply(params, mag)

    def recon(m):
        return stft_ops.istft(m * real, m * imag, settings.N_FFT,
                              settings.HOP_LENGTH, settings.WIN_LENGTH,
                              length=mixture.shape[-1])

    return recon(mask), recon(1.0 - mask)


def main(meta_dir: str, save_dir: str, batch_size: int = 4, num_workers: int = 2,
         fix_len: int = 65536, max_step: int = 20000, valid_max_step: int = 20,
         save_interval: int = 1000, log_interval: int = 50, lr: float = 1e-4,
         arch: str = 'spec_unet_base', use_mesh: bool = False):
    from pytorch_sound_tpu.utils.commons import enable_compilation_cache
    enable_compilation_cache()   # warm restarts skip the long first compile
    train_loader, valid_loader = dsd100.get_datasets(
        meta_dir, batch_size=batch_size, num_workers=num_workers,
        fix_len=fix_len, pad_multiple=fix_len)

    model = build_model(arch)
    mesh = None
    if use_mesh:
        from pytorch_sound_tpu.parallel import make_mesh
        mesh = make_mesh()

    trainer = DSD100Trainer(
        model, optax.adam(lr), train_loader, valid_loader,
        max_step=max_step, valid_max_step=valid_max_step,
        save_interval=save_interval, log_interval=log_interval,
        save_dir=save_dir, save_prefix='dsd100', sr=44100,
        grad_norm=5.0, mesh=mesh)
    return trainer.run()


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(main)
