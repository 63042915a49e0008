"""VoiceBank speech-enhancement training — the minimum end-to-end slice.

Exercises every layer (settings -> DSP -> data -> registry -> trainer) per
SURVEY.md §7 step 5 / BASELINE config 2: noisy/clean pairs from
``voice_bank.get_datasets``, per-step ON-DEVICE magnitude-STFT extraction
inside the jitted forward, a registry-built mask net, L1 mask loss.

Run: ``python -m pytorch_sound_tpu.examples.voice_bank meta_dir save_dir [...]``
"""

from typing import Dict, Tuple

import jax.numpy as jnp
import optax

from pytorch_sound_tpu import settings
from pytorch_sound_tpu.data.meta import voice_bank
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.enhancement  # noqa: F401 (registration)
from pytorch_sound_tpu.ops import stft as stft_ops
from pytorch_sound_tpu.trainer import LogType, Trainer


class VoiceBankTrainer(Trainer):
    """forward() contract demo: on-device STFT + mask net + L1 losses."""

    def _magnitude(self, wav: jnp.ndarray) -> jnp.ndarray:
        return stft_ops.spectrogram_magnitude(
            wav, settings.N_FFT, settings.HOP_LENGTH, settings.WIN_LENGTH)

    def forward(self, params, noisy, clean, *rest, is_logging: bool = False
                ) -> Tuple[jnp.ndarray, Dict]:
        noisy_mag = self._magnitude(noisy)
        clean_mag = self._magnitude(clean)

        mask = self.model.apply(params, noisy_mag)
        est_mag = mask * noisy_mag

        mag_l1 = jnp.mean(jnp.abs(est_mag - clean_mag))
        log_l1 = jnp.mean(jnp.abs(jnp.log1p(est_mag) - jnp.log1p(clean_mag)))
        loss = mag_l1 + log_l1

        meta = {}
        if is_logging:
            meta = {
                'loss': (loss, LogType.SCALAR),
                'mag_l1': (mag_l1, LogType.SCALAR),
                'log_l1': (log_l1, LogType.SCALAR),
                'est_mag': (jnp.log1p(est_mag[0]), LogType.IMAGE),
            }
        return loss, meta

    def init_params(self, rng, batch):
        return self.model.init(rng, self._magnitude(batch[0]))


def enhance(model, params, noisy: jnp.ndarray) -> jnp.ndarray:
    """Inference: denoise waveforms (N, T) -> (N, T).

    Applies the trained magnitude mask and reconstructs with the noisy phase
    through the exact iSTFT — the standard spectral-masking deployment path.
    Jit-compatible (wrap in jax.jit for repeated use).
    """
    real, imag = stft_ops.stft(noisy, settings.N_FFT, settings.HOP_LENGTH,
                               settings.WIN_LENGTH)
    mag = jnp.sqrt(real * real + imag * imag)
    mask = model.apply(params, mag)
    return stft_ops.istft(mask * real, mask * imag, settings.N_FFT,
                          settings.HOP_LENGTH, settings.WIN_LENGTH,
                          length=noisy.shape[-1])


def main(meta_dir: str, save_dir: str, batch_size: int = 8, num_workers: int = 2,
         fix_len: int = 32768, max_step: int = 10000, valid_max_step: int = 20,
         save_interval: int = 1000, log_interval: int = 50, lr: float = 2e-4,
         arch: str = 'spec_masker_base', use_mesh: bool = False):
    from pytorch_sound_tpu.utils.commons import enable_compilation_cache
    enable_compilation_cache()   # warm restarts skip the long first compile
    train_loader, valid_loader = voice_bank.get_datasets(
        meta_dir, batch_size=batch_size, num_workers=num_workers,
        fix_len=fix_len, pad_multiple=fix_len)

    model = build_model(arch)
    optimizer = optax.adam(lr)
    mesh = None
    if use_mesh:
        from pytorch_sound_tpu.parallel import make_mesh
        mesh = make_mesh()

    trainer = VoiceBankTrainer(
        model, optimizer, train_loader, valid_loader,
        max_step=max_step, valid_max_step=valid_max_step,
        save_interval=save_interval, log_interval=log_interval,
        save_dir=save_dir, save_prefix='voice_bank', grad_norm=5.0, mesh=mesh)
    return trainer.run()


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(main)
