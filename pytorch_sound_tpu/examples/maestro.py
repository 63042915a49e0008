"""Maestro frame-level transcription training (BASELINE config 5).

Bucketed streaming loader + per-step ON-DEVICE log-mel extraction inside the
jitted step (at the dataset's 44.1 kHz), frame-pitch BCE against the piano
roll, data-parallel over a device mesh.

Run: ``python -m pytorch_sound_tpu.examples.maestro meta_dir save_dir [...]``
"""

from typing import Dict, Tuple

import jax.numpy as jnp
import optax

from pytorch_sound_tpu import settings
from pytorch_sound_tpu.data.meta import maestro
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.transcription  # noqa: F401 (registration)
from pytorch_sound_tpu.ops import mel as mel_ops
from pytorch_sound_tpu.trainer import LogType, Trainer

MAESTRO_SR = 44100
ROLL_FS = 100   # pretty_midi get_piano_roll default frames/sec


class MaestroTrainer(Trainer):
    """forward over (audio, piano_roll): on-device mel + frame BCE."""

    def _logmel(self, wav: jnp.ndarray) -> jnp.ndarray:
        return mel_ops.log_mel_spectrogram(
            wav, MAESTRO_SR, settings.MEL_SIZE, settings.N_FFT,
            settings.WIN_LENGTH, settings.HOP_LENGTH,
            settings.MIN_DB, settings.MAX_DB, settings.MEL_MIN, None)

    def _align_roll(self, roll: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        """Resample a (N, 128, T_roll) piano roll onto the mel frame grid via
        nearest-neighbor gather (static shapes)."""
        t_roll = roll.shape[-1]
        frame_times = jnp.arange(n_frames) * settings.HOP_LENGTH / MAESTRO_SR
        idx = jnp.clip((frame_times * ROLL_FS).astype(jnp.int32), 0, t_roll - 1)
        return roll[..., idx]

    def forward(self, params, audio, piano_roll, *rest, is_logging: bool = False
                ) -> Tuple[jnp.ndarray, Dict]:
        mel = self._logmel(audio)
        logits = self.model.apply(params, mel)
        target = (self._align_roll(piano_roll, logits.shape[-1]) > 0).astype(jnp.float32)

        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))
        meta = {}
        if is_logging:
            pred = (logits > 0).astype(jnp.float32)
            tp = jnp.sum(pred * target)
            precision = tp / jnp.maximum(jnp.sum(pred), 1.0)
            recall = tp / jnp.maximum(jnp.sum(target), 1.0)
            meta = {
                'loss': (loss, LogType.SCALAR),
                'precision': (precision, LogType.SCALAR),
                'recall': (recall, LogType.SCALAR),
                'mel': (mel[0], LogType.IMAGE),
            }
        return loss, meta

    def init_params(self, rng, batch):
        return self.model.init(rng, self._logmel(batch[0]))


def main(meta_dir: str, save_dir: str, batch_size: int = 4, num_workers: int = 2,
         fix_len: int = 131072, max_step: int = 50000, valid_max_step: int = 20,
         save_interval: int = 2000, log_interval: int = 50, lr: float = 3e-4,
         arch: str = 'frame_pitch_base', use_mesh: bool = True):
    from pytorch_sound_tpu.utils.commons import enable_compilation_cache
    enable_compilation_cache()   # warm restarts skip the long first compile
    train_loader, valid_loader = maestro.get_datasets(
        meta_dir, batch_size=batch_size, num_workers=num_workers,
        fix_len=fix_len, pad_multiple=fix_len)

    model = build_model(arch)
    mesh = None
    if use_mesh:
        from pytorch_sound_tpu.parallel import make_mesh
        import jax
        if len(jax.devices()) > 1:
            mesh = make_mesh()

    trainer = MaestroTrainer(
        model, optax.adamw(lr), train_loader, valid_loader,
        max_step=max_step, valid_max_step=valid_max_step,
        save_interval=save_interval, log_interval=log_interval,
        save_dir=save_dir, save_prefix='maestro', sr=MAESTRO_SR,
        grad_norm=3.0, mesh=mesh)
    return trainer.run()


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(main)
