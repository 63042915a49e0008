"""LJSpeech text-to-mel training (Transformer-TTS, teacher-forced).

Closes the text -> speech path the reference only provided frontends for:
text ids (eng_t2i with EOS) -> mel via TransformerTTS, then mel -> wav with
the bundled HiFi-GAN (or Griffin-Lim). Per-step mel extraction happens
on-device (fused kernel on TPU); losses are masked by the frame-level mask
derived from the loader's wave mask.

Run: ``python -m pytorch_sound_tpu.examples.ljspeech_tts meta_dir save_dir``
"""

from typing import Dict, Tuple

import jax.numpy as jnp
import optax

from pytorch_sound_tpu import settings
from pytorch_sound_tpu.data.meta import ljspeech
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.tts  # noqa: F401 (registration)
from pytorch_sound_tpu.ops import mel as mel_ops
from pytorch_sound_tpu.ops.sound import spectrogram_mask
from pytorch_sound_tpu.trainer import LogType, Trainer


class TTSTrainer(Trainer):
    """forward over (wav, text[, wav_mask]): on-device mel + teacher forcing."""

    def _logmel(self, wav: jnp.ndarray) -> jnp.ndarray:
        return mel_ops.log_mel_spectrogram(
            wav, settings.SAMPLE_RATE, settings.MEL_SIZE, settings.N_FFT,
            settings.WIN_LENGTH, settings.HOP_LENGTH,
            settings.MIN_DB, settings.MAX_DB, settings.MEL_MIN, settings.MEL_MAX)

    def forward(self, params, wav, text, *rest, is_logging: bool = False
                ) -> Tuple[jnp.ndarray, Dict]:
        mel = self._logmel(wav)                               # (N, M, Tm)
        n, m, tm = mel.shape

        # frame-level validity from the wave mask (all-ones when absent)
        if rest:
            frame_mask = spectrogram_mask(rest[0], settings.WIN_LENGTH,
                                          settings.HOP_LENGTH)[:, :tm]
        else:
            frame_mask = jnp.ones((n, tm))

        # teacher forcing: decoder sees mel shifted right by a go-frame
        go = mel_ops.db_to_log(settings.MIN_DB)
        mel_in = jnp.concatenate(
            [jnp.full((n, m, 1), go, mel.dtype), mel[:, :, :-1]], axis=2)

        mel_out, stop_logits = self.model.apply(params, text, mel_in)

        denom = jnp.maximum(frame_mask.sum(), 1.0)
        mel_l1 = jnp.sum(jnp.abs(mel_out - mel) * frame_mask[:, None, :]) \
            / (denom * m)
        # stop target: 1 on the first padded frame after the utterance
        ends = jnp.concatenate(
            [frame_mask[:, :-1] - frame_mask[:, 1:],
             jnp.zeros((n, 1))], axis=1).clip(0, 1)
        stop_bce = jnp.mean(
            optax.sigmoid_binary_cross_entropy(stop_logits, ends)
            * jnp.maximum(frame_mask, ends))
        loss = mel_l1 + stop_bce

        meta = {}
        if is_logging:
            meta = {
                'loss': (loss, LogType.SCALAR),
                'mel_l1': (mel_l1, LogType.SCALAR),
                'stop_bce': (stop_bce, LogType.SCALAR),
                'mel_pred': (mel_out[0], LogType.IMAGE),
                'mel_target': (mel[0], LogType.IMAGE),
            }
        return loss, meta

    def init_params(self, rng, batch):
        wav, text = batch[0], batch[1]
        mel = self._logmel(wav)
        return self.model.init(rng, text, mel)


def main(meta_dir: str, save_dir: str, batch_size: int = 16, num_workers: int = 2,
         fix_len: int = 0, max_step: int = 300000, valid_max_step: int = 20,
         save_interval: int = 2000, log_interval: int = 50, lr: float = 1e-4,
         arch: str = 'transformer_tts_base'):
    from pytorch_sound_tpu.utils.commons import enable_compilation_cache
    enable_compilation_cache()   # warm restarts skip the long first compile
    train_loader, valid_loader = ljspeech.get_datasets(
        meta_dir, batch_size=batch_size, num_workers=num_workers,
        fix_len=fix_len, audio_mask=True, pad_multiple=16384)

    trainer = TTSTrainer(
        build_model(arch), optax.adamw(lr, b1=0.9, b2=0.98),
        train_loader, valid_loader,
        max_step=max_step, valid_max_step=valid_max_step,
        save_interval=save_interval, log_interval=log_interval,
        save_dir=save_dir, save_prefix='ljspeech_tts', grad_norm=1.0)
    return trainer.run()


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(main)
