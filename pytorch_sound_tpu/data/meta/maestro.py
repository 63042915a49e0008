"""Maestro piano dataset meta (https://magenta.tensorflow.org/datasets/maestro).

Parity target: `/root/reference/pytorch_sound/data/meta/maestro.py` — wraps the
official maestro-v1.0.0 CSV/JSON metadata (no preprocessing needed); AUDIO +
MIDI columns.
"""

import os
from typing import List, Tuple

import pandas as pd

from pytorch_sound_tpu.data.dataset import SpeechDataLoader
from pytorch_sound_tpu.data.meta import MetaFrame, MetaType
from pytorch_sound_tpu.data.meta.base import make_loaders
from pytorch_sound_tpu.data.meta.commons import split_train_val_frame


class MaestroMeta(MetaFrame):

    frame_file_names: List[str] = ['maestro-v1.0.0.json', 'maestro-v1.0.0-train.json',
                                   'maestro-v1.0.0-valid.json']

    def __init__(self, meta_path: str, min_wav_rate: float = 0.0,
                 max_wav_rate: float = 0.0, sr: int = 44100):
        self.meta_path = meta_path
        self.root_dir = os.path.split(self.meta_path)[-2]
        if os.path.exists(self.meta_path):
            if self.meta_path.endswith('csv'):
                self._meta = pd.read_csv(self.meta_path)
            elif self.meta_path.endswith('json'):
                self._meta = pd.read_json(self.meta_path)
            else:
                raise RuntimeError('You should use official maestro meta file !')
        else:
            raise RuntimeError('{} is not exists !'.format(meta_path))
        self.min_wav_rate = min_wav_rate
        self.max_wav_rate = max_wav_rate
        self.sr = sr

    @property
    def columns(self) -> List[Tuple[MetaType, str]]:
        return [(MetaType.AUDIO, 'audio_filename'), (MetaType.MIDI, 'midi_filename'),
                (MetaType.META, 'duration')]

    @property
    def meta(self) -> pd.DataFrame:
        return self._meta

    def __len__(self):
        return len(self._meta)

    def save_meta(self, meta_dir: str, all_frame: pd.DataFrame,
                  train_frame: pd.DataFrame, val_frame: pd.DataFrame):
        file_paths = [os.path.join(meta_dir, name) for name in self.frame_file_names]
        all_frame.to_json(file_paths[0])
        train_frame.to_json(file_paths[1])
        val_frame.to_json(file_paths[2])

    def make_meta(self):
        """Absolutize the official meta's relative paths and split train/val."""
        self._meta['audio_filename'] = [
            os.path.join(self.root_dir, name) for name in self._meta['audio_filename']]
        self._meta['midi_filename'] = [
            os.path.join(self.root_dir, name) for name in self._meta['midi_filename']]

        print('Make train / val meta')
        train_meta, val_meta = split_train_val_frame(self._meta)
        print('Save meta frames on {}'.format(' '.join(self.frame_file_names)))
        self.save_meta(self.root_dir, self._meta, train_meta, val_meta)


def get_datasets(meta_dir: str, batch_size: int, num_workers: int,
                 fix_len: int = 0, skip_audio: bool = False,
                 pad_multiple: int = 1) -> Tuple[SpeechDataLoader, SpeechDataLoader]:
    return make_loaders(
        MaestroMeta, meta_dir, batch_size, num_workers,
        dataset_kwargs=dict(fix_len=fix_len, skip_audio=skip_audio),
        pad_multiple=pad_multiple)


if __name__ == '__main__':
    import sys
    meta_path = sys.argv[1]
    min_wav, max_wav = map(float, sys.argv[2:4])
    MaestroMeta(meta_path, min_wav, max_wav).make_meta()
