"""MUSDB18-HQ source-separation meta (https://zenodo.org/record/3338373).

Parity target: `/root/reference/pytorch_sound/data/meta/musdb18.py` —
subclasses the DSD100 meta, mixture + vocals chunks only.
"""

import glob
import os
from typing import List, Tuple

from pytorch_sound_tpu.data.dataset import SpeechDataLoader
from pytorch_sound_tpu.data.meta import MetaType
from pytorch_sound_tpu.data.meta.base import make_loaders
from pytorch_sound_tpu.data.meta.commons import split_train_val_frame
from pytorch_sound_tpu.data.meta.dsd100 import DSD100Meta


class MUSDB18Meta(DSD100Meta):

    @property
    def columns(self) -> List[Tuple[MetaType, str]]:
        return [(MetaType.AUDIO, 'mixture_filename'), (MetaType.AUDIO, 'voice_filename')]

    def make_meta(self, root_dir: str):
        """Scan <root>/*/*/{mixture,vocals}.<i>.npy chunk pairs."""
        print('Lookup files ...')
        mixture_list = glob.glob(os.path.join(root_dir, '*', '*', 'mixture.*.npy'))
        # only vocals are extracted; override for other stems
        vocals_list = glob.glob(os.path.join(root_dir, '*', '*', 'vocals.*.npy'))

        print('Make meta information ...')
        self._meta['mixture_filename'] = sorted(mixture_list)
        self._meta['voice_filename'] = sorted(vocals_list)

        train_meta, val_meta = split_train_val_frame(self._meta, val_rate=0.1)
        self.finalize_and_save(train_meta, val_meta)


def get_datasets(meta_dir: str, batch_size: int, num_workers: int,
                 fix_len: int = 0, audio_mask: bool = False,
                 pad_multiple: int = 1) -> Tuple[SpeechDataLoader, SpeechDataLoader]:
    return make_loaders(
        MUSDB18Meta, meta_dir, batch_size, num_workers,
        dataset_kwargs=dict(fix_len=fix_len, audio_mask=audio_mask),
        train_loader_kwargs=dict(is_bucket=False),
        valid_loader_kwargs=dict(is_bucket=False),
        pad_multiple=pad_multiple)
