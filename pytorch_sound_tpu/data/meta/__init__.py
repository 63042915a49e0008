"""Dataset meta-frame machinery: typed column descriptors over pandas frames.

API parity target: `/root/reference/pytorch_sound/data/meta/__init__.py`.
A :class:`MetaFrame` subclass declares typed columns, a ``make_meta`` pipeline
that scans a raw dataset into all/train/val JSON frames, and drives the
generic :class:`~pytorch_sound_tpu.data.dataset.SpeechDataset`.
"""

import abc
import enum
import os
import re
from itertools import repeat
from typing import List, Tuple

import pandas as pd

from pytorch_sound_tpu.utils.commons import go_multiprocess
from pytorch_sound_tpu.utils.sound import get_wav_duration


class MetaType(enum.Enum):
    AUDIO: int = 1
    SCALAR: int = 2
    MIDI: int = 3
    TEXT: int = 4
    META: int = 5


class MetaFrame:
    """Describes a dataset: typed columns + preprocessing into meta JSON files.

    Subclasses override :attr:`columns`, :attr:`meta`, and :meth:`make_meta`.
    """

    @property
    def process_columns(self) -> List[Tuple[MetaType, str]]:
        """Columns that produce data points (META columns filtered out)."""
        target_types = [MetaType.AUDIO, MetaType.SCALAR, MetaType.MIDI, MetaType.TEXT]
        return [(type_, name) for (type_, name) in self.columns if type_ in target_types]

    @property
    @abc.abstractmethod
    def columns(self) -> List[Tuple[MetaType, str]]:
        raise NotImplementedError('You must define columns !')

    @property
    def column_names(self) -> List[str]:
        return [col[1] for col in self.columns]

    @property
    @abc.abstractmethod
    def meta(self) -> pd.DataFrame:
        raise NotImplementedError('You must define make DataFrame!')

    @abc.abstractmethod
    def make_meta(self, *args, **kwargs):
        raise NotImplementedError('You must define make DataFrame and save it !')

    @property
    def iloc(self):
        return self.meta.iloc

    def _process_duration(self, wav_file_list: List[str], min_wav_rate: float,
                          max_wav_rate: float) -> List[float]:
        """Mark rows failing the [min, max] duration bounds (duration -1 = unreadable)."""
        dur_list = go_multiprocess(get_wav_duration, [(x,) for x in wav_file_list])
        pass_list = []
        for p, dur in zip(self._meta['pass'], dur_list):
            flag = p and dur != -1
            if min_wav_rate and max_wav_rate:
                flag = flag and min_wav_rate < dur < max_wav_rate
            pass_list.append(flag)
        self._meta['pass'] = pass_list
        return dur_list

    def _process_txt(self, txt_file_list: List[str], dur_list: List[float],
                     min_txt_rate: float):
        """Clean text files and mark rows whose text/duration ratio is too low."""
        results = go_multiprocess(
            preprocess_text,
            [(item,) for item in zip(txt_file_list,
                                     repeat(min_txt_rate, len(txt_file_list)),
                                     dur_list)])
        txt_list, pass_list = map(list, zip(*results))
        self._meta['pass'] = [p1 and p2 for p1, p2 in zip(self._meta['pass'], pass_list)]
        self._meta['text'] = txt_list

    @staticmethod
    def save_meta(frame_file_names: List[str], meta_path: str,
                  all_frame: pd.DataFrame, train_frame: pd.DataFrame,
                  val_frame: pd.DataFrame):
        """Write [all, train, val] frames as JSON under ``meta_path``."""
        assert not os.path.exists(meta_path) or os.path.isdir(meta_path)
        os.makedirs(meta_path, exist_ok=True)
        file_paths = [os.path.join(meta_path, name) for name in frame_file_names]
        all_frame.to_json(file_paths[0])
        train_frame.to_json(file_paths[1])
        val_frame.to_json(file_paths[2])


def preprocess_text(args: Tuple[str, float, float]) -> List:
    """Read + regex-clean one text file; returns [text, passed].

    Keeps only basic English characters/punctuation; a row passes when
    len(text)/duration >= min_ratio (always, when min_ratio falsy).
    """
    txt_file, min_ratio, dur = args
    regex = re.compile(r"[a-zA-Z\'\.\,\?\!\ ]+")
    try:
        with open(txt_file, encoding='utf-8') as r:
            txt = r.read().strip()
        txt = ' '.join(m.strip() for m in regex.findall(txt))
        txt_dur = len(' '.join(txt.split()))
        _pass = True if not min_ratio else min_ratio <= (txt_dur / float(dur))
    except Exception:
        txt, _pass = '', False
    return [txt, _pass]
