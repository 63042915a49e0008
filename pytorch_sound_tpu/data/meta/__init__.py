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

    #: column types that yield per-sample tensors; META columns are
    #: bookkeeping only and never reach the dataset layer
    _DATA_TYPES = frozenset(
        (MetaType.AUDIO, MetaType.SCALAR, MetaType.MIDI, MetaType.TEXT))

    @property
    def process_columns(self) -> List[Tuple[MetaType, str]]:
        """The subset of :attr:`columns` that produce data points."""
        return [c for c in self.columns if c[0] in self._DATA_TYPES]

    @property
    @abc.abstractmethod
    def columns(self) -> List[Tuple[MetaType, str]]:
        raise NotImplementedError(
            '%s is missing its column declaration' % type(self).__name__)

    @property
    def column_names(self) -> List[str]:
        return [name for _, name in self.columns]

    @property
    @abc.abstractmethod
    def meta(self) -> pd.DataFrame:
        raise NotImplementedError(
            '%s does not build a meta frame' % type(self).__name__)

    @abc.abstractmethod
    def make_meta(self, *args, **kwargs):
        raise NotImplementedError(
            '%s cannot scan a raw dataset into meta JSONs'
            % type(self).__name__)

    @property
    def iloc(self):
        return self.meta.iloc

    def _process_duration(self, wav_file_list: List[str], min_wav_rate: float,
                          max_wav_rate: float) -> List[float]:
        """AND duration bounds into the frame's ``pass`` column.

        Durations are probed by a worker pool; a probe failure reports -1
        and unconditionally fails the row. The (min, max) bound check only
        applies when both bounds are truthy.
        """
        durations = go_multiprocess(get_wav_duration,
                                    [(p,) for p in wav_file_list])

        def keeps(dur: float) -> bool:
            if dur == -1:
                return False
            if not (min_wav_rate and max_wav_rate):
                return True
            return min_wav_rate < dur < max_wav_rate

        self._meta['pass'] = [prev and keeps(d)
                              for prev, d in zip(self._meta['pass'], durations)]
        return durations

    def _process_txt(self, txt_file_list: List[str], dur_list: List[float],
                     min_txt_rate: float):
        """Clean each transcript and AND the chars-per-second gate into ``pass``."""
        jobs = [((path, min_txt_rate, dur),)
                for path, dur in zip(txt_file_list, dur_list)]
        cleaned = go_multiprocess(preprocess_text, jobs)
        self._meta['text'] = [text for text, _ in cleaned]
        self._meta['pass'] = [prev and ok for prev, (_, ok)
                              in zip(self._meta['pass'], cleaned)]

    @staticmethod
    def save_meta(frame_file_names: List[str], meta_path: str,
                  all_frame: pd.DataFrame, train_frame: pd.DataFrame,
                  val_frame: pd.DataFrame):
        """Write the [all, train, val] frames as JSON files under ``meta_path``.

        The JSON layout is pandas ``to_json`` default orientation, byte-level
        interoperable with meta files written by the reference
        (`/root/reference/pytorch_sound/data/meta/__init__.py:115-134`).
        """
        if os.path.exists(meta_path) and not os.path.isdir(meta_path):
            raise NotADirectoryError(meta_path)
        os.makedirs(meta_path, exist_ok=True)
        for name, frame in zip(frame_file_names,
                               (all_frame, train_frame, val_frame)):
            frame.to_json(os.path.join(meta_path, name))


# character set kept by transcript cleanup: basic latin + common punctuation
_TXT_KEEP = re.compile(r"[a-zA-Z'\.,\?! ]+")


def preprocess_text(args: Tuple[str, float, float]) -> List:
    """Worker: read one transcript, strip non-English characters, gate on
    text-length / audio-duration ratio. Returns ``[cleaned_text, passed]``.

    Any read/convert failure yields ``['', False]`` — the row is dropped by
    the ``pass`` filter rather than aborting the scan (matching the
    swallow-and-filter policy of the reference pipeline).
    """
    path, min_ratio, duration = args
    try:
        with open(path, encoding='utf-8') as fh:
            raw = fh.read()
        text = ' '.join(piece.strip() for piece in _TXT_KEEP.findall(raw.strip()))
        if not min_ratio:
            return [text, True]
        n_chars = len(' '.join(text.split()))
        return [text, (n_chars / float(duration)) >= min_ratio]
    except Exception:
        return ['', False]
