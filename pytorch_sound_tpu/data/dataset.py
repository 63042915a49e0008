"""Generic speech dataset + loader driven by MetaFrame columns.

API parity target: `/root/reference/pytorch_sound/data/dataset.py`
(SpeechDataset / BucketRandomBatchSampler / SpeechDataLoader) — rebuilt without
torch:

- :class:`SpeechDataset` loads numpy samples per typed meta column.
- :class:`SpeechDataLoader` is an iterable of collated **numpy** batches with a
  thread-pool prefetch pipeline in place of torch worker processes; batches are
  zero-padded per field, with an optional ``pad_multiple`` that rounds the
  time axis up so XLA sees a small, finite set of static shapes (bucketed
  length-sorted batches + quantized padding = bounded recompilation, the
  TPU replacement for fully-dynamic pad-to-batch-max).
- Device transfer is the trainer's job (``jax.device_put`` double-buffered);
  ``pin_memory`` is accepted for API compatibility and ignored.
"""

import math
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, List, Tuple

import numpy as np

from pytorch_sound_tpu.data.meta import MetaFrame, MetaType
from pytorch_sound_tpu.utils.sound import parse_midi
from pytorch_sound_tpu.utils.text import eng_t2i
from pytorch_sound_tpu.utils.wavio import load_wav


class SpeechDataset:
    """Map-style dataset over a MetaFrame (reference `dataset.py:14-125`)."""

    def __init__(self, meta_frame: MetaFrame, fix_len: int = 0, fix_shuffle: bool = False,
                 skip_audio: bool = False, audio_mask: bool = False,
                 extra_features: List[Tuple[str, Callable]] = None):
        """
        :param meta_frame: MetaFrame instance describing the data
        :param fix_len: random-crop audio columns to this many samples (0 = off)
        :param fix_shuffle: re-randomize the crop start per audio column
        :param skip_audio: drop AUDIO columns entirely
        :param audio_mask: append a ones-mask matching the first audio column
        :param extra_features: [(column_name, fn)] computed features appended last
        """
        self.meta_frame = meta_frame
        self.fix_len = fix_len
        self.fix_shuffle = fix_shuffle
        self.cols = self.meta_frame.process_columns
        self.audio_mask = audio_mask
        self.extra_features = extra_features

        if self.extra_features:
            column_names = [name for _, name in self.meta_frame.columns]
            assert all(name in column_names for name, _ in extra_features), \
                'Unmatched extra_feature name! {} {}'.format(str(column_names), str(extra_features))
            self.target_idx_map = {name: idx for idx, (_, name)
                                   in enumerate(self.meta_frame.process_columns)}

        if skip_audio:
            self.cols = [(t, name) for (t, name) in self.cols if t != MetaType.AUDIO]

    def __getitem__(self, idx: int) -> List:
        return self.handle_fields(self.meta_frame.iloc[idx])

    def handle_fields(self, meta_item) -> List:
        """Load one data point: per-column load + shared random crop + mask."""
        results = []
        mask = None
        start_idx = -1

        for type_, name in self.cols:
            if type_ == MetaType.AUDIO:
                item = self.load_audio(meta_item[name])
                if self.fix_len:
                    if start_idx == -1 or self.fix_shuffle:
                        start_idx = np.random.randint(0, max(1, len(item) - self.fix_len + 1))
                    item = item[start_idx:start_idx + self.fix_len]
                if self.audio_mask and mask is None:
                    mask = np.ones_like(item)
            elif type_ == MetaType.MIDI:
                item = self.load_midi(meta_item[name])
            elif type_ == MetaType.SCALAR:
                item = int(meta_item[name])
            elif type_ == MetaType.TEXT:
                item = self.load_txt(meta_item[name])
            else:
                raise NotImplementedError('{} is not implemented !'.format(name))
            results.append(item)

        if self.extra_features:
            for name, func in self.extra_features:
                results.append(func(results[self.target_idx_map[name]]))

        if mask is not None:
            results.append(mask)
        return results

    def load_audio(self, file_path: str) -> np.ndarray:
        if file_path.endswith('.wav'):
            wav, sr = load_wav(file_path, sr=None)
            assert sr == self.meta_frame.sr, \
                'sample rate miss match.\n {}\t {} in {}'.format(
                    self.meta_frame.sr, sr, file_path)
        elif file_path.endswith('.npy'):
            wav = np.load(file_path)
        else:
            raise NotImplementedError(
                '{} : File Type is not implemented to load audio data !'.format(file_path))
        return wav

    @staticmethod
    def load_midi(file_path: str) -> np.ndarray:
        """MIDI file -> (128, T) piano roll."""
        return parse_midi(file_path).get_piano_roll()

    @staticmethod
    def load_txt(txt: str) -> np.ndarray:
        return eng_t2i(txt)

    def __len__(self) -> int:
        return len(self.meta_frame)


class BucketRandomBatchSampler:
    """Split the (duration-sorted) index space into contiguous buckets; draw
    batches from a random bucket so batch lengths are similar
    (reference `dataset.py:128-167`)."""

    def __init__(self, data_source, n_buckets: int, batch_size: int,
                 skip_last_bucket: bool = False):
        assert len(data_source) > n_buckets * batch_size, \
            'Data size is too small to use bucket sampler !'
        if n_buckets <= 0:
            raise ValueError('the num of buckets has to be a positive value.')
        self.n_buckets = n_buckets
        self.data_size = len(data_source)
        self.batch_size = batch_size
        self.bucket_size = int(math.ceil(self.data_size / self.n_buckets))
        self.bucket_size -= self.bucket_size % batch_size
        self.skip_last_bucket = skip_last_bucket

    @property
    def buckets(self):
        return [list(range(i * self.bucket_size, (i + 1) * self.bucket_size))
                for i in range(self.n_buckets - int(self.skip_last_bucket))]

    def __iter__(self):
        buckets = self.buckets
        for idx in range(len(buckets)):
            np.random.shuffle(buckets[idx])
        while buckets:
            bucket_id = np.random.choice(range(len(buckets)))
            ids = buckets[bucket_id][-self.batch_size:]
            buckets[bucket_id] = buckets[bucket_id][:-self.batch_size]
            if not buckets[bucket_id]:
                buckets.pop(bucket_id)
            yield ids

    def __len__(self):
        return self.bucket_size * self.n_buckets // self.batch_size


class SpeechDataLoader:
    """Iterable of zero-pad-collated numpy batches with threaded prefetch.

    Constructor signature matches the reference loader
    (`dataset.py:170-194`); ``pin_memory`` is accepted and ignored (device
    transfer is the consumer's job).  ``pad_multiple`` additionally rounds the
    trailing (time) axis of padded fields up to a multiple, bounding the set of
    shapes XLA must compile for.
    """

    def __init__(self, dataset: SpeechDataset, batch_size: int, num_workers: int = 0,
                 n_buckets: int = 10, is_bucket: bool = False, is_shuffle: bool = False,
                 skip_last_bucket: bool = False, pin_memory: bool = True,
                 drop_last: bool = False, pad_multiple: int = 1,
                 prefetch_batches: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(0, num_workers)
        self.is_shuffle = is_shuffle
        self.drop_last = drop_last
        self.pad_multiple = pad_multiple
        self.prefetch_batches = max(1, prefetch_batches)
        self.batch_sampler = None
        if is_bucket:
            self.batch_sampler = BucketRandomBatchSampler(
                dataset, n_buckets=n_buckets, batch_size=batch_size,
                skip_last_bucket=skip_last_bucket)

    def _batch_indices(self):
        if self.batch_sampler is not None:
            yield from self.batch_sampler
            return
        idx = np.arange(len(self.dataset))
        if self.is_shuffle:
            np.random.shuffle(idx)
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            yield list(chunk)

    def _load_batch(self, ids: List[int]) -> List[Any]:
        return self.pad_collate_fn([self.dataset[i] for i in ids],
                                   pad_multiple=self.pad_multiple)

    def __iter__(self):
        if self.num_workers <= 0:
            for ids in self._batch_indices():
                yield self._load_batch(ids)
            return
        # pipelined: keep `prefetch_batches` batch-futures in flight
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            it = self._batch_indices()
            try:
                for _ in range(self.prefetch_batches):
                    pending.append(pool.submit(self._load_batch, next(it)))
            except StopIteration:
                it = iter(())
            for ids in it:
                nxt = pool.submit(self._load_batch, ids)
                yield pending.pop(0).result()
                pending.append(nxt)
            while pending:
                yield pending.pop(0).result()

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    @staticmethod
    def pad_collate_fn(batch: List[Any], pad_multiple: int = 1) -> List[np.ndarray]:
        """Per-field collation: ints -> int64 vector, ragged arrays ->
        zero-padded stack (time axis rounded up to ``pad_multiple``)."""
        result = []
        for i in range(len(batch[0])):
            sub_batch = [x[i] for x in batch]
            first = sub_batch[0]
            if not isinstance(first, np.ndarray):
                assert all(type(x) == type(first) for x in sub_batch[1:])
                if isinstance(first, int):
                    result.append(np.asarray(sub_batch, dtype=np.int64))
                elif isinstance(first, float):
                    result.append(np.asarray(sub_batch, dtype=np.float64))
                else:
                    result.append(np.asarray(sub_batch))
            else:
                result.append(__class__._pad_zero(sub_batch, pad_multiple))
        return result

    @staticmethod
    def _pad_zero(sub_batch: List[np.ndarray], pad_multiple: int = 1) -> np.ndarray:
        dims = [b.shape for b in sub_batch]
        max_dims = [max(d[i] for d in dims) for i in range(len(dims[0]))]
        if pad_multiple > 1:
            # quantize the time axis. The full quantum applies to 1-D float
            # fields (raw audio); frame-rate features (piano rolls, mels) and
            # int fields (text ids) are far shorter per step, so cap their
            # quantum to bound padding waste while still limiting shape counts
            is_audio = (np.issubdtype(sub_batch[0].dtype, np.floating)
                        and len(max_dims) == 1)
            quantum = pad_multiple if is_audio else min(pad_multiple, 32)
            max_dims[-1] = int(math.ceil(max_dims[-1] / quantum)) * quantum
        out = np.zeros((len(sub_batch), *max_dims), dtype=sub_batch[0].dtype)
        for i, b in enumerate(sub_batch):
            out[i][tuple(slice(0, s) for s in b.shape)] = b
        return out


if __name__ == '__main__':
    import sys
    from pytorch_sound_tpu.data.meta.libri_tts import LibriTTSMeta

    meta = LibriTTSMeta(sys.argv[1])
    print(len(SpeechDataset(meta)))
