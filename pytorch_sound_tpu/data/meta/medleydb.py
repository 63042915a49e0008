"""MedleyDB mix/vocal separation meta (https://github.com/marl/medleydb).

Parity target: `/root/reference/pytorch_sound/data/meta/medleydb.py` — YAML
stem metadata -> vocal track discovery, multi-track vocal merging into a single
npy per song, stratified split on vocal-track count.
"""

import glob
import os
from typing import Dict, List, Tuple

import numpy as np
import yaml

from pytorch_sound_tpu.data.dataset import SpeechDataLoader
from pytorch_sound_tpu.data.meta import MetaType
from pytorch_sound_tpu.data.meta.base import SpeechMetaFrame, make_loaders
from pytorch_sound_tpu.data.meta.commons import split_train_val_frame
from pytorch_sound_tpu.utils.commons import go_multiprocess

MEDLEYDB_META_DIR = os.path.abspath(os.path.join(
    __file__, '..', '..', '..', '..', 'assets', 'medleydb_metafiles'))


class MedleyDBMeta(SpeechMetaFrame):

    default_sr = 44100
    sort_key = None

    @property
    def columns(self) -> List[Tuple[MetaType, str]]:
        return [(MetaType.AUDIO, 'mixture_filename'), (MetaType.AUDIO, 'voice_filename')]

    def make_meta(self, root_dir: str, meta_dir: str = None,
                  filter_non_vocal: bool = True):
        if not meta_dir:
            meta_dir = MEDLEYDB_META_DIR

        print('Load MedleyDB meta info')
        meta = load_meta(meta_dir)
        meta_by_mixkey = {record['mix_filename'].replace('.wav', '.npy'): record
                         for record in meta}

        print('Lookup mix files')
        mix_file_list = [p.replace('.wav', '.npy')
                         for p in glob.glob(os.path.join(root_dir, '**', '**', '*.wav'))]

        print('Matching mix / vocal pairs')
        pair_meta = get_mix_vocal_pairs(mix_file_list, meta_by_mixkey, ext='npy')
        if filter_non_vocal:
            pair_meta = {k: v for k, v in pair_meta.items() if v}

        # multi-vocal songs get their tracks summed into one npy for fast loading
        mix_paths = list(pair_meta.keys())
        print('Merging multi-vocal-tracks ...')
        results = go_multiprocess(load_and_merge_audios, list(pair_meta.items()))

        rows = [(m, r[0], r[1]) for m, r in zip(mix_paths, results) if r != -1]
        mix_results, voice_results, source_numbers = map(list, zip(*rows))

        self._meta['mixture_filename'] = mix_results
        self._meta['voice_filename'] = voice_results
        self._meta['voice_tracks'] = [min(s, 2) for s in source_numbers]

        print('Make train / val meta')
        train_meta, val_meta = split_train_val_frame(
            self._meta, val_rate=0.1, label_key='voice_tracks')
        self.finalize_and_save(train_meta, val_meta)
        print('Done')


def load_and_merge_audios(mix_path: str, audio_npy_list: List[str]):
    """Merge a song's vocal-track npys into one '<stem>voice.npy'.

    Returns (out_path, n_tracks) or -1 on failure (row dropped).
    """
    try:
        if len(audio_npy_list) == 0:
            out_path = mix_path.replace('MIX.npy', '_voice.npy')
            np.save(out_path, np.zeros_like(np.load(mix_path)))
        elif len(audio_npy_list) == 1:
            out_path = audio_npy_list[0][:-6] + 'voice.npy'
            np.save(out_path, np.load(audio_npy_list[0]))
        else:
            out_path = audio_npy_list[0][:-6] + 'voice.npy'
            audios = [np.load(p)[np.newaxis, ...] for p in audio_npy_list]
            np.save(out_path, np.sum(audios, axis=0))
    except Exception:
        return -1
    return out_path, len(audio_npy_list)


def load_meta(dir_path: str) -> List[dict]:
    """Load every YAML metafile in a directory (non-YAML files skipped)."""
    meta_list = []
    for file_name in sorted(os.listdir(dir_path)):
        if not file_name.endswith(('.yaml', '.yml')):
            continue
        with open(os.path.join(dir_path, file_name), 'r') as r:
            meta_list.append(yaml.safe_load(r))
    return meta_list


def get_mix_vocal_pairs(mix_file_list: List[str], meta_by_mixkey: Dict[str, dict],
                        ext: str = None) -> Dict[str, List[str]]:
    """Map each mixture file to the stem files whose instrument contains
    'singer' or 'vocal'."""
    if ext:
        ext = ext if ext.startswith('.') else '.' + ext

    def is_vocal(inst) -> bool:
        return 'singer' in inst or 'vocal' in inst

    vocal_files: Dict[str, List[str]] = {}
    for mix_file_name in mix_file_list:
        key = os.path.basename(mix_file_name)
        audio_dir = os.path.dirname(mix_file_name)
        stem_dir = os.path.join(audio_dir, os.path.basename(audio_dir) + '_STEMS')
        meta = meta_by_mixkey[key]
        vocal_files[mix_file_name] = []
        for val in meta['stems'].values():
            insts = val['instrument'] if isinstance(val['instrument'], list) \
                else [val['instrument']]
            if any(is_vocal(i) for i in insts):
                file_path = val['filename'] if not ext \
                    else val['filename'].replace('.wav', ext)
                vocal_files[mix_file_name].append(os.path.join(stem_dir, file_path))
    return vocal_files


def get_datasets(meta_dir: str, batch_size: int, num_workers: int,
                 fix_len: int = 0, audio_mask: bool = False,
                 pad_multiple: int = 1) -> Tuple[SpeechDataLoader, SpeechDataLoader]:
    return make_loaders(
        MedleyDBMeta, meta_dir, batch_size, num_workers,
        dataset_kwargs=dict(fix_len=fix_len, audio_mask=audio_mask),
        train_loader_kwargs=dict(is_bucket=False),
        valid_loader_kwargs=dict(is_bucket=False),
        pad_multiple=pad_multiple)


if __name__ == '__main__':
    import sys
    input_dir = sys.argv[1]
    MedleyDBMeta(os.path.join(input_dir, 'meta')).make_meta(input_dir)
