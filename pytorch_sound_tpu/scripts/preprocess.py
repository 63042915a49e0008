"""Dataset preprocessing CLI: ``python -m pytorch_sound_tpu.scripts.preprocess <cmd> ...``.

API parity target: `/root/reference/pytorch_sound/scripts/preprocess.py` — the
``Processor`` command surface (voice_bank, valenti, libri_tts,
libri_tts_fetch_speaker, vctk, ljspeech, dsd100, musdb18, medleydb, partialize,
zeroth_korean, libri_light, libri_light2) plus shared workers.

Re-architecture notes:
- The reference shelled out to ffmpeg-normalize + sox per file
  (`preprocess.py:32-41,82-88`). Neither binary exists in this image, so WAV
  inputs go through an in-process pipeline (wavio decode -> RMS normalize to
  the ffmpeg-normalize default -23 dB -> polyphase resample -> float32 WAV);
  non-WAV codecs (flac/mp3) fall back to an ffmpeg subprocess when available.
- Idempotent: existing outputs are skipped (restartable, as the reference).
- NEW: ``extract_features`` runs the batched on-device fused Pallas log-mel
  over a processed corpus — the decode->resample->STFT/mel path of BASELINE
  config 1 with the DSP on TPU instead of librosa CPU passes.
"""

import glob
import json
import os
import shutil
import subprocess
from collections import defaultdict
from pathlib import Path
from typing import List, Tuple

import numpy as np
import pandas as pd
from joblib import Parallel, cpu_count, delayed
from tqdm import tqdm

from pytorch_sound_tpu import settings
from pytorch_sound_tpu.data.meta.commons import split_train_val_frame
from pytorch_sound_tpu.data.meta.dsd100 import DSD100Meta
from pytorch_sound_tpu.data.meta.libri_light import LibriLightMeta
from pytorch_sound_tpu.data.meta.libri_tts import LibriTTSMeta
from pytorch_sound_tpu.data.meta.ljspeech import LJSpeechMeta
from pytorch_sound_tpu.data.meta.medleydb import MedleyDBMeta
from pytorch_sound_tpu.data.meta.musdb18 import MUSDB18Meta
from pytorch_sound_tpu.data.meta.valenti import ValentiMeta
from pytorch_sound_tpu.data.meta.vctk import VCTKMeta
from pytorch_sound_tpu.data.meta.voice_bank import VoiceBankMeta
from pytorch_sound_tpu.data.meta.zeroth_korean import ZerothKoreanMeta
from pytorch_sound_tpu.utils.silence import split_on_silence
from pytorch_sound_tpu.utils import wavio

RMS_TARGET_DB = -23.0   # ffmpeg-normalize rms default target level


def _decode_any(in_file: str) -> Tuple[np.ndarray, int]:
    """Decode an audio file to mono float32. WAV natively; other codecs via
    ffmpeg when present."""
    if in_file.lower().endswith('.wav'):
        return wavio.load_wav(in_file, sr=None)
    if shutil.which('ffmpeg'):
        out = subprocess.run(
            ['ffmpeg', '-v', 'error', '-i', in_file, '-f', 'f32le',
             '-ac', '1', '-'],
            capture_output=True, check=True)
        probe = subprocess.run(
            ['ffprobe', '-v', 'error', '-show_entries', 'stream=sample_rate',
             '-of', 'csv=p=0', in_file], capture_output=True, check=True)
        sr = int(probe.stdout.decode().strip().splitlines()[0])
        return np.frombuffer(out.stdout, dtype=np.float32), sr
    raise RuntimeError(
        '{}: non-WAV input needs ffmpeg, which is unavailable'.format(in_file))


def rms_normalize(wav: np.ndarray, target_db: float = RMS_TARGET_DB) -> np.ndarray:
    """Scale to the target RMS level in dBFS (ffmpeg-normalize 'rms' mode)."""
    rms = np.sqrt(np.mean(np.square(wav), dtype=np.float64))
    if rms < 1e-10:
        return wav
    gain = 10 ** (target_db / 20.0) / rms
    return (wav * gain).astype(np.float32)


def process_all(in_file: str, out_file: str, out_sr: int):
    """Decode -> RMS normalize -> resample -> float32 WAV (skip if exists)."""
    if os.path.exists(out_file):
        return
    try:
        wav, sr = _decode_any(in_file)
        # resample first so the RMS target holds on the written signal
        wav = wavio.resample(wav, sr, out_sr)
        wav = rms_normalize(wav)
        wavio.write_wav(out_file, wav, out_sr, dtype='float32')
    except Exception as e:
        print('Failed to process {}: {!r}'.format(in_file, e))


def resample(in_file: str, out_file: str, out_sr: int):
    """Polyphase resample to a new rate (replaces the sox subprocess)."""
    if os.path.exists(out_file):
        return
    wav, sr = _decode_any(in_file)
    wavio.write_wav(out_file, wavio.resample(wav, sr, out_sr), out_sr)


def load_split_numpy(in_file: str, out_file: str, wav_len: int):
    """Chunk a long audio file into fixed-length .npy shards."""
    wav, _ = _decode_any(in_file)
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    for idx in range(0, len(wav) - wav_len, wav_len):
        np.save(out_file.replace('.npy', '.{}.npy'.format(idx)),
                wav[idx: idx + wav_len])


def make_background_numpy(mixture_file: str, vocal_file: str, out_file: str,
                          wav_len: int):
    """background = mixture - vocal, chunked into fixed-length .npy shards."""
    mixture_wav, _ = _decode_any(mixture_file)
    vocal_wav, _ = _decode_any(vocal_file)
    background_wav = mixture_wav - vocal_wav
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    for idx in range(0, len(background_wav) - wav_len, wav_len):
        np.save(out_file.replace('.npy', '.{}.npy'.format(idx)),
                background_wav[idx: idx + wav_len])


def load_and_numpy_audio(in_file: str, out_file: str):
    """Audio file -> mono .npy (big-file load-time optimization)."""
    try:
        wav, _ = _decode_any(in_file)
        if wav.ndim > 1:
            wav = wav[0]
        np.save(out_file, wav)
    except Exception:
        print('Failed to convert on {}'.format(str((in_file, out_file))))


def split_and_save(in_file: str, out_file: str, speaker: int,
                   min_len: float, max_len: float):
    """VAD-style silence chunking of one long file into length-bounded wavs."""
    if not os.path.exists(in_file):
        return [], [], []
    wav, sr = _decode_any(in_file)

    chunks = split_on_silence(
        wav, min_silence_len=5000, silence_thresh=-50,
        seek_step=int(sr * 0.5))

    chunk_paths, chunk_lens = [], []
    for idx, chunk in enumerate(chunks):
        if min_len < len(chunk) < max_len:
            chunk_path = out_file.replace('.wav', '_{}.wav'.format(idx))
            wavio.write_wav(chunk_path, chunk, sr)
            chunk_paths.append(chunk_path)
            chunk_lens.append(len(chunk) / settings.SAMPLE_RATE)
    return chunk_paths, chunk_lens, [speaker] * len(chunk_lens)


def read_and_write(in_file: str, out_file: str):
    """Copy a text file."""
    with open(in_file, 'r') as r, open(out_file, 'w') as w:
        w.write(r.read())


def get_sub_paths(in_dir: str, file_path: str) -> str:
    """Path of ``file_path`` relative to ``in_dir``."""
    sub = file_path.replace(os.path.abspath(in_dir), '')
    return sub[1:] if sub.startswith('/') else sub


def get_sub_dir(in_dir: str, file_path: str) -> str:
    return os.path.dirname(get_sub_paths(in_dir, file_path))


def partialize_npy_wave(npy_path: str, num_partial_sample: int,
                        min_partial_length: int = 0):
    """Split one long .npy wave into numbered fixed-length partials."""
    arr = np.load(npy_path)
    if arr.ndim > 1:
        arr = arr[0]
    num_partial_sample = int(num_partial_sample)

    partial_path_list = []
    for idx, start_idx in enumerate(range(0, len(arr), num_partial_sample)):
        partial_out_path = npy_path.replace('.npy', '_{:05d}.npy'.format(idx + 1))
        partial_arr = arr[start_idx:start_idx + num_partial_sample]
        if min_partial_length and len(partial_arr) < min_partial_length:
            continue
        np.save(partial_out_path, partial_arr)
        partial_path_list.append(partial_out_path)
    return npy_path, partial_path_list


class Processor:
    """fire-style CLI over per-dataset preprocessing pipelines."""

    num_workers = max(1, cpu_count() // 2)

    @staticmethod
    def copy_txt(in_dir: str, out_dir: str):
        """Copy all text files, preserving subdirectories."""
        print('Lookup file list...')
        in_txt_list = glob.glob(os.path.join(in_dir, '**', '*.txt'), recursive=True)

        print('Start to make sub directories...')
        for d in {os.path.join(out_dir, get_sub_dir(in_dir, p)) for p in in_txt_list}:
            os.makedirs(d, exist_ok=True)

        out_txt_list = [os.path.join(out_dir, get_sub_paths(in_dir, p))
                        for p in in_txt_list]
        Parallel(n_jobs=__class__.num_workers)(
            delayed(read_and_write)(*args)
            for args in tqdm(zip(in_txt_list, out_txt_list)))

    @staticmethod
    def _get_wave_file_list(in_dir: str, out_dir: str,
                            ext: str = 'wav') -> Tuple[List[str], List[str]]:
        print('Lookup file list...')
        in_wav_list = glob.glob(os.path.join(in_dir, '**', '*.' + ext),
                                recursive=True)
        print('Start to make sub directories...')
        for d in {os.path.join(out_dir, get_sub_dir(in_dir, p)) for p in in_wav_list}:
            os.makedirs(d, exist_ok=True)
        out_wav_list = [os.path.join(out_dir, get_sub_paths(in_dir, p))
                        for p in in_wav_list]
        return in_wav_list, out_wav_list

    @staticmethod
    def preprocess_audio(in_dir: str, out_dir: str, sample_rate: int = 22050):
        """Normalize + resample every wav under ``in_dir`` into ``out_dir``."""
        in_wav_list, out_wav_list = __class__._get_wave_file_list(in_dir, out_dir)
        Parallel(n_jobs=__class__.num_workers)(
            delayed(process_all)(*args, sample_rate)
            for args in tqdm(zip(in_wav_list, out_wav_list)))

    @staticmethod
    def resample_audio(in_dir: str, out_dir: str, sample_rate: int):
        """Resample every wav under ``in_dir`` into ``out_dir``."""
        in_wav_list, out_wav_list = __class__._get_wave_file_list(in_dir, out_dir)
        Parallel(n_jobs=__class__.num_workers)(
            delayed(resample)(*args, sample_rate)
            for args in tqdm(zip(in_wav_list, out_wav_list)))

    @staticmethod
    def voice_bank(in_dir: str, out_dir: str, min_wav_rate: int = 0,
                   max_wav_rate: int = 9999, sample_rate: int = 22050):
        """VoiceBank: normalize audio, copy texts, emit meta files."""
        print('Start to process audio files!')
        __class__.preprocess_audio(in_dir, out_dir, sample_rate=sample_rate)
        print('Copy text files...')
        __class__.copy_txt(in_dir, out_dir)
        meta_dir = os.path.join(out_dir, 'meta')
        VoiceBankMeta(meta_dir).make_meta(out_dir, min_wav_rate, max_wav_rate, 0)
        print('All processes are finished.')

    @staticmethod
    def valenti(in_dir: str, out_dir: str, min_wav_rate: int = 0,
                max_wav_rate: int = 9999, sample_rate: int = 22050):
        """Valenti (VoiceBank layout): normalize audio, copy texts, emit meta."""
        os.makedirs(out_dir, exist_ok=True)
        print('Start to process audio files!')
        __class__.preprocess_audio(in_dir, out_dir, sample_rate=sample_rate)
        print('Copy text files...')
        __class__.copy_txt(in_dir, out_dir)
        meta_dir = os.path.join(out_dir, 'meta')
        ValentiMeta(meta_dir).make_meta(out_dir, min_wav_rate, max_wav_rate, 0)
        print('All processes are finished.')

    @staticmethod
    def libri_tts(in_dir: str, out_dir: str, target_txt: str = 'normalized',
                  is_clean: bool = False):
        """LibriTTS: restructure, normalize audio, copy texts, emit meta."""
        from pytorch_sound_tpu.scripts.libri_tts.fetch import fetch_structure
        fetch_structure(in_dir, in_dir, target_txt=target_txt, is_clean=is_clean)
        in_dir = os.path.join(in_dir, 'train')
        Processor.preprocess_audio(in_dir, out_dir)
        Processor.copy_txt(in_dir, out_dir)
        meta_dir = os.path.join(out_dir, 'meta')
        LibriTTSMeta(meta_dir).make_meta(
            out_dir, settings.MIN_WAV_RATE, settings.MAX_WAV_RATE,
            settings.MIN_TXT_RATE)

    @staticmethod
    def libri_tts_fetch_speaker(meta_dir: str, speaker_file: str):
        """Join the openslr SPEAKERS.txt table onto existing meta files."""
        print('Load files ...')
        meta_files = [os.path.join(meta_dir, p) for p in LibriTTSMeta.frame_file_names]
        new_columns = ['READER', 'GENDER', 'SUBSET', 'NAME']
        speaker_df = pd.read_csv(speaker_file, sep='\t', header=0,
                                 index_col='READER', names=new_columns)
        print(speaker_df)

        for file_path in meta_files:
            out_path = file_path.replace('.json', '_add.json')
            df = pd.read_json(file_path)
            rows = [speaker_df.loc[int(os.path.basename(p).split('_')[0])]
                    for p in tqdm(df['audio_filename'].values,
                                  desc='{} is processing ...'.format(out_path))]
            for idx, col in enumerate(new_columns[1:]):
                df[col] = [item.values[idx] for item in rows]
            df.to_json(out_path)
        print('Finish !')

    @staticmethod
    def vctk(in_dir: str, out_dir: str, sample_rate: int = 22050):
        """VCTK: normalize audio into <spk>/wav, copy txt, emit meta."""
        print('lookup files...')
        wave_file_list = glob.glob(os.path.join(in_dir, '*', '*', '*.wav'))
        txt_file_list = glob.glob(os.path.join(in_dir, 'txt', '*', '*.txt'))

        print('Make out file list...')
        out_wav_list = []
        for wav_file_path in wave_file_list:
            spk, file_name = wav_file_path.split(os.sep)[-2:]
            out_wav_list.append(os.path.join(out_dir, spk, 'wav', file_name))
        out_txt_list = []
        for txt_file_path in txt_file_list:
            spk, file_name = txt_file_path.split(os.sep)[-2:]
            out_txt_list.append(os.path.join(out_dir, spk, 'txt', file_name))

        print('Make directories...')
        for d in tqdm({os.path.dirname(p) for p in out_wav_list + out_txt_list}):
            os.makedirs(d, exist_ok=True)

        print('Start Audio Processing ...')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(process_all)(*args, sample_rate)
            for args in tqdm(zip(wave_file_list, out_wav_list)))
        Parallel(n_jobs=__class__.num_workers)(
            delayed(read_and_write)(*args)
            for args in tqdm(zip(txt_file_list, out_txt_list)))

        meta_dir = os.path.join(out_dir, 'meta')
        VCTKMeta(meta_dir).make_meta(out_dir, out_wav_list, out_txt_list)

    @staticmethod
    def ljspeech(in_dir: str, out_dir: str, meta_csv_path: str,
                 sample_rate: int = 22050):
        """LJSpeech: normalize wavs + join metadata.csv, emit meta."""
        print('lookup files ...')
        wav_file_list = glob.glob(os.path.join(in_dir, 'wavs', '*.wav'))
        txt_info = pd.read_csv(meta_csv_path, header=None, sep='|')
        txt_info.columns = ['id', 'text', 'normalized_text']

        os.makedirs(os.path.join(out_dir, 'wavs'), exist_ok=True)
        out_dir = os.path.abspath(out_dir)
        out_wav_list = [os.path.join(out_dir, 'wavs', os.path.basename(p))
                        for p in wav_file_list]

        print('Start Audio Processing ...')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(process_all)(*args, sample_rate)
            for args in tqdm(zip(wav_file_list, out_wav_list)))

        meta_dir = os.path.join(out_dir, 'meta')
        LJSpeechMeta(meta_dir).make_meta(out_wav_list, txt_info)

    @staticmethod
    def dsd100(data_dir: str, out_dir: str, wav_subset_len: int = 44100 * 10):
        """DSD100: chunk mixture/vocals into npy shards + derive backgrounds."""
        print('Lookup files ...')
        mixture_list = sorted(glob.glob(
            os.path.join(data_dir, 'Mixtures', '**', '**', 'mixture.wav')))
        vocals_list = sorted(glob.glob(
            os.path.join(data_dir, 'Sources', '**', '**', 'vocals.wav')))

        out_mixture_list, out_vocals_list, out_background_list = [], [], []
        for mixture_path in mixture_list:
            subdir = os.path.basename(os.path.dirname(mixture_path))
            out_mixture_list.append(os.path.join(out_dir, subdir, 'mixture.npy'))
            out_vocals_list.append(os.path.join(out_dir, subdir, 'vocals.npy'))
            out_background_list.append(os.path.join(out_dir, subdir, 'background.npy'))

        print('Save as numpy files..')
        print('- Mixture File')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(load_split_numpy)(*args, wav_subset_len)
            for args in tqdm(zip(mixture_list, out_mixture_list)))
        print('- Vocals File')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(load_split_numpy)(*args, wav_subset_len)
            for args in tqdm(zip(vocals_list, out_vocals_list)))
        print('- Make Background Files')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(make_background_numpy)(*args, wav_subset_len)
            for args in tqdm(zip(mixture_list, vocals_list, out_background_list)))

        meta_dir = os.path.join(out_dir, 'meta')
        DSD100Meta(meta_dir).make_meta(
            out_mixture_list, out_vocals_list, out_background_list)

    @staticmethod
    def musdb18(data_dir: str, wav_subset_len: int = 44100 * 10):
        """MUSDB18-HQ: chunk mixture/vocals wavs into npy shards in place."""
        print('Lookup files ...')
        mixture_list = glob.glob(os.path.join(data_dir, '*', '*', 'mixture.wav'))
        out_mixture_list = [p.replace('.wav', '.npy') for p in mixture_list]
        vocals_list = glob.glob(os.path.join(data_dir, '*', '*', 'vocals.wav'))
        out_vocals_list = [p.replace('.wav', '.npy') for p in vocals_list]

        print('Save as numpy files..')
        print('- Mixture File')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(load_split_numpy)(*args, wav_subset_len)
            for args in tqdm(zip(mixture_list, out_mixture_list)))
        print('- Vocals File')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(load_split_numpy)(*args, wav_subset_len)
            for args in tqdm(zip(vocals_list, out_vocals_list)))

        meta_dir = os.path.join(data_dir, 'meta')
        MUSDB18Meta(meta_dir).make_meta(data_dir)

    @staticmethod
    def medleydb(in_dir: str, wav_subset_seconds: int = 10):
        """MedleyDB: wavs -> npy, vocal-stem matching, partialized meta."""
        print('Lookup wave files ...')
        wav_list = list(map(str, Path(in_dir).glob('**/*.wav')))

        print('Save wave files as numpy ...')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(load_and_numpy_audio)(path, path.replace('.wav', '.npy'))
            for path in tqdm(wav_list))

        meta_dir = os.path.join(in_dir, 'meta')
        MedleyDBMeta(meta_dir).make_meta(in_dir)

        print('Start to make partitions!')
        __class__.partialize(meta_dir, wav_subset_seconds)

    @staticmethod
    def partialize(meta_dir: str, seconds: int):
        """Split every MedleyDB npy referenced in the meta into fixed-length
        partials and rewrite the train/valid metas over the partials."""
        print('Load meta information ...')
        train_file, valid_file = [os.path.join(meta_dir, f)
                                  for f in MedleyDBMeta.frame_file_names[1:]]
        train_meta = MedleyDBMeta(train_file)
        valid_meta = MedleyDBMeta(valid_file)
        sample_length = seconds * train_meta.sr
        target_columns = ['mixture_filename', 'voice_filename']

        read_and_write(train_file, train_file.replace('.json', '_backup.json'))
        read_and_write(valid_file, valid_file.replace('.json', '_backup.json'))

        target_files = []
        for column in target_columns:
            target_files.extend(train_meta.meta[column].values)
            target_files.extend(valid_meta.meta[column].values)

        print('Partializing process is started.')
        results = Parallel(n_jobs=__class__.num_workers)(
            delayed(partialize_npy_wave)(target_file, sample_length, sample_length)
            for target_file in tqdm(target_files))
        partial_keymap = dict(results)

        print('Make new meta, and write it on {}\t{}'.format(train_file, valid_file))
        for meta, out_file in ((train_meta, train_file), (valid_meta, valid_file)):
            info = defaultdict(list)
            for _, series in meta.meta.iterrows():
                mix_parts = partial_keymap[series['mixture_filename']]
                voice_parts = partial_keymap[series['voice_filename']]
                if len(mix_parts) != len(voice_parts):
                    print(str(series))
                    continue
                info['mixture_filename'].extend(mix_parts)
                info['voice_filename'].extend(voice_parts)
            pd.DataFrame(dict(info)).to_json(out_file)

    @staticmethod
    def zeroth_korean(in_dir: str, out_dir: str, sample_rate: int = 22050):
        """Zeroth Korean: flac -> normalized wav + g2p phoneme meta.

        WAV inputs are accepted too (flac needs ffmpeg; the upstream corpus
        ships flac, fixtures/tests ship wav)."""
        text_list = glob.glob(os.path.join(in_dir, 'train_data_01', '*', '*', '*.txt'))
        audio_list = (glob.glob(os.path.join(in_dir, 'train_data_01', '*', '*', '*.flac'))
                      + glob.glob(os.path.join(in_dir, 'train_data_01', '*', '*', '*.wav')))

        os.makedirs(os.path.join(out_dir, 'wavs'), exist_ok=True)
        out_dir = os.path.abspath(out_dir)
        out_wav_list = [
            os.path.join(out_dir, 'wavs',
                         os.path.basename(p).replace('.flac', '.wav'))
            for p in audio_list]

        print('Start Audio Processing ...')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(process_all)(*args, sample_rate)
            for args in tqdm(zip(audio_list, out_wav_list)))

        print('Finish')
        meta_dir = os.path.join(out_dir, 'meta')
        ZerothKoreanMeta(meta_dir).make_meta(out_wav_list, text_list)

    @staticmethod
    def libri_light(in_dir: str, out_dir: str, sample_rate: int = 22050):
        """Libri-Light: normalize flacs, cut VAD chunks from the json meta."""
        os.makedirs(out_dir, exist_ok=True)
        all_files = glob.glob(os.path.join(in_dir, '*', '*', '*'))

        file_info = defaultdict(dict)
        for file_path in all_files:
            file_name = os.path.basename(file_path)
            type_ = file_name.split('.')[-1]
            key = '.'.join(file_name.split('.')[:-1])
            if type_ == 'json':
                with open(file_path, 'r') as r:
                    file_info[key].update(json.load(r))
            else:
                file_info[key]['audio'] = file_path

        temp_dir = os.path.abspath(os.path.join(out_dir, 'temp'))
        os.makedirs(temp_dir, exist_ok=True)
        audio_list, temp_list = [], []
        for key, item in file_info.items():
            temp_file_path = os.path.join(temp_dir, '{}.wav'.format(key))
            item['temp_file_path'] = temp_file_path
            audio_list.append(item['audio'])
            temp_list.append(temp_file_path)

        print('Start Audio Processing ...')
        Parallel(n_jobs=__class__.num_workers)(
            delayed(process_all)(*args, sample_rate)
            for args in tqdm(zip(audio_list, temp_list)))
        print('Audio Processing first phase is done.')

        wav_dir = os.path.join(out_dir, 'wav')
        os.makedirs(wav_dir, exist_ok=True)
        chunk_list, speaker_chunks = [], []
        for key, item in tqdm(list(file_info.items()), desc='Making chunks ...'):
            wav, sr = wavio.load_wav(item['temp_file_path'], sr=None)
            for idx, (begin, end) in enumerate(item['voice_activity']):
                chunk = wav[int(begin * sample_rate):int(end * sample_rate)]
                file_name = '{}_{}_chunk_{:05d}.wav'.format(
                    key, item['speaker'], idx + 1)
                chunk_file_path = os.path.join(wav_dir, file_name)
                wavio.write_wav(chunk_file_path, chunk, sample_rate)
                chunk_list.append(chunk_file_path)
                speaker_chunks.append(item['speaker'])

        print('Finish Audio Processing')
        meta_dir = os.path.join(out_dir, 'meta')
        LibriLightMeta(meta_dir).make_meta(chunk_list, speaker_chunks)

    def libri_light2(self, all_meta: str, out_dir: str,
                     min_duration: float = 2, max_duration: float = 15.):
        """Re-chunk over-long utterances in an existing meta by silence."""
        chunk_dir = os.path.join(out_dir, 'chunks')
        meta_dir = os.path.join(out_dir, 'meta')
        os.makedirs(chunk_dir, exist_ok=True)
        os.makedirs(meta_dir, exist_ok=True)

        df = pd.read_json(all_meta)
        df_under = df[df['duration'] <= max_duration]
        df_upper = df[df['duration'] > max_duration]

        upper_input_list = df_upper['audio_filename']
        upper_output_list = [os.path.join(chunk_dir, os.path.basename(p))
                             for p in upper_input_list]

        print('Start Audio Processing ...')
        results = Parallel(n_jobs=__class__.num_workers)(
            delayed(split_and_save)(
                *args, min_duration * settings.SAMPLE_RATE,
                max_duration * settings.SAMPLE_RATE)
            for args in tqdm(list(zip(upper_input_list, upper_output_list,
                                      df_upper['speaker']))))

        chunk_paths = [p for cp, _, _ in results for p in cp]
        chunk_lens = [l for _, cl, _ in results for l in cl]
        speakers = [s for _, _, sp in results for s in sp]
        assert len(chunk_paths) == len(chunk_lens)

        upper_chunks_df = pd.DataFrame({
            'audio_filename': chunk_paths, 'duration': chunk_lens,
            'speaker': speakers, 'pass': [True] * len(chunk_paths)})

        df_under = df_under.copy()
        df_under.index = pd.Index(range(len(df_under)))
        upper_chunks_df.index = pd.Index(
            range(len(df_under), len(df_under) + len(upper_chunks_df)))
        new_df = pd.concat([df_under, upper_chunks_df])
        new_df = new_df[new_df['duration'] >= min_duration]

        print('Make train / val meta')
        train_meta, val_meta = split_train_val_frame(new_df, val_rate=0.1)
        print('Save meta frames on {}'.format(
            ' '.join(LibriLightMeta.frame_file_names)))
        LibriLightMeta.save_meta(
            LibriLightMeta.frame_file_names, meta_dir, new_df, train_meta, val_meta)

    @staticmethod
    def extract_features(in_dir: str, out_dir: str, batch_size: int = 16,
                         pad_seconds: float = 10.0, sample_rate: int = 22050,
                         precision: str = 'bf16x3', wire: str = 'bf16',
                         h2d: str = 'i16_src', stages: int = 2):
        """NEW (TPU path): batched on-device resample + RMS-normalize +
        fused log-mel.

        The host only PARSES wav files (cheap memcpy decode; native C++
        pthread pipeline when built) — rational resampling to ``sample_rate``,
        per-row RMS normalization (-23 dBFS, masked to each row's true
        length), and the Pallas log-mel all run in one jitted device program
        (`ops.resample.resample_poly` / `rms_normalize`). The host pipeline
        is DOUBLE-BUFFERED against the device: a producer thread decodes
        batch N+1 while the device computes batch N and the main thread
        writes batch N-1's features. Round-1 resampled on the 1-core host
        and was host-bound at ~87 utt/s with the device 70x idle. Writes
        per-utterance (80, T) .npy f32 features at settings.py defaults —
        BASELINE config 1 with ALL DSP on-chip.

        ``wire`` ('bf16' | 'f32' | 'int8') is the device->host feature
        transfer dtype. The tunnel's D2H link is the e2e bottleneck
        (~40 MB/s); 'bf16' halves the dominant cost for ~3 decimal digits
        of log-mel precision (8 mantissa bits: |err| <= ~0.004 relative),
        'int8' quarters it with per-row affine min/max quantization
        (|err| <= range/254, ~0.03 absolute for typical log-mel ranges);
        features are re-expanded to f32 before np.save.

        ``h2d`` is the host->device AUDIO wire (the upload is the other
        tunnel wall — see BENCH_DETAILS 'preprocess_e2e_wire_logmel_delta'
        for the measured log-mel deltas):
          'i16_src'    — int16 at the source rate, device resamples
                         (default; exactest).
          'i16_tgt'    — the native C++ pipeline resamples on the host,
                         int16 wire at the target rate (~0.46x bytes at
                         48k->22.05k; measured log-mel delta ~9e-4 max).
          'mulaw8_tgt' — mu-law-256 companded single-byte wire (~0.23x
                         bytes; delta ~0.1 max / 5e-3 mean — the reference
                         itself stores mu-law-256 waves, settings.MULAW_BINS).
        Both *_tgt wires need the native library and fall back to 'i16_src'
        without it.

        Files are grouped by source sample rate (header-only reads) so each
        group compiles one static-shape device program.

        Approximations vs the reference's resample-then-pad pipeline
        (`/root/reference/pytorch_sound/scripts/preprocess.py:404-455`):
        the end-of-utterance reflect-pad context is mirrored at the SOURCE
        rate before the on-device resample (not after, as the reference
        does), and a file that exactly fills ``pad_seconds`` gets no
        reflected context at all — the final half-window of mel frames can
        deviate slightly in both cases. RMS gain is computed over the row
        content including the small reflected tail (<=n_fft/2 samples), a
        <0.2% gain bias for utterances >= 1 s.
        """
        import queue
        import threading
        from collections import defaultdict

        import jax
        import jax.numpy as jnp
        from pytorch_sound_tpu import native
        from pytorch_sound_tpu.ops.mel import log_mel_spectrogram
        from pytorch_sound_tpu.ops.pallas.logmel import fused_log_mel
        from pytorch_sound_tpu.ops.resample import (resample_out_len,
                                                    resample_poly,
                                                    rms_normalize)

        wav_list = sorted(glob.glob(os.path.join(in_dir, '**', '*.wav'),
                                    recursive=True))
        if jax.process_count() > 1:
            # multi-host corpus: each host extracts a disjoint strided shard
            # (outputs are per-file .npy — no cross-host assembly needed)
            from pytorch_sound_tpu.parallel.data import process_shard_indices
            wav_list = [wav_list[i]
                        for i in process_shard_indices(len(wav_list))]
        os.makedirs(out_dir, exist_ok=True)
        hop = settings.HOP_LENGTH

        groups = defaultdict(list)          # src_sr -> paths
        for path in wav_list:
            try:
                groups[wavio.read_wav_info(path)[0]].append(path)
            except Exception:
                print('skipping unreadable {}'.format(path))

        args = (sample_rate, settings.MEL_SIZE, settings.N_FFT,
                settings.WIN_LENGTH, hop, settings.MIN_DB, settings.MAX_DB,
                settings.MEL_MIN, settings.MEL_MAX)
        on_tpu = jax.default_backend() == 'tpu'
        from pytorch_sound_tpu.utils.commons import enable_compilation_cache
        enable_compilation_cache()   # corpora re-runs skip the jit compiles

        host_resample = h2d in ('i16_tgt', 'mulaw8_tgt') and native.available()

        bar = tqdm(total=len(wav_list), desc='extract_features')
        for src_sr, paths in sorted(groups.items()):
            pad_len = int(pad_seconds * (sample_rate if host_resample
                                         else src_sr))

            @jax.jit
            def run(x, lengths, _src_sr=src_sr, _hr=host_resample):
                if x.dtype == jnp.int16:   # int16 wire: half the H2D bytes
                    x = x.astype(jnp.float32) * (1.0 / 32768.0)
                elif x.dtype == jnp.uint8:   # mu-law-256 wire: 1 byte/sample
                    mu = 255.0
                    yq = x.astype(jnp.float32) * (2.0 / mu) - 1.0
                    x = jnp.sign(yq) * (
                        (jnp.power(1.0 + mu, jnp.abs(yq)) - 1.0) / mu)
                y = x if _hr else resample_poly(x, _src_sr, sample_rate)
                # ffmpeg-normalize RMS parity (-23 dBFS), masked to each
                # row's true resampled length; the reflected tail
                # (<= n_fft/2 samples) adds a <0.2% gain bias for >= 1 s
                # utterances (see the docstring)
                y = rms_normalize(y, lengths=lengths)
                if on_tpu:
                    mel = fused_log_mel(y, *args, precision=precision)
                else:
                    mel = log_mel_spectrogram(y, *args)
                # D2H is the e2e wall (~40 MB/s tunnel); bf16 halves it,
                # int8 (per-row affine min/max quantization) quarters it
                if wire == 'int8':
                    # range over each row's VALID frames only (padded-tail
                    # frames sit at MIN_DB and would inflate the range)
                    n_fr = lengths // hop + 1
                    valid = (jnp.arange(mel.shape[2])[None, None, :]
                             < n_fr[:, None, None])
                    mn = jnp.min(jnp.where(valid, mel, jnp.inf),
                                 axis=(1, 2), keepdims=True)
                    mx = jnp.max(jnp.where(valid, mel, -jnp.inf),
                                 axis=(1, 2), keepdims=True)
                    scale = jnp.maximum(mx - mn, 1e-6) / 254.0
                    q = jnp.round(
                        (jnp.clip(mel, mn, mx) - mn) / scale - 127.0
                    ).astype(jnp.int8)
                    return q, jnp.concatenate(
                        [scale[:, 0, :], mn[:, 0, :]], axis=-1)   # (B, 2)
                return mel.astype(jnp.bfloat16) if wire == 'bf16' else mel

            # source-rate samples that cover the mel's centered half-window
            # (n_fft/2 target samples) — reflected into each row's zero tail
            # so the last frames see the reference's reflect-pad context
            # (wire-rate: target samples directly when the host resampled)
            tail_ext = (settings.N_FFT // 2 + 4 if host_resample else
                        -(-(settings.N_FFT // 2) * src_sr // sample_rate) + 4)

            def reflect_tail(mat, raw_lens, _pad_len=pad_len):
                for i, n in enumerate(raw_lens):
                    n = int(n)
                    e = min(tail_ext, n - 1, _pad_len - n)
                    if e > 0:
                        mat[i, n:n + e] = mat[i, n - e - 1:n - 1][::-1]
                return mat

            def decode_batch(chunk, _pad_len=pad_len, _src_sr=src_sr):
                names = [os.path.splitext(os.path.basename(p))[0]
                         for p in chunk]
                if host_resample:
                    # one C pass: decode -> resample -> reflect-tail ->
                    # quantize (no numpy work on the host thread)
                    mat, raw_lens = native.batch_load_wire(
                        chunk, sample_rate, _pad_len,
                        mode='mulaw8' if h2d == 'mulaw8_tgt' else 'i16',
                        tail_ext=tail_ext)
                    keep = raw_lens >= 0
                    mat, raw_lens = mat[keep], raw_lens[keep]
                    kept = [nm for nm, k in zip(names, keep) if k]
                    lens = [int(n) for n in raw_lens]
                    return (mat if len(mat) else None), lens, kept
                if native.available():
                    # contiguous (n, pad_len) int16 rows straight from disk
                    mat, raw_lens, _ = native.batch_load_i16(chunk, _pad_len)
                    keep = raw_lens >= 0
                    mat, raw_lens = mat[keep], raw_lens[keep]
                    names = [nm for nm, k in zip(names, keep) if k]
                    lens = [resample_out_len(int(n), _src_sr, sample_rate)
                            for n in raw_lens]
                    mat = reflect_tail(mat, raw_lens)
                    return (mat if len(mat) else None), lens, names
                wavs = [wavio.load_wav(p)[0] for p in chunk]
                lens, rows, kept = [], [], []
                for nm, w in zip(names, wavs):
                    if w is None:
                        continue
                    w = w[:_pad_len]
                    lens.append(resample_out_len(len(w), _src_sr, sample_rate))
                    rows.append(np.pad(w, (0, _pad_len - len(w))))
                    kept.append(nm)
                if not rows:
                    return None, lens, kept
                mat = np.stack(rows)
                return reflect_tail(mat, [len(w[:_pad_len]) for w in wavs
                                          if w is not None]), lens, kept

            # ``stages`` picks the overlap structure (A/B'd round 5,
            # benchmarks/probes/results/e2e_r5.log):
            #   2 (default) — decode(N+1) on a producer thread; the main
            #       thread alternates H2D+dispatch(N) with D2H+np.save(N-1),
            #       so upload and fetch RPCs never run concurrently. The
            #       measured winner through a serialized transport (the
            #       axon tunnel: 171 vs 125 utt/s at i16_tgt int8 b64 —
            #       concurrent transfers contend head-of-line instead of
            #       overlapping).
            #   3 — decode(N+1) || H2D+dispatch(N) || D2H+np.save(N-1) on
            #       three threads; the right structure for co-located hosts
            #       where H2D and D2H ride independent DMA engines.
            q = queue.Queue(maxsize=2)         # decoded host batches

            def producer(_paths=paths, _decode=decode_batch, _q=q):
                try:
                    for i in range(0, len(_paths), batch_size):
                        try:
                            _q.put(_decode(_paths[i:i + batch_size]))
                        except Exception as e:   # skip a bad batch, keep going
                            print('decode batch failed: {!r}'.format(e))
                finally:
                    _q.put(None)    # ALWAYS unblock the consumer

            threading.Thread(target=producer, daemon=True).start()

            def dispatch(item, _run=run):
                batch, lens, names = item
                if batch is None:
                    return None
                return (_run(jnp.asarray(batch),
                             jnp.asarray(lens, jnp.int32)), lens, names)

            def write_out(mel_dev, lens, names):
                if isinstance(mel_dev, tuple):  # int8 wire: dequantize
                    q, aff = mel_dev
                    aff = np.asarray(aff)       # blocks until device done
                    scale, mn = aff[:, :1, None], aff[:, 1:, None]
                    mel = (np.asarray(q).astype(np.float32) + 127.0) \
                        * scale + mn
                else:
                    mel = np.asarray(mel_dev)   # blocks until device done
                if mel.dtype != np.float32:     # re-expand the bf16 wire
                    mel = mel.astype(np.float32)
                for i, (n, name) in enumerate(zip(lens, names)):
                    np.save(os.path.join(out_dir, name + '.mel.npy'),
                            mel[i, :, :n // hop + 1])

            if stages >= 3:
                q_dev = queue.Queue(maxsize=2)     # dispatched device results

                def uploader(_q=q, _q_dev=q_dev):
                    try:
                        while True:
                            item = _q.get()
                            if item is None:
                                break
                            out = dispatch(item)
                            if out is not None:
                                _q_dev.put(out)
                    finally:
                        _q_dev.put(None)    # ALWAYS unblock the writer

                threading.Thread(target=uploader, daemon=True).start()
                while True:
                    item = q_dev.get()
                    if item is None:
                        break
                    write_out(item[0], item[1], item[2])
                    bar.update(len(item[2]))
            else:
                pending = None
                while True:
                    item = q.get()
                    if item is None:
                        break
                    out = dispatch(item)       # async H2D + program launch
                    if pending is not None:
                        write_out(*pending)    # D2H + save batch N-1
                        bar.update(len(pending[2]))
                    pending = out
                if pending is not None:
                    write_out(*pending)
                    bar.update(len(pending[2]))
        bar.close()
        print('Finished: {} utterances'.format(len(wav_list)))


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(Processor)
