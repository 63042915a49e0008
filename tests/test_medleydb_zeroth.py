"""End-to-end fixture tests for the MedleyDB and Zeroth-Korean pipelines.

These close the round-1 asset gaps: the vendored sample MedleyDB YAMLs +
fetch script make `preprocess.py medleydb` runnable, and the full KoG2P
rulebook + kophn_dict make the zeroth_korean path complete.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from pytorch_sound_tpu.data.meta.medleydb import MedleyDBMeta, get_datasets
from pytorch_sound_tpu.data.meta.zeroth_korean import ZerothKoreanMeta
from pytorch_sound_tpu.scripts.preprocess import Processor
from pytorch_sound_tpu.utils.wavio import write_wav

ASSETS = os.path.join(os.path.dirname(__file__), '..', 'assets')


def _tone(sr, seconds, freq, seed=0):
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.default_rng(seed)
    return (0.4 * np.sin(2 * np.pi * freq * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def _write_song(root, artist, song, stem_names, sr=44100, seconds=2.5):
    """Mix + the named stems at the MedleyDB on-disk layout."""
    song_dir = os.path.join(root, artist, song)
    stem_dir = os.path.join(song_dir, song + '_STEMS')
    os.makedirs(stem_dir, exist_ok=True)
    write_wav(os.path.join(song_dir, song + '_MIX.wav'),
              _tone(sr, seconds, 220.0), sr)
    for i, name in enumerate(stem_names):
        write_wav(os.path.join(stem_dir, name), _tone(sr, seconds, 330.0 + 50 * i), sr)


@pytest.fixture(scope='module')
def medleydb_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('medleydb'))
    # two songs from the vendored public metadata: one with 2 vocal stems
    # (multi-vocal merge path), one with 1
    _write_song(root, 'AimeeNorwich', 'AimeeNorwich_Child',
                ['AimeeNorwich_Child_STEM_04.wav', 'AimeeNorwich_Child_STEM_05.wav'])
    _write_song(root, 'AHa', 'AHa_TakeOnMe', ['AHa_TakeOnMe_STEM_02.wav'])
    Processor.medleydb(root, wav_subset_seconds=1)
    return root


def test_medleydb_pipeline_end_to_end(medleydb_root):
    meta_dir = os.path.join(medleydb_root, 'meta')
    train_file = os.path.join(meta_dir, 'train_meta.json')
    valid_file = os.path.join(meta_dir, 'val_meta.json')
    assert os.path.exists(train_file) and os.path.exists(valid_file)

    rows = pd.concat([pd.read_json(train_file), pd.read_json(valid_file)])
    assert len(rows) >= 4   # 2 songs x 2.5s -> 2 one-second partials each
    for _, row in rows.iterrows():
        mix = np.load(row['mixture_filename'])
        voice = np.load(row['voice_filename'])
        assert mix.shape == voice.shape == (44100,)


def test_medleydb_multivocal_merge(medleydb_root):
    """Two vocal stems must be summed into one _voice.npy."""
    stem_dir = os.path.join(medleydb_root, 'AimeeNorwich', 'AimeeNorwich_Child',
                            'AimeeNorwich_Child_STEMS')
    merged = np.load(os.path.join(stem_dir, 'AimeeNorwich_Child_STEM_voice.npy'))
    s4 = np.load(os.path.join(stem_dir, 'AimeeNorwich_Child_STEM_04.npy'))
    s5 = np.load(os.path.join(stem_dir, 'AimeeNorwich_Child_STEM_05.npy'))
    np.testing.assert_allclose(merged.squeeze(), s4 + s5, atol=1e-6)


def test_medleydb_loader(medleydb_root):
    meta_dir = os.path.join(medleydb_root, 'meta')
    train, valid = get_datasets(meta_dir, batch_size=2, num_workers=0)
    batch = next(iter(train))
    mix, voice = batch[0], batch[1]
    assert mix.shape[0] == 2 and mix.shape == voice.shape


def test_fetch_medleydb_meta_listing_offline_guarded():
    """The fetch script's pieces are importable and paths point at the
    bundled assets dir (network fetch itself can't run in this sandbox)."""
    from pytorch_sound_tpu.scripts import fetch_medleydb_meta as f
    assert os.path.isdir(f.DEFAULT_OUT_DIR)
    vendored = [n for n in os.listdir(f.DEFAULT_OUT_DIR) if n.endswith('.yaml')]
    assert len(vendored) >= 3   # sample of the public metafiles ships in-repo


@pytest.fixture(scope='module')
def zeroth_root(tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp('zeroth_in'))
    out_dir = str(tmp_path_factory.mktemp('zeroth_out'))
    texts = {
        '103_001_0001': '안녕하세요',
        '103_001_0002': '한국어 음성 합성',
        '205_003_0001': '좋은 날씨네요',
        '205_003_0002': '물고기',
    }
    sr = 22050
    for i, key in enumerate(texts):
        spk, book = key.split('_')[0], key.split('_')[1]
        d = os.path.join(in_dir, 'train_data_01', spk, '{}_{}'.format(spk, book))
        os.makedirs(d, exist_ok=True)
        write_wav(os.path.join(d, key + '.wav'), _tone(sr, 2.5, 150 + 30 * i), sr)
    for key, text in texts.items():
        spk, book = key.split('_')[0], key.split('_')[1]
        d = os.path.join(in_dir, 'train_data_01', spk, '{}_{}'.format(spk, book))
        with open(os.path.join(d, '{}_{}.trans.txt'.format(spk, book)), 'a',
                  encoding='utf-8') as w:
            w.write('{} {}\n'.format(key, text))
    Processor.zeroth_korean(in_dir, out_dir)
    return out_dir


def test_zeroth_korean_pipeline_end_to_end(zeroth_root):
    meta_dir = os.path.join(zeroth_root, 'meta')
    all_file = os.path.join(meta_dir, 'all_meta.json')
    assert os.path.exists(all_file)
    df = pd.read_json(all_file)
    assert len(df) == 4
    assert set(df['speaker'].values) == {0, 1}
    # g2p ran with the full rulebook (물고기 needs its lexical-exception rule)
    row = df[df['text'].str.contains('물고기')].iloc[0]
    assert row['phoneme'] == 'mm uu ll kk oo k0 ii'
    # every wav was normalized + written
    assert len(glob.glob(os.path.join(zeroth_root, 'wavs', '*.wav'))) == 4


def test_zeroth_phonemes_within_inventory(zeroth_root):
    """check_phn_dict contract: every phoneme in the meta is in kophn_dict."""
    inventory = set(open(os.path.join(ASSETS, 'kophn_dict.txt')).read().split())
    df = pd.read_json(os.path.join(zeroth_root, 'meta', 'all_meta.json'))
    used = {p for phns in df['phoneme'].values for p in phns.split()}
    assert used and used <= inventory
