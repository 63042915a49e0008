"""Data layer tests with synthetic audio fixtures (no downloads; SURVEY.md §4)."""

import os

import numpy as np
import pandas as pd
import pytest

from pytorch_sound_tpu.data.dataset import (BucketRandomBatchSampler,
                                            SpeechDataLoader, SpeechDataset)
from pytorch_sound_tpu.data.meta import MetaType, preprocess_text
from pytorch_sound_tpu.data.meta.commons import split_train_val_frame
from pytorch_sound_tpu.data.meta.vctk import VCTKMeta, get_datasets as vctk_datasets
from pytorch_sound_tpu.data.meta.voice_bank import (VoiceBankMeta,
                                                    get_datasets as vb_datasets)
from pytorch_sound_tpu.data.meta.dsd100 import DSD100Meta, get_datasets as dsd_datasets
from pytorch_sound_tpu.utils.wavio import write_wav

SR = 22050


def _make_vctk_tree(root, n_speakers=3, n_utts=8, rng=None):
    rng = rng or np.random.default_rng(0)
    for s in range(n_speakers):
        spk = 'p%03d' % (225 + s)
        os.makedirs(os.path.join(root, spk, 'wav'), exist_ok=True)
        os.makedirs(os.path.join(root, spk, 'txt'), exist_ok=True)
        for u in range(n_utts):
            dur = rng.uniform(2.5, 5.0)
            wav = rng.standard_normal(int(SR * dur)).astype(np.float32) * 0.1
            key = '%s_%03d' % (spk, u)
            write_wav(os.path.join(root, spk, 'wav', key + '.wav'), wav, SR)
            with open(os.path.join(root, spk, 'txt', key + '.txt'), 'w') as w:
                w.write('hello number %d from speaker %s.' % (u, spk))


@pytest.fixture(scope='module')
def vctk_meta_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('vctk_raw'))
    meta = str(tmp_path_factory.mktemp('vctk_meta'))
    _make_vctk_tree(root)
    VCTKMeta(meta).make_meta(root)
    return meta


def test_vctk_make_meta_and_load(vctk_meta_dir):
    files = sorted(os.listdir(vctk_meta_dir))
    assert files == ['all_meta.json', 'train_meta.json', 'val_meta.json']
    meta = VCTKMeta(os.path.join(vctk_meta_dir, 'all_meta.json'))
    assert len(meta) == 24
    assert meta.num_speakers == 3
    # duration-sorted
    durs = meta.meta['duration'].values
    assert (np.diff(durs) >= 0).all()


def test_speech_dataset_fields(vctk_meta_dir):
    meta = VCTKMeta(os.path.join(vctk_meta_dir, 'all_meta.json'))
    ds = SpeechDataset(meta)
    item = ds[0]
    # columns: audio, speaker, text (META 'duration' filtered)
    assert len(item) == 3
    wav, speaker, text = item
    assert isinstance(wav, np.ndarray) and wav.ndim == 1
    assert isinstance(speaker, int)
    assert isinstance(text, np.ndarray)  # eng_t2i indices with EOS


def test_speech_dataset_fix_len_and_mask(vctk_meta_dir):
    meta = VCTKMeta(os.path.join(vctk_meta_dir, 'all_meta.json'))
    ds = SpeechDataset(meta, fix_len=SR, audio_mask=True)
    item = ds[3]
    wav, speaker, text, mask = item
    assert len(wav) == SR
    assert mask.shape == wav.shape and (mask == 1).all()


def test_speech_dataset_extra_features(vctk_meta_dir):
    meta = VCTKMeta(os.path.join(vctk_meta_dir, 'all_meta.json'))
    ds = SpeechDataset(meta, fix_len=SR,
                       extra_features=[('audio_filename', lambda w: np.float64(np.abs(w).mean()))])
    item = ds[0]
    assert len(item) == 4
    assert item[3] > 0


def test_vctk_get_datasets_iteration(vctk_meta_dir):
    train_loader, valid_loader = vctk_datasets(vctk_meta_dir, batch_size=2,
                                               num_workers=0, fix_len=0)
    n = 0
    for batch in train_loader:
        wav, speaker, text = batch
        assert wav.ndim == 2 and wav.shape[0] == 2
        assert speaker.dtype == np.int64
        n += 1
    assert n == len(train_loader)
    for batch in valid_loader:
        pass


def test_loader_threaded_prefetch(vctk_meta_dir):
    train_loader, _ = vctk_datasets(vctk_meta_dir, batch_size=2, num_workers=2)
    batches = list(train_loader)
    assert len(batches) == len(train_loader)


def test_pad_multiple_quantizes_time_axis(vctk_meta_dir):
    train_loader, _ = vctk_datasets(vctk_meta_dir, batch_size=4, num_workers=0,
                                    pad_multiple=16384)
    shapes = set()
    n_batches = 0
    for batch in train_loader:
        assert batch[0].shape[-1] % 16384 == 0
        shapes.add(batch[0].shape[-1])
        n_batches += 1
    # quantized padding collapses near-equal bucket lengths onto shared shapes
    assert len(shapes) < n_batches


def test_bucket_sampler_batches():
    class FakeDS:
        def __len__(self):
            return 103

    s = BucketRandomBatchSampler(FakeDS(), n_buckets=5, batch_size=4)
    batches = list(iter(s))
    assert len(batches) == len(s)
    assert all(len(b) == 4 for b in batches)
    # batches come from contiguous (length-sorted) buckets
    for b in batches:
        assert max(b) - min(b) < s.bucket_size


def test_pad_collate_int_and_ragged():
    batch = [[np.ones(5, np.float32), 3], [np.ones(7, np.float32), 4]]
    out = SpeechDataLoader.pad_collate_fn(batch)
    assert out[0].shape == (2, 7)
    assert out[0][0, 5:].sum() == 0
    np.testing.assert_array_equal(out[1], [3, 4])

    out = SpeechDataLoader.pad_collate_fn(batch, pad_multiple=8)
    assert out[0].shape == (2, 8)


def test_preprocess_text_filter(tmp_path):
    p = os.path.join(tmp_path, 't.txt')
    with open(p, 'w') as w:
        w.write('  Hello, world! 123 #$%  ')
    txt, passed = preprocess_text((p, 0, 3.0))
    assert passed
    assert '#' not in txt and 'Hello, world!' in txt
    # unreadable file -> fail
    txt, passed = preprocess_text(('/nonexistent', 0, 3.0))
    assert not passed and txt == ''


def test_split_train_val_stratified():
    df = pd.DataFrame({'speaker': [0] * 20 + [1] * 20, 'x': range(40)})
    train, val = split_train_val_frame(df, val_rate=0.25)
    assert len(val) == 10
    assert set(val['speaker']) == {0, 1}   # stratified over speakers


@pytest.fixture(scope='module')
def voicebank_meta_dir(tmp_path_factory):
    rng = np.random.default_rng(1)
    root = str(tmp_path_factory.mktemp('vb_raw'))
    meta = str(tmp_path_factory.mktemp('vb_meta'))
    for phase in ('trainset', 'validset'):
        for kind in ('clean', 'noisy'):
            d = os.path.join(root, '%s_%s_wav' % (phase, kind))
            os.makedirs(d, exist_ok=True)
    txt_dir = os.path.join(root, 'testset_txt')
    os.makedirs(txt_dir, exist_ok=True)
    # real VoiceBank has disjoint utterance keys per phase
    for phase, spk_base in (('trainset', 230), ('validset', 240)):
        for s in range(2):
            for u in range(4):
                key = 'p%03d_%03d' % (spk_base + s, u)
                dur = rng.uniform(2.5, 4.0)
                clean = rng.standard_normal(int(SR * dur)).astype(np.float32) * 0.1
                noisy = clean + 0.05 * rng.standard_normal(len(clean)).astype(np.float32)
                write_wav(os.path.join(root, '%s_clean_wav' % phase, key + '.wav'), clean, SR)
                write_wav(os.path.join(root, '%s_noisy_wav' % phase, key + '.wav'), noisy, SR)
                with open(os.path.join(txt_dir, key + '.txt'), 'w') as w:
                    w.write('utterance %d.' % u)
    VoiceBankMeta(meta).make_meta(root, 2, 15, 0)
    return meta


def test_voicebank_pipeline(voicebank_meta_dir):
    train_loader, valid_loader = vb_datasets(voicebank_meta_dir, batch_size=2,
                                             num_workers=0, fix_len=16384)
    batch = next(iter(train_loader))
    noisy, clean, speaker, text = batch
    assert noisy.shape == clean.shape == (2, 16384)
    # the shared random crop start keeps noisy/clean aligned
    assert np.corrcoef(noisy[0], clean[0])[0, 1] > 0.8


@pytest.fixture(scope='module')
def dsd_meta_dir(tmp_path_factory):
    rng = np.random.default_rng(2)
    root = str(tmp_path_factory.mktemp('dsd_raw'))
    meta = str(tmp_path_factory.mktemp('dsd_meta'))
    mixtures, vocals, backgrounds = [], [], []
    for song in range(3):
        d = os.path.join(root, 'song%d' % song)
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            v = rng.standard_normal(44100).astype(np.float32) * 0.1
            b = rng.standard_normal(44100).astype(np.float32) * 0.1
            np.save(os.path.join(d, 'mixture.%d.npy' % i), v + b)
            np.save(os.path.join(d, 'voice.%d.npy' % i), v)
            np.save(os.path.join(d, 'background.%d.npy' % i), b)
        mixtures.append(os.path.join(d, 'mixture.npy'))
        vocals.append(os.path.join(d, 'voice.npy'))
        backgrounds.append(os.path.join(d, 'background.npy'))
    DSD100Meta(meta).make_meta(mixtures, vocals, backgrounds)
    return meta


def test_dsd100_pipeline(dsd_meta_dir):
    train_loader, valid_loader = dsd_datasets(dsd_meta_dir, batch_size=2,
                                              num_workers=0, fix_len=16384)
    total = 0
    for mixture, voice, background in train_loader:
        assert mixture.shape[-1] == 16384
        np.testing.assert_allclose(mixture, voice + background, atol=1e-6)
        total += mixture.shape[0]
    assert total > 0
