"""End-to-end tests for the separation (DSD100) and Maestro transcription paths."""

import os
import struct

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd
import pytest

from pytorch_sound_tpu.data.meta.dsd100 import DSD100Meta, get_datasets as dsd_datasets
from pytorch_sound_tpu.data.meta.maestro import MaestroMeta, get_datasets as maestro_datasets
from pytorch_sound_tpu.examples.dsd100 import DSD100Trainer
from pytorch_sound_tpu.examples.maestro import MaestroTrainer
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.separation  # noqa: F401
import pytorch_sound_tpu.models.transcription  # noqa: F401
from pytorch_sound_tpu.utils.wavio import write_wav


def test_spec_unet_shapes():
    model = build_model('spec_unet_small')
    mag = jnp.abs(jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 513, 40)), dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0), mag)
    mask = model.apply(params, mag)
    assert mask.shape == (2, 513, 40)
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1).all()


def test_frame_pitch_shapes():
    model = build_model('frame_pitch_small')
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((2, 80, 64)),
                      dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)
    logits = model.apply(params, mel)
    assert logits.shape == (2, 128, 64)


@pytest.fixture(scope='module')
def dsd_meta_dir(tmp_path_factory):
    rng = np.random.default_rng(3)
    root = str(tmp_path_factory.mktemp('dsd_sep'))
    meta = str(tmp_path_factory.mktemp('dsd_sep_meta'))
    mixtures, vocals, backgrounds = [], [], []
    for song in range(3):
        d = os.path.join(root, 'song%d' % song)
        os.makedirs(d)
        for i in range(4):
            v = (0.2 * np.sin(2 * np.pi * 440 * np.arange(44100) / 44100
                              + song)).astype(np.float32)
            b = (0.1 * rng.standard_normal(44100)).astype(np.float32)
            np.save(os.path.join(d, 'mixture.%d.npy' % i), v + b)
            np.save(os.path.join(d, 'voice.%d.npy' % i), v)
            np.save(os.path.join(d, 'background.%d.npy' % i), b)
        mixtures.append(os.path.join(d, 'mixture.npy'))
        vocals.append(os.path.join(d, 'voice.npy'))
        backgrounds.append(os.path.join(d, 'background.npy'))
    DSD100Meta(meta).make_meta(mixtures, vocals, backgrounds)
    return meta


def test_dsd100_separation_end_to_end(dsd_meta_dir, tmp_path):
    train_loader, valid_loader = dsd_datasets(
        dsd_meta_dir, batch_size=2, num_workers=0, fix_len=16384,
        pad_multiple=16384)
    t = DSD100Trainer(
        build_model('spec_unet_small'), optax.adam(1e-3),
        train_loader, valid_loader, max_step=4, valid_max_step=2,
        save_interval=4, log_interval=2, save_dir=str(tmp_path),
        save_prefix='sep', sr=44100, seed=5)
    best = t.run()
    assert np.isfinite(best)
    assert os.path.exists(os.path.join(
        str(tmp_path), 'models', 'sep', 'SpectrogramUNet', 'step_000004.chkpt'))


def _write_tiny_midi(path, pitches=(60, 64, 67)):
    track = b'\x00' + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, 'big')
    for p in pitches:
        track += b'\x00' + bytes([0x90, p, 90])
    # delta 192 ticks (2 beats) as a proper varlen: 0x81 0x40
    track += bytes([0x81, 0x40]) + bytes([0x80, pitches[0], 0])
    for p in pitches[1:]:
        track += b'\x00' + bytes([0x80, p, 0])
    track += b'\x00' + bytes([0xFF, 0x2F, 0x00])
    data = b'MThd' + struct.pack('>IHHH', 6, 0, 1, 96)
    data += b'MTrk' + struct.pack('>I', len(track)) + track
    with open(path, 'wb') as f:
        f.write(data)


@pytest.fixture(scope='module')
def maestro_meta_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('maestro'))
    rng = np.random.default_rng(4)
    rows = {'audio_filename': [], 'midi_filename': [], 'duration': [],
            'split': []}
    os.makedirs(os.path.join(root, 'data'))
    for i in range(12):
        wav_rel = 'data/perf%d.wav' % i
        mid_rel = 'data/perf%d.midi' % i
        wav = (0.1 * rng.standard_normal(44100 * 2)).astype(np.float32)
        write_wav(os.path.join(root, wav_rel), wav, 44100)
        _write_tiny_midi(os.path.join(root, mid_rel))
        rows['audio_filename'].append(wav_rel)
        rows['midi_filename'].append(mid_rel)
        rows['duration'].append(2.0)
        rows['split'].append('train')
    pd.DataFrame(rows).to_json(os.path.join(root, 'maestro-v1.0.0.json'))
    MaestroMeta(os.path.join(root, 'maestro-v1.0.0.json')).make_meta()
    return root


def test_maestro_meta_and_loader(maestro_meta_dir):
    train_loader, valid_loader = maestro_datasets(
        maestro_meta_dir, batch_size=2, num_workers=0, fix_len=32768,
        pad_multiple=32768)
    batch = next(iter(train_loader))
    audio, roll = batch[0], batch[1]
    assert audio.shape == (2, 32768)
    assert roll.shape[1] == 128    # (N, 128, T_roll)


def test_maestro_end_to_end(maestro_meta_dir, tmp_path):
    train_loader, valid_loader = maestro_datasets(
        maestro_meta_dir, batch_size=2, num_workers=0, fix_len=32768,
        pad_multiple=32768)
    t = MaestroTrainer(
        build_model('frame_pitch_small'), optax.adamw(1e-3),
        train_loader, valid_loader, max_step=3, valid_max_step=1,
        save_interval=3, log_interval=2, save_dir=str(tmp_path),
        save_prefix='maestro', sr=44100, seed=6)
    best = t.run()
    assert np.isfinite(best)


def test_separate_inference(dsd_meta_dir, tmp_path):
    """Separation inference: masks sum to the mixture reconstruction."""
    from pytorch_sound_tpu.examples.dsd100 import DSD100Trainer, separate
    train_loader, valid_loader = dsd_datasets(
        dsd_meta_dir, batch_size=2, num_workers=0, fix_len=16384,
        pad_multiple=16384)
    t = DSD100Trainer(
        build_model('spec_unet_small'), optax.adam(1e-3),
        train_loader, valid_loader, max_step=2, valid_max_step=1,
        save_interval=10, log_interval=10, save_dir=str(tmp_path),
        save_prefix='sep_inf', sr=44100, seed=8)
    t.run()

    rng = np.random.default_rng(9)
    mix = jnp.asarray(rng.standard_normal((1, 16384)).astype(np.float32) * 0.2)
    voice, background = separate(t.model, t.params, mix)
    assert voice.shape == background.shape == (1, 16384)
    # complementary masks: voice + background reconstruct the mixture
    rec = np.asarray(voice + background)
    np.testing.assert_allclose(rec[0, 1024:-1024], np.asarray(mix)[0, 1024:-1024],
                               atol=1e-3)


def test_dsd100_main_entrypoint(dsd_meta_dir, tmp_path):
    """The CLI-facing main() wires loaders/registry/trainer correctly."""
    from pytorch_sound_tpu.examples.dsd100 import main
    best = main(dsd_meta_dir, str(tmp_path), batch_size=2, num_workers=0,
                fix_len=16384, max_step=2, valid_max_step=1, save_interval=2,
                log_interval=2, arch='spec_unet_small', use_mesh=False)
    assert np.isfinite(best)


def test_maestro_main_entrypoint(maestro_meta_dir, tmp_path):
    from pytorch_sound_tpu.examples.maestro import main
    best = main(maestro_meta_dir, str(tmp_path), batch_size=2, num_workers=0,
                fix_len=32768, max_step=2, valid_max_step=1, save_interval=2,
                log_interval=2, arch='frame_pitch_small', use_mesh=False)
    assert np.isfinite(best)


def test_maestro_main_entrypoint_on_mesh(maestro_meta_dir, tmp_path):
    """BASELINE config 5: Maestro training data-parallel over the (virtual)
    8-device mesh, with the per-step on-device STFT inside the sharded
    program (batch must divide the mesh: 8)."""
    from pytorch_sound_tpu.examples.maestro import main
    best = main(maestro_meta_dir, str(tmp_path), batch_size=8, num_workers=0,
                fix_len=32768, max_step=2, valid_max_step=1, save_interval=2,
                log_interval=2, arch='frame_pitch_small', use_mesh=True)
    assert np.isfinite(best)
