"""End-to-end slice: VoiceBank enhancement through every layer
(settings -> wavio -> meta -> loader -> registry -> on-device STFT -> trainer).
BASELINE config 2 / SURVEY.md §7 step 5."""

import os

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import optax
import pytest

from pytorch_sound_tpu.data.meta.voice_bank import VoiceBankMeta, get_datasets
from pytorch_sound_tpu.examples.voice_bank import VoiceBankTrainer
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.enhancement  # noqa: F401 (registration)
from pytorch_sound_tpu.parallel import make_mesh
from pytorch_sound_tpu.utils.wavio import write_wav

SR = 22050
FIX_LEN = 8192


@pytest.fixture(scope='module')
def vb_meta_dir(tmp_path_factory):
    rng = np.random.default_rng(5)
    root = str(tmp_path_factory.mktemp('vb_raw'))
    meta = str(tmp_path_factory.mktemp('vb_meta'))
    for phase, spk in (('trainset', 'p280'), ('validset', 'p281')):
        for kind in ('clean', 'noisy'):
            os.makedirs(os.path.join(root, '%s_%s_wav' % (phase, kind)), exist_ok=True)
    txt_dir = os.path.join(root, 'txt')
    os.makedirs(txt_dir)
    for phase, spk in (('trainset', 'p280'), ('validset', 'p281')):
        for u in range(8):
            key = '%s_%03d' % (spk, u)
            n = int(SR * rng.uniform(2.5, 3.5))
            t = np.arange(n) / SR
            clean = (0.3 * np.sin(2 * np.pi * rng.uniform(100, 400) * t)).astype(np.float32)
            noisy = clean + 0.1 * rng.standard_normal(n).astype(np.float32)
            write_wav(os.path.join(root, '%s_clean_wav' % phase, key + '.wav'), clean, SR)
            write_wav(os.path.join(root, '%s_noisy_wav' % phase, key + '.wav'), noisy, SR)
            with open(os.path.join(txt_dir, key + '.txt'), 'w') as w:
                w.write('synthetic utterance %d.' % u)
    VoiceBankMeta(meta).make_meta(root, 2, 15, 0)
    return meta


def _run(meta_dir, save_dir, mesh=None, max_step=6):
    train_loader, valid_loader = get_datasets(
        meta_dir, batch_size=4, num_workers=0, fix_len=FIX_LEN,
        pad_multiple=FIX_LEN)
    model = build_model('spec_masker_small')
    t = VoiceBankTrainer(
        model, optax.adam(1e-3), train_loader, valid_loader,
        max_step=max_step, valid_max_step=2, save_interval=max_step,
        log_interval=2, save_dir=save_dir, save_prefix='vb_test',
        grad_norm=5.0, seed=7, mesh=mesh)
    return t, t.run()


def test_voicebank_end_to_end(vb_meta_dir, tmp_path):
    t, best = _run(vb_meta_dir, str(tmp_path))
    assert np.isfinite(best)
    ckpt = os.path.join(str(tmp_path), 'models', 'vb_test', 'SpectrogramMaskNet',
                        'step_%06d.chkpt' % t.step)
    assert os.path.exists(ckpt)


def test_voicebank_end_to_end_mesh(vb_meta_dir, tmp_path):
    mesh = make_mesh()  # 8 virtual devices, batch 4... needs divisibility
    # batch 4 over 8 devices won't shard; use a 4-device submesh
    mesh = make_mesh(shape=(4,), devices=jax.devices()[:4])
    t, best = _run(vb_meta_dir, str(tmp_path), mesh=mesh, max_step=3)
    assert np.isfinite(best)
    leaf = jax.tree_util.tree_leaves(t.params)[0]
    assert len(leaf.sharding.device_set) == 4


def test_enhance_inference(vb_meta_dir, tmp_path):
    """Train briefly, then run the waveform-level enhancement inference path."""
    from pytorch_sound_tpu.examples.voice_bank import enhance
    import jax.numpy as jnp

    t, _ = _run(vb_meta_dir, str(tmp_path), max_step=3)
    rng = np.random.default_rng(7)
    tt = np.arange(FIX_LEN) / SR
    clean = (0.3 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
    noisy = clean + 0.1 * rng.standard_normal(FIX_LEN).astype(np.float32)
    out = np.asarray(enhance(t.model, t.params, jnp.asarray(noisy)[None]))
    assert out.shape == (1, FIX_LEN)
    assert np.isfinite(out).all()

    # with an identity mask the pipeline is a (near-)exact STFT roundtrip:
    class IdentityMask:
        def apply(self, params, mag):
            return jnp.ones_like(mag)

    out_id = np.asarray(enhance(IdentityMask(), None, jnp.asarray(noisy)[None]))
    np.testing.assert_allclose(out_id[0, 512:-512], noisy[512:-512], atol=1e-4)
