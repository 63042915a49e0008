"""Pallas fused log-mel kernel tests (interpreter mode on CPU; the same kernel
runs compiled on TPU — see BENCH_DETAILS.json for measured speedups)."""

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu import settings as s
from pytorch_sound_tpu.ops import mel as mel_ops
from pytorch_sound_tpu.ops.pallas.logmel import fused_log_mel

KW = dict(min_db=s.MIN_DB, max_db=s.MAX_DB, mel_min=s.MEL_MIN, mel_max=s.MEL_MAX)


def _ref(wav):
    return mel_ops.log_mel_spectrogram(
        wav, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT, s.WIN_LENGTH, s.HOP_LENGTH, **KW)


def test_fused_logmel_matches_xla_path():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32) * 0.2)
    out_p = fused_log_mel(wav, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT,
                          s.WIN_LENGTH, s.HOP_LENGTH, **KW)
    out_x = _ref(wav)
    assert out_p.shape == out_x.shape == (2, 80, 87)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-4)


def test_fused_logmel_non_tile_multiple_length():
    rng = np.random.default_rng(1)
    # 12345 samples -> 49 frames, not a multiple of the 32-frame tile
    wav = jnp.asarray(rng.standard_normal((1, 12345)).astype(np.float32) * 0.2)
    out_p = fused_log_mel(wav, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT,
                          s.WIN_LENGTH, s.HOP_LENGTH, **KW)
    out_x = _ref(wav)
    assert out_p.shape == out_x.shape
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-4)


def test_fused_logmel_jittable():
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((3, 8192)).astype(np.float32))
    f = jax.jit(lambda w: fused_log_mel(w, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT,
                                        s.WIN_LENGTH, s.HOP_LENGTH, **KW))
    out = f(wav)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(wav)), atol=1e-4)


def test_fused_logmel_bf16x3_mode():
    """3-pass hi/lo-bf16 contraction: ~2x fewer MXU passes than 'highest',
    log-mel error bounded well under perceptual relevance (~1e-4)."""
    rng = np.random.default_rng(7)
    wav = jnp.asarray(rng.standard_normal((2, 30011)).astype(np.float32) * 0.3)
    out_p = fused_log_mel(wav, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT,
                          s.WIN_LENGTH, s.HOP_LENGTH, precision='bf16x3', **KW)
    out_x = _ref(wav)
    assert out_p.shape == out_x.shape
    assert float(jnp.abs(out_p - out_x).max()) < 2e-3


def test_fused_logmel_fmax_trim_exact():
    """Zero-weight spectral bins above fmax are dropped from the contraction;
    the result must be bit-comparable to the untrimmed formula (fmax=None
    keeps all 513 bins, fmax=8000 trims to 373 -> both must match XLA)."""
    rng = np.random.default_rng(8)
    wav = jnp.asarray(rng.standard_normal((1, 16384)).astype(np.float32) * 0.2)
    for fmax in (None, 8000.0):
        out_p = fused_log_mel(wav, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT,
                              s.WIN_LENGTH, s.HOP_LENGTH, mel_max=fmax)
        out_x = mel_ops.log_mel_spectrogram(
            wav, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT, s.WIN_LENGTH,
            s.HOP_LENGTH, mel_max=fmax)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=1e-4)


def test_fused_logmel_tile_frames_override():
    rng = np.random.default_rng(9)
    wav = jnp.asarray(rng.standard_normal((2, 50000)).astype(np.float32) * 0.2)
    ref = _ref(wav)
    for tf in (32, 64, 128):
        out = fused_log_mel(wav, s.SAMPLE_RATE, s.MEL_SIZE, s.N_FFT,
                            s.WIN_LENGTH, s.HOP_LENGTH, tile_frames=tf, **KW)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_hifigan_mel_matches_xla_path():
    from pytorch_sound_tpu.ops.pallas.logmel import fused_hifigan_mel
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 19137)).astype(np.float32) * 0.2)
    out_p = fused_hifigan_mel(wav)
    out_x = mel_ops.hifigan_mel_spectrogram(wav)
    assert out_p.shape == out_x.shape
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-4)


def test_fused_resblock_stage_matches_flax():
    """The fused stage kernel (interpret mode) vs the flax ResBlock1 mean."""
    from flax import serialization
    from pytorch_sound_tpu.models.vocoders import hifi_gan as HG
    from pytorch_sound_tpu.ops.pallas.resblock import fused_resblock_stage
    import os
    ckpt = os.path.join(os.path.dirname(HG.__file__), '..', '..', '..',
                        'assets', 'vocoders', 'hifi_gan_v2.msgpack')
    if not os.path.exists(ckpt):
        import pytest
        pytest.skip('checkpoint not converted')
    with open(ckpt, 'rb') as r:
        params = serialization.msgpack_restore(r.read())['params']

    rng = np.random.default_rng(0)
    C, T, N = 64, 300, 4        # stage 0 of v2; pack = 2
    x = jnp.asarray(rng.standard_normal((N, C, T)).astype(np.float32))
    stage = {('resblocks_%d' % j): params['resblocks_%d' % j] for j in range(3)}

    ref = 0
    for j in range(3):
        rb = HG.ResBlock1(C, [3, 7, 11][j], (1, 3, 5), use_weight_norm=False)
        ref = ref + rb.apply({'params': params['resblocks_%d' % j]}, x)
    ref = ref / 3

    out = fused_resblock_stage(x, stage, C, tile_t=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_generator_apply_fused_matches_flax():
    """Full fused-generator forward (with per-stage fallback) vs flax apply."""
    from flax import serialization
    from pytorch_sound_tpu.models import build_model
    from pytorch_sound_tpu.models.vocoders.hifi_gan import generator_apply_fused
    import os
    ckpt = 'assets/vocoders/hifi_gan_v2.msgpack'
    if not os.path.exists(ckpt):
        import pytest
        pytest.skip('checkpoint not converted')
    with open(ckpt, 'rb') as r:
        params = serialization.msgpack_restore(r.read())

    gen = build_model('hifi_gan_v2', extra_kwargs={'use_weight_norm': False})
    rng = np.random.default_rng(1)
    # batch 16 satisfies every stage's lane packing for v2 (min C=8 -> pack 16)
    mel = jnp.asarray(rng.standard_normal((16, 80, 13)).astype(np.float32) * 2 - 4)
    out_fused = generator_apply_fused(gen, params, mel)
    out_flax = gen.apply(params, mel)
    assert out_fused.shape == out_flax.shape
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_flax),
                               atol=2e-4)


def test_generator_apply_fused_mixed_eligibility():
    """v1-style config: every stage fuses — the 256-ch stage 0 on the wide
    (multi-lane-tile) kernel path, later stages (C <= 128) lane-packed —
    and outputs must match flax end-to-end."""
    from pytorch_sound_tpu.models import build_model
    from pytorch_sound_tpu.models.vocoders.hifi_gan import (
        fold_weight_norm_params, generator_apply_fused)

    gen = build_model('hifi_gan_v1', extra_kwargs={'use_weight_norm': False,
                                                   'upsample_initial_channel': 512})
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((4, 80, 5)).astype(np.float32) * 2 - 4)
    params = gen.init(jax.random.PRNGKey(3), mel)
    out_fused = generator_apply_fused(gen, params, mel)   # stages: 256,128,64,32
    out_flax = gen.apply(params, mel)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_flax),
                               atol=2e-4)


def test_fused_full_stage_matches_flax():
    """The full-stage kernel (lrelu + convT + resblocks [+ conv_post+tanh])
    vs the flax generator, incl. mixed eligibility and multi-tile outputs."""
    from pytorch_sound_tpu.models import build_model
    import pytorch_sound_tpu.models.vocoders.hifi_gan as hg

    rng = np.random.default_rng(11)
    gen = build_model('hifi_gan_v2', extra_kwargs={
        'upsample_initial_channel': 64, 'use_weight_norm': False})
    mel = jnp.asarray(rng.standard_normal((4, 80, 37)), dtype=jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    ref = np.asarray(gen.apply(params, mel))
    out = np.asarray(hg.generator_apply_fused(gen, params, mel, full_stage=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_full_stage_v1_mixed_eligibility():
    """v1 fully fuses: stage 0 (C_out=256) runs the wide unpacked kernel
    (two lane tiles per plane, (256, 256) taps), the rest lane-packed."""
    from pytorch_sound_tpu.models import build_model
    import pytorch_sound_tpu.models.vocoders.hifi_gan as hg

    rng = np.random.default_rng(12)
    gen = build_model('hifi_gan_v1', extra_kwargs={'use_weight_norm': False})
    mel = jnp.asarray(rng.standard_normal((2, 80, 19)), dtype=jnp.float32)
    params = gen.init(jax.random.PRNGKey(1), mel)
    ref = np.asarray(gen.apply(params, mel))
    out = np.asarray(hg.generator_apply_fused(gen, params, mel, full_stage=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_full_stage_multi_tile():
    """Output long enough that the last stage spans multiple time tiles."""
    from pytorch_sound_tpu.models import build_model
    import pytorch_sound_tpu.models.vocoders.hifi_gan as hg

    rng = np.random.default_rng(13)
    gen = build_model('hifi_gan_v2', extra_kwargs={
        'upsample_initial_channel': 64, 'use_weight_norm': False})
    mel = jnp.asarray(rng.standard_normal((4, 80, 64)), dtype=jnp.float32)
    params = gen.init(jax.random.PRNGKey(3), mel)
    ref = np.asarray(gen.apply(params, mel))
    out = np.asarray(hg.generator_apply_fused(gen, params, mel, full_stage=True))
    assert out.shape == (4, 1, 16384)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_full_stage_any_batch():
    """Batch sizes that don't fill the lane packing (1, 3) still fuse — the
    packing factor adapts and pads unused lanes (round-2 fix: batch-1 decode
    previously fell back to flax silently)."""
    from pytorch_sound_tpu.models import build_model
    from pytorch_sound_tpu.ops.pallas.gen_stage import best_pack
    import pytorch_sound_tpu.models.vocoders.hifi_gan as hg

    assert best_pack(1, 8) == 1 and best_pack(3, 8) == 3
    assert best_pack(32, 8) == 16 and best_pack(6, 32) == 3

    rng = np.random.default_rng(14)
    gen = build_model('hifi_gan_v2', extra_kwargs={
        'upsample_initial_channel': 64, 'use_weight_norm': False})
    for n in (1, 3):
        mel = jnp.asarray(rng.standard_normal((n, 80, 29)), dtype=jnp.float32)
        params = gen.init(jax.random.PRNGKey(n), mel)
        ref = np.asarray(gen.apply(params, mel))
        out = np.asarray(hg.generator_apply_fused(gen, params, mel, True))
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_wide_stage_multi_tile():
    """The wide (c_out=256) kernel at v1 stage-0 geometry (u=8, k_up=16) with
    the output spanning multiple time tiles (the wide path caps tile_t at
    2048): matches lrelu -> conv_transpose -> ResBlock1 mean in flax."""
    import flax.linen as nn
    from pytorch_sound_tpu.models.vocoders.hifi_gan import ResBlock1
    from pytorch_sound_tpu.ops.nn import conv_transpose1d
    from pytorch_sound_tpu.ops.pallas.gen_stage import (fused_generator_stage,
                                                        stage_eligible)

    assert stage_eligible(256, 2, 8, 16)
    assert not stage_eligible(512, 2, 8, 16)

    c, u, k_up, t = 256, 8, 16, 320            # t_out = 2560 -> 2 tiles
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 2 * c, t)) * 0.3, jnp.float32)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)

    up = {'weight': mk(2 * c, c, k_up), 'bias': mk(c)}
    stage = {}
    for j, kk in enumerate((3, 7, 11)):
        blk = {}
        for r in range(3):
            blk['convs1_%d' % r] = {'weight': mk(c, c, kk), 'bias': mk(c)}
            blk['convs2_%d' % r] = {'weight': mk(c, c, kk), 'bias': mk(c)}
        stage['resblocks_%d' % j] = blk

    h = nn.leaky_relu(x, 0.1)
    h = conv_transpose1d(h, up['weight'], up['bias'], stride=u,
                         padding=(k_up - u) // 2)
    ref = 0
    for j, kk in enumerate((3, 7, 11)):
        rb = ResBlock1(c, kk, (1, 3, 5), use_weight_norm=False)
        ref = ref + rb.apply({'params': stage['resblocks_%d' % j]}, h)
    ref = np.asarray(ref / 3)

    out = np.asarray(fused_generator_stage(x, up, stage, c, u, k_up))
    assert out.shape == ref.shape == (2, c, u * t)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_fused_hifigan_mel_trainable_grads():
    """custom_vjp wrapper: Pallas forward (interpret on CPU), exact composite
    backward — gradient must match XLA autodiff of the composite."""
    from pytorch_sound_tpu.ops.pallas.logmel import fused_hifigan_mel_trainable
    rng = np.random.default_rng(12)
    wav = jnp.asarray(rng.standard_normal((2, 9000)).astype(np.float32) * 0.2)

    def loss_fused(w):
        return jnp.sum(jnp.sin(fused_hifigan_mel_trainable(w, 'highest')))

    def loss_ref(w):
        return jnp.sum(jnp.sin(mel_ops.hifigan_mel_spectrogram(w)))

    out = fused_hifigan_mel_trainable(wav, 'highest')
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(mel_ops.hifigan_mel_spectrogram(wav)),
                               atol=1e-4)
    g_fused = jax.grad(loss_fused)(wav)
    g_ref = jax.grad(loss_ref)(wav)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-4)
