"""HiFi-GAN vocoder + interface tests, incl. golden comparison against the
reference torch implementation with the bundled pretrained checkpoint."""

import os
import sys

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sound_tpu.models import build_model
from pytorch_sound_tpu.models.vocoders.hifi_gan import (Generator,
                                                        fold_weight_norm_params)
from pytorch_sound_tpu.interface.hifi_gan import (CHECKPOINTS, AudioParameters,
                                                  InterfaceHifiGAN, MelSpectrogram)

V2_MSGPACK = CHECKPOINTS['hifi_gan_v2']
REF_PT = '/root/reference/assets/vocoders/hifi_gan_v2.pt'


def test_generator_shapes_and_upsampling():
    gen = build_model('hifi_gan_v2')
    mel = jnp.zeros((2, 80, 13))
    params = gen.init(jax.random.PRNGKey(0), mel)
    out = gen.apply(params, mel)
    assert out.shape == (2, 1, 13 * 256)   # 8*8*2*2 = 256x upsampling
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_generator_v3_resblock2():
    gen = build_model('hifi_gan_v3')
    mel = jnp.zeros((1, 80, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)
    out = gen.apply(params, mel)
    assert out.shape == (1, 1, 8 * 256)    # 8*8*4


def test_fold_weight_norm_equivalence():
    gen_wn = build_model('hifi_gan_v2')
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 80, 9)),
                      dtype=jnp.float32)
    params = gen_wn.init(jax.random.PRNGKey(1), mel)
    out_wn = gen_wn.apply(params, mel)

    folded = fold_weight_norm_params(params)
    gen_plain = build_model('hifi_gan_v2', extra_kwargs={'use_weight_norm': False})
    out_plain = gen_plain.apply(folded, mel)
    np.testing.assert_allclose(np.asarray(out_wn), np.asarray(out_plain), atol=1e-5)


@pytest.mark.skipif(not os.path.exists(V2_MSGPACK),
                    reason='bundled v2 checkpoint not converted')
def test_interface_encode_decode_contract():
    iface = InterfaceHifiGAN('hifi_gan_v2')
    sr = AudioParameters.sampling_rate
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]

    mel = iface.encode(wav)
    assert mel.shape[0:2] == (1, 80)
    pad = (AudioParameters.n_fft - AudioParameters.hop_size) // 2
    expected_frames = (sr + 2 * pad - AudioParameters.n_fft) // AudioParameters.hop_size + 1
    assert mel.shape[2] == expected_frames

    out = iface.decode(mel)
    assert out.ndim == 3 and out.shape[1] == 1
    assert out.shape[2] == mel.shape[2] * 256
    # decoded audio resembles a periodic signal, not silence/noise
    assert 0.01 < np.abs(np.asarray(out)).max() <= 1.0

    with pytest.raises(AssertionError):
        iface.encode(wav[0])          # 1D input rejected
    with pytest.raises(AssertionError):
        iface.decode(mel[0])          # 2D input rejected


@pytest.mark.skipif(not os.path.exists(REF_PT), reason='reference checkpoint absent')
def test_generator_matches_torch_reference_golden():
    """The strongest parity test: identical outputs vs the reference torch
    Generator loaded with the real bundled checkpoint."""
    torch = pytest.importorskip('torch')
    sys.path.insert(0, '/root/reference')
    try:
        from pytorch_sound.models import build_model as torch_build
        import pytorch_sound.models.vocoders.hifi_gan  # noqa: F401
    finally:
        sys.path.pop(0)

    tgen = torch_build('hifi_gan_v2')
    sd = torch.load(REF_PT, map_location='cpu')['generator']
    tgen.load_state_dict(sd)
    tgen.remove_weight_norm()
    tgen.eval()

    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((1, 80, 37)).astype(np.float32) * 2 - 4)
    with torch.no_grad():
        out_t = tgen(torch.from_numpy(mel)).numpy()

    iface = InterfaceHifiGAN('hifi_gan_v2')
    out_j = np.asarray(iface.decode(mel))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-5)


@pytest.mark.skipif(not os.path.exists(V2_MSGPACK),
                    reason='bundled v2 checkpoint not converted')
def test_streaming_decode_matches_full():
    iface = InterfaceHifiGAN('hifi_gan_v2')
    rng = np.random.default_rng(5)
    mel = (rng.standard_normal((1, 80, 300)).astype(np.float32) * 2 - 4)
    full = np.asarray(iface.decode(mel))
    streamed = np.asarray(iface.decode_streaming(mel, chunk_frames=128,
                                                 overlap_frames=16))
    assert streamed.shape == full.shape
    # identical away from chunk boundaries' receptive-field fringe; compare
    # a wide interior region around each seam
    err = np.abs(streamed - full)
    assert float(err[..., 20 * 256: 280 * 256].max()) < 5e-3
    # short input falls through to plain decode
    short = np.asarray(iface.decode_streaming(mel[..., :64], chunk_frames=128))
    np.testing.assert_allclose(short, np.asarray(iface.decode(mel[..., :64])),
                               atol=1e-6)
    # multi-item batch with max_batch smaller than total chunks (6 chunks
    # split over two device dispatches) reassembles each item correctly
    mel2 = np.concatenate([mel, mel * 0.5], axis=0)
    full2 = np.asarray(iface.decode(jnp.asarray(mel2)))
    streamed2 = np.asarray(iface.decode_streaming(
        mel2, chunk_frames=128, overlap_frames=16, max_batch=4))
    assert streamed2.shape == full2.shape
    err2 = np.abs(streamed2 - full2)
    assert float(err2[..., 20 * 256: 280 * 256].max()) < 5e-3


@pytest.mark.skipif(not os.path.exists(V2_MSGPACK),
                    reason='bundled v2 checkpoint not converted')
def test_encode_decode_cycle_consistency():
    """Quality regression: re-encoding decoded audio reproduces the mel the
    vocoder was driven with (the pretrained checkpoint's core contract)."""
    iface = InterfaceHifiGAN('hifi_gan_v2')
    sr = AudioParameters.sampling_rate
    t = np.arange(2 * sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)[None]
    mel = iface.encode(wav)
    out = iface.decode(mel)
    mel_cycle = iface.encode(np.asarray(out)[:, 0, :])
    n = min(mel.shape[-1], mel_cycle.shape[-1]) - 4
    a = np.asarray(mel[..., 2:n])
    b = np.asarray(mel_cycle[..., 2:n])
    # a pure AM tone is out-of-domain for a speech vocoder, so exact mel
    # reconstruction is not expected; high mel correlation + bounded error
    # still catches gross breakage (wrong params/scale give corr ~ 0)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.85, corr
    assert float(np.median(np.abs(a - b))) < 2.0


def test_apply_weight_norm_roundtrip():
    """apply_weight_norm is the exact inverse of fold_weight_norm_params."""
    import jax
    import jax.numpy as jnp
    from pytorch_sound_tpu.models import build_model
    import pytorch_sound_tpu.models.vocoders.hifi_gan as HG

    gen = build_model('hifi_gan_v3',
                      extra_kwargs={'upsample_initial_channel': 32})
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 16)))['params']
    folded = HG.fold_weight_norm_params(params)
    refolded = HG.fold_weight_norm_params(HG.apply_weight_norm(folded))
    err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), folded, refolded)))
    assert err < 1e-6


def test_init_weights_redraws_kernels():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pytorch_sound_tpu.models import build_model
    import pytorch_sound_tpu.models.vocoders.hifi_gan as HG

    gen = build_model('hifi_gan_v3',
                      extra_kwargs={'upsample_initial_channel': 32})
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 16)))['params']
    out = HG.init_weights(jax.random.PRNGKey(1), params, std=0.01)
    kernels = [leaf for path, leaf in
               jax.tree_util.tree_flatten_with_path(out)[0]
               if getattr(leaf, 'ndim', 0) >= 2 and "'g'" not in str(path[-1])]
    flat = np.concatenate([np.asarray(k).ravel() for k in kernels])
    assert abs(flat.std() - 0.01) < 2e-3          # redrawn at the target std
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(params)


def test_streaming_decode_exact_with_zero_pad_edges():
    """With overlap >= the generator's receptive field (~25 frames) and
    zero-padded sequence extremes, streaming matches full decode EXACTLY
    except the outermost ~9 frames at each end (boundary-bias effect of
    chunked CNN inference — see decode_streaming's docstring)."""
    iface = InterfaceHifiGAN('hifi_gan_v2')
    rng = np.random.default_rng(17)
    mel = (rng.standard_normal((1, 80, 300)).astype(np.float32) * 2 - 4)
    full = np.asarray(iface.decode(mel))
    streamed = np.asarray(iface.decode_streaming(mel, chunk_frames=128,
                                                 overlap_frames=32))
    assert streamed.shape == full.shape
    err = np.abs(streamed - full)
    # everything but the outer 10 frames each side: exact (incl. all seams)
    assert float(err[..., 10 * 256:-10 * 256].max()) < 1e-6


def test_generator_ntc_parity_with_nct():
    """The channels-last (NTC) generator — whose convs ride the Pallas
    grouped-conv kernels on TPU (XLA NTC convs here on CPU) — produces the
    same waveform and the same parameter gradients as the NCT reference
    layout from an identical param tree (one transpose in/out; param names
    and shapes are layout-invariant)."""
    from pytorch_sound_tpu.models import ARCH_CONFIG_REGISTRY
    from pytorch_sound_tpu.utils.training import parse_model_kwargs

    for arch in ('hifi_gan_v2', 'hifi_gan_v3'):
        cfg = parse_model_kwargs(Generator, **ARCH_CONFIG_REGISTRY[arch]())
        cfg.pop('data_format', None)
        gen_nct = Generator(**cfg)
        gen_ntc = Generator(**cfg, data_format='NTC')
        rng = np.random.default_rng(3)
        mel = jnp.asarray(rng.standard_normal((2, 80, 19)).astype(np.float32))
        params = gen_nct.init(jax.random.PRNGKey(0), mel)
        o1 = gen_nct.apply(params, mel)
        o2 = gen_ntc.apply(params, mel)
        assert o1.shape == o2.shape
        assert float(jnp.abs(o1 - o2).max()) < 1e-5, arch

        def loss(p, g):
            return jnp.sum(jnp.abs(g.apply(p, mel)))
        g1 = jax.grad(lambda p: loss(p, gen_nct))(params)
        g2 = jax.grad(lambda p: loss(p, gen_ntc))(params)
        rel = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()
                               / (jnp.abs(a).max() + 1e-9)), g1, g2)
        assert max(jax.tree_util.tree_leaves(rel)) < 1e-4, arch


def test_msd_backend_mask_parity():
    """Per-layer backend routing ('xla' vs 'auto') in the MSD changes only
    the execution path, never the math (CPU: both are XLA NTC convs; the
    field must thread through without touching params or outputs)."""
    import pytorch_sound_tpu.models.vocoders.discriminators  # noqa: F401
    msd_a = build_model('hifi_gan_msd_small')
    msd_b = build_model('hifi_gan_msd_small',
                        extra_kwargs=dict())
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((2, 1, 2048)).astype(np.float32))
    params = msd_a.init(jax.random.PRNGKey(1), wav)
    from pytorch_sound_tpu.models.vocoders.discriminators import (
        MultiScaleDiscriminator)
    msd_all = MultiScaleDiscriminator(n_scales=2, width=0.0625,
                                      backends=('auto',) * 8)
    msd_xla = MultiScaleDiscriminator(n_scales=2, width=0.0625,
                                      backends=('xla',) * 8)
    o1 = msd_all.apply(params, wav)
    o2 = msd_xla.apply(params, wav)
    for (s1, f1), (s2, f2) in zip(o1, o2):
        assert float(jnp.abs(s1 - s2).max()) < 1e-5
