"""HiFi-GAN adversarial training smoke tests (small discriminators, CPU)."""

import os

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_sound_tpu.examples.hifi_gan import HiFiGANTrainer
from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators  # noqa: F401
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401
from pytorch_sound_tpu.ops import gan as gan_ops


def test_discriminator_shapes():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 2048)),
                      dtype=jnp.float32)
    mpd = build_model('hifi_gan_mpd_small')
    params = mpd.init(jax.random.PRNGKey(0), wav)
    outs = mpd.apply(params, wav)
    assert len(outs) == 2   # two periods in the small arch
    for score, feats in outs:
        assert score.ndim == 2 and score.shape[0] == 2
        assert len(feats) == 4   # 2 stages + top + post

    msd = build_model('hifi_gan_msd_small')
    params = msd.init(jax.random.PRNGKey(1), wav)
    outs = msd.apply(params, wav)
    assert len(outs) == 2   # two scales
    for score, feats in outs:
        assert score.shape[0] == 2 and len(feats) == 8


def test_gan_losses_behave():
    rng = np.random.default_rng(1)
    real = [(jnp.ones((2, 10)), [jnp.ones((2, 4, 8))])]
    fake = [(jnp.zeros((2, 10)), [jnp.zeros((2, 4, 8))])]
    # perfect discriminator: D(real)=1, D(fake)=0 -> disc loss 0
    assert float(gan_ops.discriminator_loss(real, fake)) == 0.0
    # generator fooled nothing -> adversarial loss 1 per sub-disc
    assert float(gan_ops.generator_adversarial_loss(fake)) == 1.0
    assert float(gan_ops.feature_matching_loss(real, fake)) == 1.0


def test_batched_disc_pass_matches_separate(tmp_path):
    """_disc_apply_both (one pass over concat([real, fake])) must equal two
    separate discriminator passes — scores and every feature map."""
    trainer = HiFiGANTrainer(
        build_model('hifi_gan_v3', extra_kwargs={
            'upsample_initial_channel': 32}),
        build_model('hifi_gan_mpd_small'), build_model('hifi_gan_msd_small'),
        optax.adamw(2e-4), optax.adamw(2e-4), None, None,
        max_step=1, valid_max_step=1, save_interval=10, log_interval=10,
        save_dir=str(tmp_path), save_prefix='t', seed=0)
    rng = np.random.default_rng(3)
    real = jnp.asarray(rng.standard_normal((2, 1, 1024)), jnp.float32)
    fake = jnp.asarray(rng.standard_normal((2, 1, 1024)), jnp.float32)
    trainer._ensure_initialized([real[:, 0]])
    dp = {'mpd': trainer.params['mpd'], 'msd': trainer.params['msd']}

    for key, module in (('mpd', trainer.mpd), ('msd', trainer.msd)):
        r_out, f_out = trainer._disc_apply_both(key, dp, real, fake)
        r_ref = module.apply(dp[key], real)
        f_ref = module.apply(dp[key], fake)
        for (got, ref) in ((r_out, r_ref), (f_out, f_ref)):
            for (s_g, feats_g), (s_r, feats_r) in zip(got, ref):
                np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_r),
                                           atol=1e-5)
                for a, b in zip(feats_g, feats_r):
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                               atol=1e-5)


@pytest.fixture(scope='module')
def gan_trainer(tmp_path_factory):
    def loader():
        rng = np.random.default_rng(2)
        t = np.arange(2048) / 22050
        for _ in range(4):
            f0 = rng.uniform(100, 300)
            wav = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
            yield [np.stack([wav, wav * 0.8])]

    save_dir = str(tmp_path_factory.mktemp('gan'))
    gen = build_model('hifi_gan_v3', extra_kwargs={
        'upsample_initial_channel': 32})
    trainer = HiFiGANTrainer(
        gen, build_model('hifi_gan_mpd_small'), build_model('hifi_gan_msd_small'),
        optax.adamw(2e-4), optax.adamw(2e-4),
        list(loader()), list(loader()),
        max_step=2, valid_max_step=1, save_interval=2, log_interval=1,
        save_dir=save_dir, save_prefix='gan_test', seed=9)
    return trainer, save_dir


def test_hifigan_gan_step(gan_trainer):
    trainer, save_dir = gan_trainer
    best = trainer.run()
    assert np.isfinite(best)
    # params exist for all three groups and were updated jointly
    assert set(trainer.params.keys()) == {'gen', 'mpd', 'msd'}
    ckpt_dir = os.path.join(save_dir, 'models', 'gan_test', 'Generator')
    assert os.path.exists(os.path.join(ckpt_dir, 'step_000002.chkpt'))


def test_generator_warm_start(tmp_path):
    """GAN fine-tuning from the bundled (folded) generator checkpoint."""
    from pytorch_sound_tpu.interface.hifi_gan import CHECKPOINTS
    ckpt = CHECKPOINTS['hifi_gan_v2']
    if not os.path.exists(ckpt):
        pytest.skip('bundled checkpoint not converted')

    rng = np.random.default_rng(3)
    loader = [[rng.standard_normal((2, 2048)).astype(np.float32) * 0.2]]
    gen = build_model('hifi_gan_v2', extra_kwargs={'use_weight_norm': False})
    t = HiFiGANTrainer(
        gen, build_model('hifi_gan_mpd_small'), build_model('hifi_gan_msd_small'),
        optax.adamw(1e-4), optax.adamw(1e-4), loader, loader,
        max_step=1, valid_max_step=1, save_interval=10, log_interval=10,
        save_dir=str(tmp_path), save_prefix='warm', seed=2,
        generator_warm_start=ckpt)
    batch = [jnp.asarray(loader[0][0])]
    t._ensure_initialized(batch)
    # warm-started weights equal the checkpoint
    from flax import serialization
    with open(ckpt, 'rb') as r:
        ref = serialization.msgpack_restore(r.read())
    got = serialization.to_state_dict(t.params['gen'])
    np.testing.assert_allclose(
        got['params']['conv_pre']['weight'], ref['params']['conv_pre']['weight'])


def test_hifigan_split_step_matches_fused(tmp_path):
    """The split two-jit GAN step produces the same first-step update as the
    fused single-jit step (identical math; the NaN guard granularity only
    differs on non-finite losses)."""
    rng = np.random.default_rng(11)
    batch = [rng.standard_normal((2, 2048)).astype(np.float32) * 0.2]

    def make(split):
        gen = build_model('hifi_gan_v3',
                          extra_kwargs={'upsample_initial_channel': 32})
        return HiFiGANTrainer(
            gen, build_model('hifi_gan_mpd_small'),
            build_model('hifi_gan_msd_small'),
            optax.adamw(2e-4), optax.adamw(2e-4), None, None,
            max_step=1, valid_max_step=1, save_interval=10 ** 9,
            log_interval=10 ** 9, save_dir=str(tmp_path), save_prefix='s%d' % split,
            seed=13, split_step=bool(split))

    outs = []
    for split in (0, 1):
        t = make(split)
        t._ensure_initialized([jnp.asarray(batch[0])])
        p, o, loss, meta = t._get_train_step()(
            t.params, t.opt_state, [jnp.asarray(batch[0])], is_logging=True)
        outs.append((p, float(loss), meta))
    p0, l0, m0 = outs[0]
    p1, l1, m1 = outs[1]
    assert abs(l0 - l1) < 1e-4
    err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, p1)))
    assert err < 1e-5
    assert set(m1.keys()) == set(m0.keys())   # same logging channels


def test_period_discriminator_matches_2d_formulation():
    """The NTC-1d MPD (period folded into batch) must equal the paper's
    NCHW 2D (k,1)-conv stack exactly: same weights, same math, only the
    layout differs (`discriminators.PeriodDiscriminator` docstring)."""
    from pytorch_sound_tpu.models.vocoders.discriminators import (
        PeriodDiscriminator)

    n, t, period = 2, 1021, 3
    wav = jnp.asarray(
        np.random.default_rng(3).standard_normal((n, 1, t)), jnp.float32)
    pd = PeriodDiscriminator(period, channels=(8, 16), precision='highest')
    params = pd.init(jax.random.PRNGKey(2), wav)
    score, feats = pd.apply(params, wav)

    # independent 2D reference from the same parameters
    pad = (-t) % period
    x = jnp.pad(wav, [(0, 0), (0, 0), (0, pad)], mode='reflect')
    h = (t + pad) // period
    x = x.reshape(n, 1, h, period)   # NCHW
    layer_specs = [('conv_0', 3, 2), ('conv_1', 3, 2), ('conv_2', 1, 2),
                   ('conv_post', 1, 1)]
    ref_feats = []
    for name, stride, kpad in layer_specs:
        p = params['params'][name]
        v, g, b = p['v'], p['g'], p['bias']
        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True) + 1e-12)
        w2d = (g * v / norm)[..., None]           # (O, I, K, 1)
        x = jax.lax.conv_general_dilated(
            x, w2d, (stride, 1), [(kpad, kpad), (0, 0)],
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            precision=jax.lax.Precision.HIGHEST) + b[None, :, None, None]
        if name != 'conv_post':
            x = jnp.where(x > 0, x, 0.1 * x)
        ref_feats.append(x)

    assert len(feats) == len(ref_feats)
    for got, ref in zip(feats, ref_feats):
        # (N, C, H', P) -> (N*P, H', C)
        ref_ntc = ref.transpose(0, 3, 2, 1).reshape(got.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_ntc),
                                   rtol=2e-5, atol=2e-5)
    ref_score = ref_feats[-1].transpose(0, 3, 2, 1).reshape(n, -1)
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref_score),
                               rtol=2e-5, atol=2e-5)


def test_gen_loss_offtape_real_matches_concat_gradients(tmp_path):
    """_gen_loss evaluates FM real targets in their own fwd-only pass; the
    generator gradient must equal the batched-concat formulation's (the real
    branch carries no gradient either way)."""
    trainer = HiFiGANTrainer(
        build_model('hifi_gan_v3', extra_kwargs={
            'upsample_initial_channel': 32}),
        build_model('hifi_gan_mpd_small'), build_model('hifi_gan_msd_small'),
        optax.adamw(2e-4), optax.adamw(2e-4), None, None,
        max_step=1, valid_max_step=1, save_interval=10, log_interval=10,
        save_dir=str(tmp_path), save_prefix='t', seed=0)
    rng = np.random.default_rng(5)
    wav = rng.standard_normal((2, 2048)).astype(np.float32) * 0.1
    trainer._ensure_initialized([jnp.asarray(wav)])
    real = jnp.asarray(wav)[:, None, :]
    from pytorch_sound_tpu.ops import mel as mel_ops
    from pytorch_sound_tpu.examples.hifi_gan import MEL_KW
    mel_real = mel_ops.hifigan_mel_spectrogram(jnp.asarray(wav), **MEL_KW)
    dp = {'mpd': trainer.params['mpd'], 'msd': trainer.params['msd']}

    def loss_now(gp):
        return trainer._gen_loss(gp, dp, real, mel_real)[0]

    def loss_concat(gp):
        fake = trainer.generator.apply(gp, mel_real)
        mel_fake = trainer._mel(fake[:, 0])
        mel_l1 = jnp.mean(jnp.abs(mel_fake - mel_real))
        real_ng = jax.lax.stop_gradient(real)
        mpd_real, mpd_fake = trainer._disc_apply_both('mpd', dp, real_ng, fake)
        msd_real, msd_fake = trainer._disc_apply_both('msd', dp, real_ng, fake)
        adv = (gan_ops.generator_adversarial_loss(mpd_fake)
               + gan_ops.generator_adversarial_loss(msd_fake))
        fm = (gan_ops.feature_matching_loss(mpd_real, mpd_fake)
              + gan_ops.feature_matching_loss(msd_real, msd_fake))
        from pytorch_sound_tpu.examples.hifi_gan import LAMBDA_FM, LAMBDA_MEL
        return adv + LAMBDA_FM * fm + LAMBDA_MEL * mel_l1

    gp = trainer.params['gen']
    l1, g1 = jax.value_and_grad(loss_now)(gp)
    l2, g2 = jax.value_and_grad(loss_concat)(gp)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_scale_discriminator_pallas_stack_matches_xla():
    """Full-width ScaleDiscriminator with every layer on the Pallas kernel
    (backends 'auto', interpret on CPU) vs the all-XLA stack: the same
    per-layer plan composition the GAN bench's best_config dispatches,
    including the new planner defaults (lane-rate cost + batch fold)."""
    import pytorch_sound_tpu.models.vocoders.discriminators as disc

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 1, 512)).astype(np.float32) * 0.3)
    sd_k = disc.ScaleDiscriminator(width=1.0, backends=('auto',) * 8)
    sd_x = disc.ScaleDiscriminator(width=1.0, backends=('xla',) * 8)
    params = sd_k.init(jax.random.PRNGKey(3), x)
    score_k, feats_k = sd_k.apply(params, x)
    score_x, feats_x = sd_x.apply(params, x)
    rel = float(jnp.abs(score_k - score_x).max() /
                (jnp.abs(score_x).max() + 1e-9))
    assert rel < 3e-2, rel
    assert len(feats_k) == len(feats_x)
    for a, b in zip(feats_k, feats_x):
        assert a.shape == b.shape


def test_msd_folded_matches_unfolded():
    """msd_apply_folded (one block-diagonal grouped stack over all scales)
    must reproduce msd.apply exactly: every score and every feature map,
    at full width and at the small width, for 2 and 3 scales."""
    import pytorch_sound_tpu.models.vocoders.discriminators as disc

    rng = np.random.default_rng(7)
    # width 1.0 @ short T covers the wide-cg native-grouped folded arm
    # (cg >= 32); the small widths cover the per-scale dense-expanded arm
    for n_scales, width, t in ((3, 0.0625, 2048), (2, 0.125, 2048),
                               (3, 1.0, 512)):
        wav = jnp.asarray(rng.standard_normal((2, 1, t)), dtype=jnp.float32)
        msd = disc.MultiScaleDiscriminator(n_scales=n_scales, width=width)
        params = msd.init(jax.random.PRNGKey(3), wav)
        ref = msd.apply(params, wav)
        got = disc.msd_apply_folded(msd, params, wav)
        assert len(got) == len(ref)
        for (gs, gf), (rs, rf) in zip(got, ref):
            assert gs.shape == rs.shape
            np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                                       rtol=2e-5, atol=2e-5)
            assert len(gf) == len(rf)
            for a, b in zip(gf, rf):
                assert a.shape == b.shape
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=2e-5)


def test_msd_folded_gradients_match():
    """d(loss)/d(params) of the folded formulation equals the unfolded one
    (the zero-masked padded tails must contribute nothing to dw/db)."""
    import pytorch_sound_tpu.models.vocoders.discriminators as disc

    rng = np.random.default_rng(8)
    wav = jnp.asarray(rng.standard_normal((2, 1, 1024)), dtype=jnp.float32)
    msd = disc.MultiScaleDiscriminator(n_scales=3, width=0.0625)
    params = msd.init(jax.random.PRNGKey(4), wav)

    def loss(p, apply_fn):
        outs = apply_fn(p)
        total = 0.0
        for score, feats in outs:
            total = total + jnp.mean(score ** 2)
            for f in feats:
                total = total + jnp.mean(jnp.abs(f))
        return total

    g_ref = jax.grad(lambda p: loss(p, lambda pp: msd.apply(pp, wav)))(params)
    g_fold = jax.grad(lambda p: loss(
        p, lambda pp: disc.msd_apply_folded(msd, pp, wav)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fold),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_discriminators_bf16_compute_dtype():
    """compute_dtype='bf16' critics run (bf16 activations, f32 master params)
    and track the f32 outputs to bf16 resolution."""
    import pytorch_sound_tpu.models.vocoders.discriminators as disc

    rng = np.random.default_rng(9)
    wav = jnp.asarray(rng.standard_normal((2, 1, 2048)), dtype=jnp.float32)
    for make in (lambda dt: disc.MultiScaleDiscriminator(
                     n_scales=2, width=0.0625, compute_dtype=dt),
                 lambda dt: disc.MultiPeriodDiscriminator(
                     periods=(2, 3), channels=(8, 16), compute_dtype=dt)):
        f32 = make(None)
        b16 = make('bf16')
        params = f32.init(jax.random.PRNGKey(5), wav)
        out_f = f32.apply(params, wav)
        out_b = b16.apply(params, wav)
        for (sf, ff), (sb, fb) in zip(out_f, out_b):
            assert sb.dtype == jnp.bfloat16
            scale = max(1.0, float(jnp.abs(sf).max()))
            assert float(jnp.abs(sf - sb.astype(jnp.float32)).max()) < 0.1 * scale
        # grads exist and are f32 (master-weight mixed precision)
        g = jax.grad(lambda p: sum(
            jnp.mean(s.astype(jnp.float32) ** 2) for s, _ in b16.apply(p, wav)))(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert leaf.dtype == jnp.float32


def test_hifigan_msd_folded_step_matches_unfolded(tmp_path):
    """The trainer's msd_folded=True step produces the same first-step update
    (params + loss) as the default per-scale MSD apply."""
    rng = np.random.default_rng(17)
    batch = [rng.standard_normal((2, 2048)).astype(np.float32) * 0.2]

    def make(folded):
        gen = build_model('hifi_gan_v3',
                          extra_kwargs={'upsample_initial_channel': 32})
        return HiFiGANTrainer(
            gen, build_model('hifi_gan_mpd_small'),
            build_model('hifi_gan_msd_small'),
            optax.adamw(2e-4), optax.adamw(2e-4), None, None,
            max_step=1, valid_max_step=1, save_interval=10 ** 9,
            log_interval=10 ** 9, save_dir=str(tmp_path),
            save_prefix='f%d' % folded, seed=13, msd_folded=bool(folded))

    outs = []
    for folded in (0, 1):
        t = make(folded)
        t._ensure_initialized([jnp.asarray(batch[0])])
        p, o, loss, _ = t._get_train_step()(
            t.params, t.opt_state, [jnp.asarray(batch[0])], is_logging=False)
        outs.append((p, float(loss)))
    (p0, l0), (p1, l1) = outs
    assert abs(l0 - l1) < 1e-4
    err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, p1)))
    assert err < 1e-5
