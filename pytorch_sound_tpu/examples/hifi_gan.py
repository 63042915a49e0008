"""HiFi-GAN vocoder training — full adversarial recipe on TPU.

Beyond-parity capability: the reference bundles only pretrained generator
checkpoints; this config trains one from scratch (or fine-tunes) with the
paper's objective: LSGAN adversarial (MPD + MSD), feature matching (x2), and
L1 mel reconstruction (x45). The discriminator and generator updates compile
into a single jitted device program per step.

Works over any audio dataset meta with a wave first column (VCTK, LJSpeech,
LibriTTS); segment length 8192 samples as in the paper.

Run: ``python -m pytorch_sound_tpu.examples.hifi_gan vctk meta_dir save_dir``
"""

import importlib

import jax
import jax.numpy as jnp
import optax

from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators  # noqa: F401
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401
from pytorch_sound_tpu.ops import gan as gan_ops
from pytorch_sound_tpu.ops import mel as mel_ops
from pytorch_sound_tpu.trainer import LogType, Trainer

MEL_KW = dict(sampling_rate=22050, n_fft=1024, window_size=1024, hop_size=256,
              num_mels=80, fmin=0.0, fmax=8000.0)
LAMBDA_FM = 2.0
LAMBDA_MEL = 45.0


class HiFiGANTrainer(Trainer):
    """Adversarial trainer: params/opt_state are {'gen','mpd','msd'} trees.

    Overrides the single-model step with a fused two-phase GAN step
    (discriminators first, then generator against the updated critics),
    all inside one jit.
    """

    def __init__(self, generator, mpd, msd, gen_optimizer, disc_optimizer,
                 *args, generator_warm_start: str = None,
                 split_step: bool = False, msd_folded: bool = False,
                 **kwargs):
        """``generator_warm_start``: path to a folded generator msgpack (e.g.
        the converted bundled checkpoint) to fine-tune from. Note the bundled
        checkpoints are weight-norm-folded, so warm starts require building
        the generator with use_weight_norm=False.

        ``split_step``: run the adversarial update as TWO jitted programs
        (disc phase, then gen phase) instead of one fused program. Measured
        round-4 at the best masks (benchmarks/probes/results/): fused
        14.04 steps/s vs split 12.53 — XLA CSEs the disc-phase generator
        forward against the gen-phase tape, and one dispatch is saved.
        Split remains useful for per-phase profiling and embeds the Pallas
        fused mel (kernels inside the fused 85M-param program used to
        OOM-kill the remote compile helper; with the round-4 masks the
        discriminators carry no kernels and fused compiles in ~2 min).
        Default False = the fastest measured configuration.

        ``msd_folded``: apply the MSD as ONE block-diagonal grouped stack
        over all scales (`discriminators.msd_apply_folded`) instead of three
        per-scale stacks — identical math and parameter tree (exactness
        covered by tests), 8 convs per pass instead of 24."""
        self.split_step = split_step
        self.msd_folded = msd_folded
        self.generator = generator
        self.mpd = mpd
        self.msd = msd
        self.gen_optimizer = gen_optimizer
        self.disc_optimizer = disc_optimizer
        self.generator_warm_start = generator_warm_start
        super().__init__(generator, gen_optimizer, *args, **kwargs)

    # -- state ----------------------------------------------------------------

    def init_params(self, rng, batch):
        wav = jnp.asarray(batch[0])[:, None, :]
        mel = mel_ops.hifigan_mel_spectrogram(wav[:, 0], **MEL_KW)
        r1, r2, r3 = jax.random.split(rng, 3)
        # jitted inits: one dispatch per model instead of one per parameter
        # (the eager-init dispatch storm dominated GAN bench setup over a
        # degraded tunnel — VERDICT r4); executables persist in the cache
        return {
            'gen': jax.jit(self.generator.init)(r1, mel),
            'mpd': jax.jit(self.mpd.init)(r2, wav),
            'msd': jax.jit(self.msd.init)(r3, wav),
        }

    def _ensure_initialized(self, batch):
        from pytorch_sound_tpu.utils.commons import log
        if self.params is None:
            self.rng, init_rng = jax.random.split(self.rng)
            self.params = self.init_params(init_rng, batch)
            n = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
            log('HiFi-GAN gen+mpd+msd initialized. Total {} params.'.format(n))
            if self.generator_warm_start:
                from flax import serialization
                with open(self.generator_warm_start, 'rb') as r:
                    gen_params = serialization.msgpack_restore(r.read())
                self.params = dict(self.params, gen=serialization.from_state_dict(
                    self.params['gen'], gen_params))
                log('generator warm-started from {}'.format(
                    self.generator_warm_start))
        loaded = False
        if self.opt_state is None:
            # per-group optimizer states (gen vs discriminators)
            self.opt_state = {
                'gen': self.gen_optimizer.init(self.params['gen']),
                'mpd': self.disc_optimizer.init(self.params['mpd']),
                'msd': self.disc_optimizer.init(self.params['msd']),
            }
            loaded = self.load()   # resume (params + per-group opt states)
            if self.step == 0 and self.pretrained_path:
                self.load_pretrained_model()
            if self.mesh is not None:
                self.params = jax.device_put(self.params, self._repl_sharding)
                self.opt_state = jax.device_put(self.opt_state, self._repl_sharding)
        return loaded

    # -- losses ---------------------------------------------------------------

    def _mel(self, wav: jnp.ndarray) -> jnp.ndarray:
        if self.split_step and jax.default_backend() == 'tpu':
            # Pallas fused forward, exact composite VJP. Viable only in the
            # split step: each program stays small enough for the remote
            # compiler (the fused single-program step + this kernel
            # OOM-killed the compile helper).
            from pytorch_sound_tpu.ops.pallas.logmel import (
                fused_hifigan_mel_trainable)
            return fused_hifigan_mel_trainable(wav)
        return mel_ops.hifigan_mel_spectrogram(wav, **MEL_KW)

    def _apply_disc(self, disc_key, params, x):
        """Apply one discriminator family (the MSD optionally folded)."""
        if disc_key == 'msd' and self.msd_folded:
            import pytorch_sound_tpu.models.vocoders.discriminators as disc_mod
            return disc_mod.msd_apply_folded(self.msd, params, x)
        module = self.mpd if disc_key == 'mpd' else self.msd
        return module.apply(params, x)

    def _disc_apply_both(self, disc_key, disc_params, real, fake):
        """One discriminator pass over concat([real, fake]) instead of two.

        Identical math (the discriminators have no cross-batch ops), half
        the conv dispatches per phase, and 2x batch rows for the narrow
        layers the MXU would otherwise under-fill. Returns (real_outs,
        fake_outs) in the per-sub-discriminator (score, features) format."""
        n = real.shape[0]
        both = self._apply_disc(disc_key, disc_params[disc_key],
                                jnp.concatenate([real, fake], axis=0))
        real_outs = [(s[:n], [f[:n] for f in feats]) for s, feats in both]
        fake_outs = [(s[n:], [f[n:] for f in feats]) for s, feats in both]
        return real_outs, fake_outs

    def _disc_loss(self, disc_params, real, fake):
        mpd_real, mpd_fake = self._disc_apply_both('mpd', disc_params,
                                                   real, fake)
        msd_real, msd_fake = self._disc_apply_both('msd', disc_params,
                                                   real, fake)
        return (gan_ops.discriminator_loss(mpd_real, mpd_fake)
                + gan_ops.discriminator_loss(msd_real, msd_fake))

    def _gen_loss(self, gen_params, disc_params, real, mel_real):
        fake = self.generator.apply(gen_params, mel_real)
        mel_fake = self._mel(fake[:, 0])
        mel_l1 = jnp.mean(jnp.abs(mel_fake - mel_real))

        # Real carries no gradient in the generator phase (FM targets only),
        # so evaluate it in its OWN discriminator pass rather than batched
        # with fake: concat would drag the real rows onto the AD tape and
        # the conv backward would compute dx for all 2N rows (half of it
        # discarded). Separate passes keep the real branch a constant
        # subgraph — fwd only, no dx — saving ~half the gen-phase
        # discriminator backward. (The DISC phase keeps the batched concat:
        # there both halves need gradients.)
        real_ng = jax.lax.stop_gradient(real)
        mpd_real = self._apply_disc('mpd', disc_params['mpd'], real_ng)
        msd_real = self._apply_disc('msd', disc_params['msd'], real_ng)
        mpd_fake = self._apply_disc('mpd', disc_params['mpd'], fake)
        msd_fake = self._apply_disc('msd', disc_params['msd'], fake)

        adv = (gan_ops.generator_adversarial_loss(mpd_fake)
               + gan_ops.generator_adversarial_loss(msd_fake))
        fm = (gan_ops.feature_matching_loss(mpd_real, mpd_fake)
              + gan_ops.feature_matching_loss(msd_real, msd_fake))
        loss = adv + LAMBDA_FM * fm + LAMBDA_MEL * mel_l1
        return loss, (adv, fm, mel_l1, fake)

    # -- split two-jit GAN step ----------------------------------------------
    #
    # The adversarial update runs as TWO jitted programs (discriminator phase,
    # then generator phase against the updated critics) instead of one fused
    # program. Semantics match `_train_step` below except the NaN guard is
    # per-phase (each phase reverts its own params on a non-finite loss)
    # rather than all-or-nothing. Why split: the fused 85M-param program costs
    # 15-20 min to compile through the remote-compile tunnel and OOM-kills the
    # compile helper if a Pallas kernel is embedded; two half-size programs
    # compile faster and leave headroom, at the cost of one extra dispatch
    # (~1 ms against a ~150 ms step).

    def _get_train_step(self):
        if not self.split_step:
            return super()._get_train_step()    # fused single-jit (fastest)
        if self._compiled_train_step is None:
            import functools

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def disc_step(disc_params, disc_opt, gen_params, wav):
                real = wav[:, None, :]
                mel_real = self._mel(wav)
                fake = jax.lax.stop_gradient(
                    self.generator.apply(gen_params, mel_real))

                def d_loss_fn(dp):
                    return self._disc_loss(dp, real, fake)

                d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
                new_disc, new_dopt = {}, {}
                for key in ('mpd', 'msd'):
                    updates, new_dopt[key] = self.disc_optimizer.update(
                        d_grads[key], disc_opt[key], disc_params[key])
                    new_disc[key] = optax.apply_updates(disc_params[key], updates)
                ok = jnp.isfinite(d_loss)
                sel = lambda new, old: jax.tree_util.tree_map(   # noqa: E731
                    lambda a, b: jnp.where(ok, a, b)
                    if isinstance(a, jnp.ndarray) else a, new, old)
                return (sel(new_disc, disc_params), sel(new_dopt, disc_opt),
                        d_loss, mel_real)

            @functools.partial(jax.jit, donate_argnums=(0, 1),
                               static_argnames=('is_logging',))
            def gen_step(gen_params, gen_opt, disc_params, wav, mel_real,
                         d_loss, is_logging=False):
                real = wav[:, None, :]

                def g_loss_fn(gp):
                    return self._gen_loss(gp, disc_params, real, mel_real)

                (g_loss, (adv, fm, mel_l1, fake)), g_grads = \
                    jax.value_and_grad(g_loss_fn, has_aux=True)(gen_params)
                g_grads = self._clip_grads(g_grads)
                updates, new_gopt = self.gen_optimizer.update(
                    g_grads, gen_opt, gen_params)
                new_gen = optax.apply_updates(gen_params, updates)
                ok = jnp.isfinite(g_loss)
                sel = lambda new, old: jax.tree_util.tree_map(   # noqa: E731
                    lambda a, b: jnp.where(ok, a, b)
                    if isinstance(a, jnp.ndarray) else a, new, old)
                meta = {}
                if is_logging:
                    meta = {
                        'loss': (g_loss, LogType.SCALAR),
                        'disc_loss': (d_loss, LogType.SCALAR),
                        'adv': (adv, LogType.SCALAR),
                        'feature_matching': (fm, LogType.SCALAR),
                        'mel_l1': (mel_l1, LogType.SCALAR),
                        'fake_audio': (fake[0, 0], LogType.AUDIO),
                    }
                from pytorch_sound_tpu.trainer import _wrap_meta
                return (sel(new_gen, gen_params), sel(new_gopt, gen_opt),
                        g_loss, _wrap_meta(meta))

            def step(params, opt_state, batch, is_logging=False):
                wav = batch[0]
                disc_params = {'mpd': params['mpd'], 'msd': params['msd']}
                disc_opt = {'mpd': opt_state['mpd'], 'msd': opt_state['msd']}
                new_disc, new_dopt, d_loss, mel_real = disc_step(
                    disc_params, disc_opt, params['gen'], wav)
                new_gen, new_gopt, g_loss, meta = gen_step(
                    params['gen'], opt_state['gen'], new_disc, wav, mel_real,
                    d_loss, is_logging=is_logging)
                return ({'gen': new_gen, **new_disc},
                        {'gen': new_gopt, **new_dopt}, g_loss, meta)

            # exposed for per-phase timing probes (benchmarks/probes/)
            self._disc_step_jit = disc_step
            self._gen_step_jit = gen_step
            self._compiled_train_step = step
        return self._compiled_train_step

    # -- fused GAN step (reference implementation; superseded by the split
    #    two-jit step above, kept for documentation/fallback) ----------------

    def _train_step(self, params, opt_state, batch, is_logging: bool):
        real = batch[0][:, None, :]                       # (N, 1, T)
        mel_real = self._mel(real[:, 0])

        # phase 1: discriminators vs a detached fake
        fake_detached = jax.lax.stop_gradient(
            self.generator.apply(params['gen'], mel_real))

        def d_loss_fn(dp):
            return self._disc_loss(dp, real, fake_detached)

        disc_params = {'mpd': params['mpd'], 'msd': params['msd']}
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
        new_disc, new_dopt = {}, {}
        for key in ('mpd', 'msd'):
            updates, new_dopt[key] = self.disc_optimizer.update(
                d_grads[key], opt_state[key], params[key])
            new_disc[key] = optax.apply_updates(params[key], updates)

        # phase 2: generator against the updated critics
        def g_loss_fn(gp):
            return self._gen_loss(gp, new_disc, real, mel_real)

        (g_loss, (adv, fm, mel_l1, fake)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(params['gen'])
        g_grads = self._clip_grads(g_grads)
        updates, new_gopt = self.gen_optimizer.update(
            g_grads, opt_state['gen'], params['gen'])
        new_gen = optax.apply_updates(params['gen'], updates)

        ok = jnp.isfinite(g_loss) & jnp.isfinite(d_loss)
        select = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b) if isinstance(a, jnp.ndarray) else a,
            new, old)
        new_params = select({'gen': new_gen, **new_disc}, params)
        new_opt = select({'gen': new_gopt, **new_dopt}, opt_state)

        meta = {}
        if is_logging:
            meta = {
                'loss': (g_loss, LogType.SCALAR),
                'disc_loss': (d_loss, LogType.SCALAR),
                'adv': (adv, LogType.SCALAR),
                'feature_matching': (fm, LogType.SCALAR),
                'mel_l1': (mel_l1, LogType.SCALAR),
                'fake_audio': (fake[0, 0], LogType.AUDIO),
            }
        from pytorch_sound_tpu.trainer import _wrap_meta
        return new_params, new_opt, g_loss, _wrap_meta(meta)

    def _eval_step(self, params, batch):
        real = batch[0][:, None, :]
        mel_real = self._mel(real[:, 0])
        fake = self.generator.apply(params['gen'], mel_real)
        mel_l1 = jnp.mean(jnp.abs(self._mel(fake[:, 0]) - mel_real))
        meta = {'loss': (mel_l1, LogType.SCALAR),
                'mel_l1': (mel_l1, LogType.SCALAR)}
        from pytorch_sound_tpu.trainer import _wrap_meta
        return mel_l1, _wrap_meta(meta)


def main(dataset: str, meta_dir: str, save_dir: str, batch_size: int = 16,
         num_workers: int = 2, fix_len: int = 8192, max_step: int = 500000,
         valid_max_step: int = 20, save_interval: int = 5000,
         log_interval: int = 100, lr: float = 2e-4, arch: str = 'hifi_gan_v2',
         msd_pallas: int = -1, mpd_pallas: bool = False,
         msd_folded: bool = False, disc_bf16: bool = False):
    """Train a HiFi-GAN on any wave-first dataset (vctk, ljspeech, libri_tts).

    ``msd_pallas``: -1 (default) = the measured-fastest per-layer backend
    mask on v5e (`ScaleDiscriminator.backends`, whose 'auto' entries resolve
    to the on-device-A/B'd XLA table); >= 0 forces the first N MSD layers
    onto the Pallas grouped-conv kernel (probe sessions).
    ``mpd_pallas``: run the MPD's period-folded dense stack on the kernel.
    ``msd_folded``: apply the MSD as one block-diagonal grouped stack
    (exact same math/params; measured SLOWER on v5e at the default config —
    8.48 vs 13.83 steps/s, the padded pooled scales cost more FLOPs than the
    saved dispatches — so off by default; see gan_r5.log).
    ``disc_bf16``: run both critics with bf16 activations/weights (f32
    master params + f32 MXU accumulate). Quality-guarded (drift 0.0011 over
    200 steps, exp_bf16_quality.py) but measured no faster than f32 on v5e
    (13.23 vs 13.83 steps/s — DEFAULT precision already multiplies in bf16
    on the MXU), so off by default.
    """
    from pytorch_sound_tpu.utils.commons import enable_compilation_cache
    enable_compilation_cache()   # warm restarts skip the long first compile
    data_mod = importlib.import_module('pytorch_sound_tpu.data.meta.' + dataset)
    train_loader, valid_loader = data_mod.get_datasets(
        meta_dir, batch_size=batch_size, num_workers=num_workers,
        fix_len=fix_len, pad_multiple=fix_len)

    # channels-last generator: measured 2.5x faster training forward on v5e
    # (narrow-channel convs ride the NTC grouped-conv kernel; NCT falls back
    # to XLA's layout). Parameter shapes are format-independent.
    import pytorch_sound_tpu.models.vocoders.discriminators as disc_mod
    generator = build_model(arch, extra_kwargs=dict(data_format='NTC'))
    cdt = 'bf16' if disc_bf16 else None
    if mpd_pallas:
        mpd = disc_mod.MultiPeriodDiscriminator(backends=('pallas',) * 6,
                                                compute_dtype=cdt)
    else:
        mpd = disc_mod.MultiPeriodDiscriminator(compute_dtype=cdt)
    if msd_pallas < 0:
        msd = disc_mod.MultiScaleDiscriminator(n_scales=3, width=1.0,
                                               compute_dtype=cdt)
    else:
        msd = disc_mod.MultiScaleDiscriminator(
            n_scales=3, width=1.0, compute_dtype=cdt,
            backends=('pallas',) * msd_pallas + ('xla',) * (8 - msd_pallas))
    gen_opt = optax.adamw(lr, b1=0.8, b2=0.99)
    disc_opt = optax.adamw(lr, b1=0.8, b2=0.99)

    trainer = HiFiGANTrainer(
        generator, mpd, msd, gen_opt, disc_opt,
        train_loader, valid_loader,
        max_step=max_step, valid_max_step=valid_max_step,
        save_interval=save_interval, log_interval=log_interval,
        save_dir=save_dir, save_prefix='hifi_gan', grad_norm=0.0,
        msd_folded=msd_folded)
    return trainer.run()


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(main)
