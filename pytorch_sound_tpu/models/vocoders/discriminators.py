"""HiFi-GAN discriminators (multi-period + multi-scale), flax.

Beyond-parity capability: the reference ships only the pretrained generator
(`/root/reference/pytorch_sound/models/vocoders/hifi_gan.py`) — no training
recipe. These are the paper's (arXiv 2010.05646) MPD/MSD discriminators so the
vocoder family is trainable end-to-end on TPU (see examples/hifi_gan.py).

Each discriminator returns (score_map, [feature_maps...]) for LSGAN +
feature-matching losses.

Precision: discriminator convs default to ``precision='default'`` (single-pass
bf16 MXU, f32 accumulate). Measured on the v5e build the MSD's grouped k=41
convs are ~3.4x faster at DEFAULT than HIGHEST — the opposite of the
generator's dense convs (see ops/nn.py) — and discriminators have no numeric
parity target (they are training-only critics; bf16 GAN critics are standard
mixed-precision practice). Pass ``precision='highest'`` for f32 contractions.
On CPU (tests) DEFAULT is full f32, so goldens are unaffected.
"""

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.models import register_model, register_model_architecture
from pytorch_sound_tpu.models.vocoders.hifi_gan import WNConv1d, _normal_init


class WNConv2d(nn.Module):
    """Conv2d with torch-style weight normalization (dim=0), NCHW layout."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_weight_norm: bool = True
    precision: str = 'default'
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        shape = (self.out_channels, self.in_channels, kh, kw)
        if self.use_weight_norm:
            v = self.param('v', _normal_init(), shape)
            g = self.param('g', lambda key, s: jnp.linalg.norm(
                v.reshape(self.out_channels, -1), axis=1).reshape(s),
                (self.out_channels, 1, 1, 1))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3), keepdims=True) + 1e-12)
            weight = g * v / norm
        else:
            weight = self.param('weight', _normal_init(), shape)
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        if self.compute_dtype == 'bf16':
            x = x.astype(jnp.bfloat16)
            weight = weight.astype(jnp.bfloat16)
        prec = (jax.lax.Precision.HIGHEST if self.precision == 'highest'
                else jax.lax.Precision.DEFAULT)
        out = jax.lax.conv_general_dilated(
            x, weight, window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            precision=prec,
            preferred_element_type=(x.dtype if x.dtype == jnp.bfloat16
                                    else jnp.float32))
        out = out + bias[None, :, None, None]
        return out.astype(jnp.bfloat16) if self.compute_dtype == 'bf16' else out


class PeriodDiscriminator(nn.Module):
    """Folds the wave into (T/period, period) and runs a (5,1)-conv stack.

    TPU formulation: the paper's 2D convs have kernel/stride 1 along the
    period axis, so every period column is convolved independently — the
    whole stack IS a batch of dense conv1d's. Fold the period into the
    batch dim once and run channels-last (NTC) conv1d layers: XLA gets
    MXU-shaped dense 1-d convs instead of NCHW 2D convs whose minor
    spatial extent is 2..11 (pad-to-tile poison on TPU). Identical math
    to the 2D stack; the LSGAN/FM losses are elementwise means, so the
    (N*P, H, C) feature layout is free.
    """

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Sequence[int] = (32, 128, 512, 1024)
    precision: str = 'default'
    # Per-layer conv backend (len(channels)+1 body layers + conv_post).
    backends: Sequence[str] = ('xla',) * 6
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        n, c, t = x.shape
        pad = (-t) % self.period
        if pad:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, pad)], mode='reflect')
        h = (t + pad) // self.period
        # (N, C, H, P) -> (N, P, H, C) -> (N*P, H, C): period into batch
        x = x.reshape(n, c, h, self.period).transpose(0, 3, 2, 1) \
             .reshape(n * self.period, h, c)

        features = []
        kpad = (self.kernel_size - 1) // 2
        in_ch = c

        def feat(y):
            # leading dim must be the true batch (losses and the batched
            # real+fake pass slice feature maps along axis 0)
            return y.reshape(n, self.period, y.shape[1], y.shape[2])

        for i, ch in enumerate(self.channels):
            x = WNConv1d(in_ch, ch, self.kernel_size, stride=self.stride,
                         padding=kpad, precision=self.precision,
                         data_format='NTC', fused_slope=0.1,
                         backend=self.backends[i],
                         compute_dtype=self.compute_dtype,
                         name='conv_%d' % i)(x)
            features.append(feat(x))
            in_ch = ch
        top = self.channels[-1]
        x = WNConv1d(in_ch, top, self.kernel_size, padding=kpad,
                     precision=self.precision, data_format='NTC',
                     fused_slope=0.1, backend=self.backends[len(self.channels)],
                     compute_dtype=self.compute_dtype,
                     name='conv_%d' % len(self.channels))(x)
        features.append(feat(x))
        x = WNConv1d(top, 1, 3, padding=1, precision=self.precision,
                     data_format='NTC',
                     backend=self.backends[len(self.channels) + 1],
                     compute_dtype=self.compute_dtype,
                     name='conv_post')(x)
        features.append(feat(x))
        return x.reshape(n, -1), features


def scale_disc_layout(width: float) -> List[Tuple[int, int, int, int, int, int]]:
    """Per-layer (in, out, kernel, stride, groups, padding) of the paper's
    scale-discriminator body at a channel-width multiplier."""
    def w(ch):
        return max(8, int(ch * width))
    return [
        (1, w(128), 15, 1, 1, 7),
        (w(128), w(128), 41, 2, 4, 20),
        (w(128), w(256), 41, 2, 8, 20),
        (w(256), w(512), 41, 4, 8, 20),
        (w(512), w(1024), 41, 4, 8, 20),
        (w(1024), w(1024), 41, 1, 8, 20),
        (w(1024), w(1024), 5, 1, 1, 2),
    ]


class ScaleDiscriminator(nn.Module):
    """Grouped long-kernel conv1d stack over the raw wave.

    ``width`` scales channel counts (1.0 = the paper's 128..1024 stack).

    Runs channels-last (NTC) end-to-end: input (N, C, T) is transposed once,
    every layer is a fused bias+leaky_relu grouped conv through the Pallas
    MXU kernel (`ops/pallas/grouped_conv.py`) on TPU, and the returned
    feature maps are (N, T', C') — the GAN losses (`ops/gan.py`) are
    elementwise, so the layout is free, and no per-layer transposes hit HBM.
    """

    width: float = 1.0
    precision: str = 'default'
    # Per-layer conv backend (7 body layers + conv_post). 'auto' resolves
    # each grouped layer to the measured winner on v5e (dense-expanded XLA
    # conv when cin/groups <= 32, native grouped XLA otherwise — on-device
    # A/B in benchmarks/probes/results/, 2026-08-19); 'xla' pins XLA's NTC
    # conv; 'pallas' opts into the Pallas kernel. The dense k=5 top layer
    # and conv_post stay pinned to XLA (the kernel measured slower on every
    # probed dense critic geometry — see docs/KERNELS.md).
    backends: Sequence[str] = ('auto', 'auto', 'auto', 'auto',
                               'auto', 'auto', 'xla', 'xla')
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        n = x.shape[0]
        x = x.swapaxes(1, 2)   # (N, C, T) -> (N, T, C), once
        features = []

        for i, (ic, oc, k, s, g, p) in enumerate(scale_disc_layout(self.width)):
            x = WNConv1d(ic, oc, k, stride=s, padding=p, groups=g,
                         precision=self.precision, data_format='NTC',
                         fused_slope=0.1, backend=self.backends[i],
                         compute_dtype=self.compute_dtype,
                         name='conv_%d' % i)(x)
            features.append(x)
        top = scale_disc_layout(self.width)[-1][1]
        x = WNConv1d(top, 1, 3, padding=1, precision=self.precision,
                     data_format='NTC', backend=self.backends[7],
                     compute_dtype=self.compute_dtype,
                     name='conv_post')(x)
        features.append(x)
        return x.reshape(n, -1), features


@register_model('hifi_gan_mpd')
class MultiPeriodDiscriminator(nn.Module):
    """Period discriminators at the paper's prime periods."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Sequence[int] = (32, 128, 512, 1024)
    precision: str = 'default'
    # Per-layer conv backend, forwarded to every PeriodDiscriminator.
    backends: Sequence[str] = PeriodDiscriminator.backends
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        outs = []
        for p in self.periods:
            outs.append(PeriodDiscriminator(
                p, channels=tuple(self.channels), precision=self.precision,
                backends=tuple(self.backends),
                compute_dtype=self.compute_dtype,
                name='period_%d' % p)(x))
        return outs   # list of (score, features)


@register_model('hifi_gan_msd')
class MultiScaleDiscriminator(nn.Module):
    """Scale discriminators on the wave and 2 average-pooled octaves."""

    n_scales: int = 3
    width: float = 1.0
    precision: str = 'default'
    backends: Sequence[str] = ScaleDiscriminator.backends
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        outs = []
        for i in range(self.n_scales):
            if i > 0:
                # pool channels-last (avg_pool is NTC-native); the scale
                # discriminators transpose once internally
                x = nn.avg_pool(x.swapaxes(1, 2), (4,), strides=(2,),
                                padding=((2, 2),)).swapaxes(1, 2)
            outs.append(ScaleDiscriminator(width=self.width,
                                           precision=self.precision,
                                           backends=tuple(self.backends),
                                           compute_dtype=self.compute_dtype,
                                           name='scale_%d' % i)(x))
        return outs


def _msd_valid_lengths(t: int, n_scales: int) -> List[int]:
    """Valid sample count of each MSD scale (avg_pool k=4 s=2 pad (2,2))."""
    lens = [t]
    for _ in range(n_scales - 1):
        lens.append((lens[-1] + 4 - 4) // 2 + 1)
    return lens


def msd_apply_folded(msd: MultiScaleDiscriminator, variables, x: jnp.ndarray,
                     backend: str = 'auto'):
    """Run ``msd`` as ONE block-diagonal grouped stack over all scales.

    Same math, same parameter tree, same (score, features) output structure
    as ``msd.apply`` — but the three per-scale stacks (24 convs) execute as
    8 convs: the scales are zero-padded to the longest scale's length and
    stacked along the CHANNEL axis, and each layer becomes a single grouped
    conv whose block-diagonal weight is the concat of the per-scale
    weight-normed weights (groups' = n_scales * groups, so group u of scale
    s reads exactly scale s's channels). Padded-tail positions are re-zeroed
    after every layer (the bias would otherwise leak into them), which makes
    every VALID output bit-equal to the unfolded formulation: a conv window
    of a valid position only ever reads valid samples or zeros — the same
    zeros XLA's conv padding supplies in the unfolded run.

    Motivation (round-4 probes): the MSD stack measured 22.8 ms fwd+dx+dw
    against a ~2-6 ms roofline plan — per-op overhead, not FLOPs, dominates,
    so fewer/wider ops win even though the pooled scales pay padded time
    (3T vs 1.75T positions).
    """
    n, _c, t = x.shape
    n_scales = msd.n_scales
    layout = scale_disc_layout(msd.width)
    params = variables['params'] if 'params' in variables else variables
    dt = jnp.bfloat16 if msd.compute_dtype == 'bf16' else jnp.float32

    # pooled scales, zero-padded to the top scale's length, channel-stacked
    lens = _msd_valid_lengths(t, n_scales)
    xs, cur = [], x.swapaxes(1, 2)                      # (N, T, 1)
    for i in range(n_scales):
        if i > 0:
            cur = nn.avg_pool(cur, (4,), strides=(2,), padding=((2, 2),))
        xs.append(jnp.pad(cur, [(0, 0), (0, t - cur.shape[1]), (0, 0)]))
    h = jnp.concatenate(xs, axis=-1).astype(dt)         # (N, T, n_scales)

    def folded_wb(layer_name, expand_groups):
        """Concat the scales' weight-normed weights into one block-diagonal
        grouped-conv weight. With ``expand_groups`` the per-scale GROUPED
        weight is first zero-expanded to a per-scale DENSE block (the
        narrow-cg lever the unfolded auto table uses) so the folded conv
        runs at groups = n_scales with a full-width reduction — routing the
        folded layer through the generic auto table instead would
        dense-expand over ALL n_scales*g groups and execute n_scales*g x
        the true MACs (measured 2.7x total step FLOPs, gan_r5 round 1)."""
        ws, bs = [], []
        for s in range(n_scales):
            p = params['scale_%d' % s][layer_name]
            v, g, b = p['v'], p['g'], p['bias']
            norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True) + 1e-12)
            w = g * v / norm
            if expand_groups is not None and expand_groups > 1:
                oc_s, cg, k = w.shape
                ocg = oc_s // expand_groups
                eye = jnp.eye(expand_groups, dtype=w.dtype)
                w = jnp.einsum('gock,gh->gohck',
                               w.reshape(expand_groups, ocg, cg, k), eye)
                w = w.reshape(oc_s, expand_groups * cg, k)
            ws.append(w)
            bs.append(b)
        return (jnp.concatenate(ws, axis=0).astype(dt),
                jnp.concatenate(bs, axis=0))

    from pytorch_sound_tpu.ops.pallas.grouped_conv import grouped_conv1d_ntc
    features = [[] for _ in range(n_scales)]
    buf_len = t
    for i, (ic, oc, k, s, g, p) in enumerate(layout):
        # mirror the unfolded auto table per layer: narrow per-group
        # reductions (cg <= 32) ride a per-scale dense expansion (folded
        # groups = n_scales); wide ones stay native grouped (n_scales * g)
        narrow = (ic // g) <= 32
        w, b = folded_wb('conv_%d' % i, g if narrow else None)
        h = grouped_conv1d_ntc(h, w, b, stride=s, padding=p,
                               groups=n_scales * (1 if narrow else g),
                               slope=0.1,
                               backend=backend,
                               precision=('highest' if msd.precision ==
                                          'highest' else 'default'))
        if msd.compute_dtype == 'bf16':
            h = h.astype(jnp.bfloat16)
        buf_len = (buf_len + 2 * p - k) // s + 1
        lens = [(l + 2 * p - k) // s + 1 for l in lens]
        # re-zero the padded tails: (N, T', S*oc) -> (N, T', S, oc) * mask
        mask = np.zeros((buf_len, n_scales, 1), np.float32)
        for si, li in enumerate(lens):
            mask[:li, si] = 1.0
        h4 = h.reshape(h.shape[0], buf_len, n_scales, oc) * jnp.asarray(
            mask, dtype=h.dtype)
        for si, li in enumerate(lens):
            features[si].append(h4[:, :li, si, :])
        h = h4.reshape(h.shape[0], buf_len, n_scales * oc)
    w, b = folded_wb('conv_post', None)
    h = grouped_conv1d_ntc(h, w, b, stride=1, padding=1, groups=n_scales,
                           backend=backend,
                           precision=('highest' if msd.precision == 'highest'
                                      else 'default'))
    # conv_post (k=3, s=1, p=1) preserves length: buf_len and lens unchanged
    h4 = h.reshape(h.shape[0], buf_len, n_scales, 1)
    outs = []
    for si, li in enumerate(lens):
        score = h4[:, :li, si, 0].reshape(n, -1)
        features[si].append(h4[:, :li, si, :])
        outs.append((score, features[si]))
    return outs


@register_model_architecture('hifi_gan_mpd', 'hifi_gan_mpd_base')
def hifi_gan_mpd_base():
    return {'periods': (2, 3, 5, 7, 11), 'channels': (32, 128, 512, 1024)}


@register_model_architecture('hifi_gan_mpd', 'hifi_gan_mpd_small')
def hifi_gan_mpd_small():
    return {'periods': (2, 3), 'channels': (8, 16)}


@register_model_architecture('hifi_gan_msd', 'hifi_gan_msd_base')
def hifi_gan_msd_base():
    return {'n_scales': 3, 'width': 1.0}


@register_model_architecture('hifi_gan_msd', 'hifi_gan_msd_small')
def hifi_gan_msd_small():
    return {'n_scales': 2, 'width': 0.0625}
