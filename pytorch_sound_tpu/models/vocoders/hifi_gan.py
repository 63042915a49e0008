"""HiFi-GAN generator (arXiv 2010.05646) as a flax module.

Parity target: `/root/reference/pytorch_sound/models/vocoders/hifi_gan.py` —
same architecture registry names (hifi_gan_v1/v2/v3), same conv geometry
(conv_pre k7 -> per-stage [leaky_relu 0.1, ConvTranspose upsample, mean of
multi-kernel ResBlocks] -> leaky_relu(0.01) -> conv_post k7 -> tanh), and
torch-layout parameters (weight (C_out, C_in, K) / transpose (C_in, C_out, K))
so converted torch checkpoints map 1:1.

Weight normalization: ``use_weight_norm=True`` stores (g, v) pairs exactly like
torch's weight_norm (norm over all dims but 0); ``False`` stores folded plain
weights — the inference configuration after the reference's
``remove_weight_norm()``. ``fold_weight_norm_params`` converts the former into
the latter.

TPU notes: convs run through lax.conv_general_dilated on static shapes; the
dilated ResBlock stacks are the Pallas dilated-conv kernel target (SURVEY.md
§3.3 HOT LOOP #4).
"""

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_sound_tpu.models import register_model, register_model_architecture
from pytorch_sound_tpu.ops.nn import conv1d, conv_transpose1d


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _normal_init(std: float = 0.01):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


class WNConv1d(nn.Module):
    """Conv1d with optional torch-style weight normalization (dim=0).

    ``data_format='NTC'`` runs the conv channels-last through
    :func:`ops.pallas.grouped_conv.grouped_conv1d_ntc` (the MXU-shaped
    grouped-conv kernel on TPU, XLA conv elsewhere) with an optionally fused
    leaky_relu (``fused_slope``); parameter names/shapes are identical to the
    NCT path so checkpoints interoperate. Dilation is NCT-only.

    ``compute_dtype='bf16'`` casts input and (post-weight-norm) weight to
    bfloat16 and returns a bfloat16 output — half the HBM traffic on
    bandwidth-bound layers. Master params stay f32 (the casts are on the AD
    tape, so grads/optimizer run in f32) and the conv still accumulates in
    f32 via ``preferred_element_type``. Meant for discriminator critics
    (mixed-precision GAN practice); generator layers with numeric parity
    targets should leave it None.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    groups: int = 1
    use_weight_norm: bool = True
    precision: str = 'auto'
    data_format: str = 'NCT'
    fused_slope: float = None
    backend: str = 'auto'
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (self.out_channels, self.in_channels // self.groups,
                 self.kernel_size)
        if self.use_weight_norm:
            v = self.param('v', _normal_init(), shape)
            g = self.param('g', lambda key, s: jnp.linalg.norm(
                v.reshape(self.out_channels, -1), axis=1).reshape(s), (self.out_channels, 1, 1))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True) + 1e-12)
            weight = g * v / norm
        else:
            weight = self.param('weight', _normal_init(), shape)
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        if self.compute_dtype == 'bf16':
            x = x.astype(jnp.bfloat16)
            weight = weight.astype(jnp.bfloat16)
        if self.data_format == 'NTC':
            from pytorch_sound_tpu.ops.pallas.grouped_conv import \
                grouped_conv1d_ntc
            out = grouped_conv1d_ntc(
                x, weight, bias, stride=self.stride, padding=self.padding,
                groups=self.groups, dilation=self.dilation,
                slope=self.fused_slope, backend=self.backend,
                precision=('highest' if self.precision == 'highest'
                           else 'default'))
        else:
            out = conv1d(x, weight, bias, stride=self.stride,
                         padding=self.padding, dilation=self.dilation,
                         groups=self.groups, precision=self.precision)
            if self.fused_slope is not None:
                out = jnp.where(out > 0, out, self.fused_slope * out)
        if self.compute_dtype == 'bf16':
            # XLA fuses the downcast into the conv epilogue: inter-layer
            # activations land in HBM as bf16
            out = out.astype(jnp.bfloat16)
        return out


class WNConvTranspose1d(nn.Module):
    """ConvTranspose1d with optional torch-style weight normalization.

    Parameter layout (C_in, C_out, K) and norm over dims (1, 2), as torch.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_weight_norm: bool = True
    precision: str = 'auto'
    data_format: str = 'NCT'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (self.in_channels, self.out_channels, self.kernel_size)
        if self.use_weight_norm:
            v = self.param('v', _normal_init(), shape)
            g = self.param('g', lambda key, s: jnp.linalg.norm(
                v.reshape(self.in_channels, -1), axis=1).reshape(s), (self.in_channels, 1, 1))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True) + 1e-12)
            weight = g * v / norm
        else:
            weight = self.param('weight', _normal_init(), shape)
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        if self.data_format == 'NTC':
            from pytorch_sound_tpu.ops.pallas.grouped_conv import \
                conv_transpose1d_ntc
            return conv_transpose1d_ntc(
                x, weight, bias, stride=self.stride, padding=self.padding,
                precision=('highest' if self.precision == 'highest'
                           else 'default'))
        return conv_transpose1d(x, weight, bias, stride=self.stride,
                                padding=self.padding)


class ResBlock1(nn.Module):
    """Two 3-conv stacks with dilations (reference `hifi_gan.py:32-69`)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    use_weight_norm: bool = True
    precision: str = 'auto'
    data_format: str = 'NCT'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ntc = self.data_format == 'NTC'
        for j, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, 0.1)
            # NTC: the mid-block leaky_relu fuses into convs1's epilogue
            xt = WNConv1d(self.channels, self.channels, self.kernel_size,
                          dilation=d, padding=get_padding(self.kernel_size, d),
                          use_weight_norm=self.use_weight_norm,
                          precision=self.precision,
                          data_format=self.data_format,
                          fused_slope=0.1 if ntc else None,
                          name='convs1_%d' % j)(xt)
            if not ntc:
                xt = nn.leaky_relu(xt, 0.1)
            xt = WNConv1d(self.channels, self.channels, self.kernel_size,
                          dilation=1, padding=get_padding(self.kernel_size, 1),
                          use_weight_norm=self.use_weight_norm,
                          precision=self.precision,
                          data_format=self.data_format,
                          name='convs2_%d' % j)(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Two single dilated convs (reference `hifi_gan.py:72-93`)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    use_weight_norm: bool = True
    precision: str = 'auto'
    data_format: str = 'NCT'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, 0.1)
            xt = WNConv1d(self.channels, self.channels, self.kernel_size,
                          dilation=d, padding=get_padding(self.kernel_size, d),
                          use_weight_norm=self.use_weight_norm,
                          precision=self.precision,
                          data_format=self.data_format,
                          name='convs_%d' % j)(xt)
            x = xt + x
        return x


@register_model('hifi_gan')
class Generator(nn.Module):
    """mel (N, 80, T) -> wav (N, 1, T * prod(upsample_rates))."""

    resblock: str = '1'
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    in_channels: int = 80
    use_weight_norm: bool = True
    precision: str = 'auto'
    data_format: str = 'NCT'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == '1' else ResBlock2
        ntc = self.data_format == 'NTC'
        if ntc:
            # channels-last end-to-end: one transpose in, one out; every
            # conv/convT rides the Pallas folded-matmul kernels on TPU
            # (ops/pallas/grouped_conv.py) — the training-fwd fast path.
            # Param tree is identical to NCT, so checkpoints interoperate.
            x = x.swapaxes(1, 2)

        x = WNConv1d(self.in_channels, self.upsample_initial_channel, 7,
                     padding=3, use_weight_norm=self.use_weight_norm,
                     precision=self.precision, data_format=self.data_format,
                     name='conv_pre')(x)
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, 0.1)
            x = WNConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2,
                                  use_weight_norm=self.use_weight_norm,
                                  precision=self.precision,
                                  data_format=self.data_format,
                                  name='ups_%d' % i)(x)
            ch //= 2
            xs = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                block = res_cls(ch, rk, tuple(rd),
                                use_weight_norm=self.use_weight_norm,
                                precision=self.precision,
                                data_format=self.data_format,
                                name='resblocks_%d' % (i * num_kernels + j))
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels
        x = nn.leaky_relu(x)             # default 0.01 slope, as the reference
        x = WNConv1d(ch, 1, 7, padding=3, use_weight_norm=self.use_weight_norm,
                     precision=self.precision, data_format=self.data_format,
                     name='conv_post')(x)
        if ntc:
            x = x.swapaxes(1, 2)
        return jnp.tanh(x)


def generator_apply_fused(config, params: Dict[str, Any],
                          mel: 'jnp.ndarray',
                          full_stage: bool = True,
                          precision: str = 'highest') -> 'jnp.ndarray':
    """Inference forward equal to ``Generator.__call__`` with Pallas fusion.

    ``full_stage=True`` (default) runs each eligible upsample stage as ONE
    kernel — leaky_relu + ConvTranspose1d + the 3 ResBlocks, with conv_post +
    tanh folded into the final stage (:mod:`pytorch_sound_tpu.ops.pallas.gen_stage`).
    ``full_stage=False`` keeps round-1's resblock-only fusion
    (:mod:`...ops.pallas.resblock`) with the upsamples in XLA.
    Ineligible stages (channel/packing/geometry constraints) fall back
    per-stage; numerics match flax at f32-HIGHEST either way.

    :param config: the Generator module (hyperparameter source); must use
        folded weights (use_weight_norm=False); fusion needs resblock='1'
    :param params: {'params': {...}} folded tree
    """
    from pytorch_sound_tpu.ops.nn import conv1d, conv_transpose1d
    from pytorch_sound_tpu.ops.pallas import gen_stage as gs
    from pytorch_sound_tpu.ops.pallas import resblock as rb

    p = params['params'] if 'params' in params else params
    num_kernels = len(config.resblock_kernel_sizes)
    kernel_sizes = tuple(config.resblock_kernel_sizes)
    dilations = tuple(tuple(d) for d in config.resblock_dilation_sizes)
    n_stages = len(config.upsample_rates)

    ch = config.upsample_initial_channel
    # conv_pre folds into a wide (ch/2 > 128) fused stage 0 (one less HBM
    # round trip of the widest activation); otherwise it runs in XLA here
    fold_pre = (full_stage and config.resblock == '1' and ch // 2 > 128
                and mel.shape[1] <= 128
                and gs.stage_eligible(ch // 2, mel.shape[0],
                                      config.upsample_rates[0],
                                      config.upsample_kernel_sizes[0]))
    x = mel if fold_pre else conv1d(mel, p['conv_pre']['weight'],
                                    p['conv_pre']['bias'], padding=3)
    for i, (u, k) in enumerate(zip(config.upsample_rates,
                                   config.upsample_kernel_sizes)):
        ch //= 2
        last = i == n_stages - 1
        stage = {('resblocks_%d' % j): p['resblocks_%d' % (i * num_kernels + j)]
                 for j in range(num_kernels)}
        if (full_stage and config.resblock == '1'
                and gs.stage_eligible(ch, x.shape[0], u, k)):
            x = gs.fused_generator_stage(
                x, p['ups_%d' % i], stage, ch, u, k, kernel_sizes, dilations,
                conv_post=p['conv_post'] if last else None,
                conv_pre=p['conv_pre'] if (fold_pre and i == 0) else None,
                precision=precision)
            if last:
                return x            # conv_post + tanh already applied
            continue
        x = nn.leaky_relu(x, 0.1)
        up = p['ups_%d' % i]
        x = conv_transpose1d(x, up['weight'], up['bias'], stride=u,
                             padding=(k - u) // 2)
        if config.resblock == '1' and rb.stage_eligible(ch, x.shape[0]):
            x = rb.fused_resblock_stage(x, stage, ch, kernel_sizes, dilations)
        else:   # fallback: flax resblocks (always correct)
            res_cls = ResBlock1 if config.resblock == '1' else ResBlock2
            xs = None
            for j, (rk, rd) in enumerate(zip(kernel_sizes, dilations)):
                block = res_cls(ch, rk, rd, use_weight_norm=False)
                out = block.apply({'params': stage['resblocks_%d' % j]}, x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels
    x = nn.leaky_relu(x)
    x = conv1d(x, p['conv_post']['weight'], p['conv_post']['bias'], padding=3)
    return jnp.tanh(x)


def fold_weight_norm_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every (g, v) weight-norm pair into a plain 'weight' — the
    functional equivalent of the reference's ``remove_weight_norm()``."""
    def fold(node):
        if isinstance(node, dict):
            if 'g' in node and 'v' in node:
                v = node['v']
                axes = tuple(range(1, v.ndim))
                norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
                out = {k: fold(val) for k, val in node.items() if k not in ('g', 'v')}
                out['weight'] = node['g'] * v / norm
                return out
            return {k: fold(v) for k, v in node.items()}
        return node
    return fold(params)


def apply_weight_norm(params: Dict[str, Any]) -> Dict[str, Any]:
    """Split every plain 'weight' into a torch-style (g, v) weight-norm pair —
    the inverse of :func:`fold_weight_norm_params` (functional counterpart of
    the reference's ``apply_weight_norm``, `hifi_gan.py:24-27`). g holds the
    per-out-channel norm, v the direction (norm over all dims but 0)."""
    def split(node):
        if isinstance(node, dict):
            if 'weight' in node and 'g' not in node:
                w = node['weight']
                out = {k: split(val) for k, val in node.items()
                       if k != 'weight'}
                if getattr(w, 'ndim', 0) >= 2:
                    axes = tuple(range(1, w.ndim))
                    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
                    out['g'] = g
                    out['v'] = w
                else:
                    out['weight'] = w
                return out
            return {k: split(v) for k, v in node.items()}
        return node
    return split(params)


def init_weights(key, params: Dict[str, Any], mean: float = 0.0,
                 std: float = 0.01) -> Dict[str, Any]:
    """Re-draw every conv kernel ('weight' or 'v' leaf) from N(mean, std) —
    the reference's ``init_weights`` module hook (`hifi_gan.py:17-20`) as a
    pure param-tree transform."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, (path, leaf) in zip(keys, leaves):
        name = str(path[-1]) if path else ''
        if any(t in name for t in ('weight', "'v'")) and \
                getattr(leaf, 'ndim', 0) >= 2:
            leaf = mean + std * jax.random.normal(k, leaf.shape, leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


#
# Architectures (quality/memory claims from the HiFi-GAN paper — see
# reference `hifi_gan.py:150-208`): v1 ~14M params / MOS 4.3; v2 ~0.9M params
# ("3.6MB, super fast"); v3 uses ResBlock2 at 256 upsampling.
#
@register_model_architecture('hifi_gan', 'hifi_gan_v1')
def hifi_gan_v1():
    return {
        'resblock': '1',
        'upsample_rates': (8, 8, 2, 2),
        'upsample_kernel_sizes': (16, 16, 4, 4),
        'upsample_initial_channel': 512,
        'resblock_kernel_sizes': (3, 7, 11),
        'resblock_dilation_sizes': ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        'use_weight_norm': True,
        'data_format': 'NCT',
    }


@register_model_architecture('hifi_gan', 'hifi_gan_v2')
def hifi_gan_v2():
    return {
        'resblock': '1',
        'upsample_rates': (8, 8, 2, 2),
        'upsample_kernel_sizes': (16, 16, 4, 4),
        'upsample_initial_channel': 128,
        'resblock_kernel_sizes': (3, 7, 11),
        'resblock_dilation_sizes': ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        'use_weight_norm': True,
        'data_format': 'NCT',
    }


@register_model_architecture('hifi_gan', 'hifi_gan_v3')
def hifi_gan_v3():
    return {
        'resblock': '2',
        'upsample_rates': (8, 8, 4),
        'upsample_kernel_sizes': (16, 16, 8),
        'upsample_initial_channel': 256,
        'resblock_kernel_sizes': (3, 5, 7),
        'resblock_dilation_sizes': ((1, 2), (2, 6), (3, 12)),
        'use_weight_norm': True,
        'data_format': 'NCT',
    }
