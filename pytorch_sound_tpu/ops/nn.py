"""1-d convolution primitives with torch-compatible semantics on NCL layout.

These wrap ``lax.conv_general_dilated`` / ``lax.conv_transpose`` so DSP modules
and models can be specified against the reference's conv shapes
(weight (C_out, C_in/groups, K), input (N, C, L)) while XLA picks TPU-optimal
layouts internally.
"""

from typing import Union

import jax
import jax.numpy as jnp

_DN = ('NCH', 'OIH', 'NCH')   # torch-style layouts for lax conv dimension_numbers


def _auto_precision(x: jnp.ndarray):
    """HIGHEST for f32 inputs (torch-parity numerics); DEFAULT for bf16.

    Measured on the v5e/axon XLA build: f32+HIGHEST is the FAST path for
    these 1-d convs (4.4ms per batch-32 HiFi-GAN decode); both f32+DEFAULT
    (184ms) and bf16 (28ms) fall off the optimized conv lowering. Don't
    "optimize" this to lower precision without re-measuring.
    """
    if x.dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _resolve_precision(x: jnp.ndarray, precision: str):
    """'auto' = the measured fast/parity path per dtype (see _auto_precision);
    'highest'/'default' force it. Measured on this build the preference is
    SHAPE-dependent: dense 1-d convs (the generator) are ~40x faster at
    HIGHEST, while the discriminators' grouped k=41 convs are ~3.4x faster at
    DEFAULT — hence a per-call knob instead of one global rule."""
    if precision == 'auto':
        return _auto_precision(x)
    return {'highest': jax.lax.Precision.HIGHEST,
            'default': jax.lax.Precision.DEFAULT}[precision]


def conv1d(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray = None,
           stride: int = 1, padding: Union[int, str] = 0, dilation: int = 1,
           groups: int = 1, precision: str = 'auto') -> jnp.ndarray:
    """torch.nn.functional.conv1d equivalent (cross-correlation)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        feature_group_count=groups,
        precision=_resolve_precision(x, precision),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias[None, :, None]
    return out.astype(x.dtype)


def conv_transpose1d(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray = None,
                     stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose1d equivalent.

    ``weight`` is (C_in, C_out, K) as in torch. Implemented as input dilation +
    correlation with the flipped kernel; output length = (L-1)*stride + K - 2*padding.
    """
    c_in, c_out, k = weight.shape
    # flip kernel and swap in/out channels -> correlation weight (C_out, C_in, K)
    w = jnp.flip(weight, axis=-1).swapaxes(0, 1)
    pad = (k - 1 - padding, k - 1 - padding)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[pad],
        lhs_dilation=(stride,), dimension_numbers=_DN,
        precision=_auto_precision(x),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias[None, :, None]
    return out.astype(x.dtype)


def reflect_pad1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the trailing axis by ``pad`` on both sides."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode='reflect')
