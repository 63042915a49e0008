"""Near-perfect-reconstruction pseudo-QMF analysis/synthesis.

Numerical parity target: `/root/reference/pytorch_sound/models/transforms.py:462-560`
(kan-bayashi PQMF formulation): Kaiser prototype, cosine-modulated banks,
taps//2 zero padding, stride-``subbands`` down/upsampling.
"""

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from pytorch_sound_tpu.ops import filters
from pytorch_sound_tpu.ops.nn import conv1d


@functools.lru_cache(maxsize=8)
def _cached_banks(subbands: int, taps: int, cutoff_ratio: float,
                  beta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h_a, h_s = filters.pqmf_banks(subbands, taps, cutoff_ratio, beta)
    analysis = np.asarray(h_a[:, None, :], dtype=np.float32)      # (S, 1, K)
    synthesis = np.asarray(h_s[None, :, :], dtype=np.float32)     # (1, S, K)
    return analysis, synthesis


def analysis(x: jnp.ndarray, subbands: int = 4, taps: int = 62,
             cutoff_ratio: float = 0.15, beta: float = 9.0) -> jnp.ndarray:
    """(B, 1, T) -> (B, subbands, T // subbands)."""
    analysis_filter, _ = _cached_banks(subbands, taps, cutoff_ratio, beta)
    x = jnp.pad(x, [(0, 0), (0, 0), (taps // 2, taps // 2)])
    bands = conv1d(x, analysis_filter)
    return bands[..., ::subbands]


def synthesis(x: jnp.ndarray, subbands: int = 4, taps: int = 62,
              cutoff_ratio: float = 0.15, beta: float = 9.0) -> jnp.ndarray:
    """(B, subbands, T // subbands) -> (B, 1, T)."""
    _, synthesis_filter = _cached_banks(subbands, taps, cutoff_ratio, beta)
    b, s, t = x.shape
    # zero-stuff upsample by `subbands`, scaled (conv_transpose w/ updown * subbands)
    up = jnp.zeros((b, s, t, subbands), dtype=x.dtype)
    up = up.at[..., 0].set(x * subbands).reshape(b, s, t * subbands)
    up = jnp.pad(up, [(0, 0), (0, 0), (taps // 2, taps // 2)])
    return conv1d(up, synthesis_filter)
