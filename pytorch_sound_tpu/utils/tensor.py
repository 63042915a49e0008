"""Array/device helpers — the JAX counterpart of the reference's CUDA tensor utils.

Parity target: `/root/reference/pytorch_sound/utils/tensor.py` (`to_device` =
async H2D copy; `to_numpy`; `concat_complex`).
"""

from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def to_device(tup: Any, device: Optional[jax.Device] = None,
              sharding: Optional[jax.sharding.Sharding] = None) -> Iterable[jnp.ndarray]:
    """Asynchronously transfer a tensor (or tuple/list of tensors) to device HBM.

    ``jax.device_put`` is asynchronous, mirroring the reference's
    ``.cuda(non_blocking=True)``. Pass ``sharding`` to place batches directly in
    their pjit layout (e.g. batch-sharded over the 'data' mesh axis).
    """
    if not isinstance(tup, (tuple, list)):
        tup = (tup,)
    target = sharding if sharding is not None else device
    return tuple(jax.device_put(x, target) for x in tup)


def to_numpy(device_array: jnp.ndarray) -> np.ndarray:
    """Copy a device array back to host numpy (blocks until ready)."""
    return np.asarray(jax.device_get(device_array))


def concat_complex(a: jnp.ndarray, b: jnp.ndarray, dim: int = 1) -> jnp.ndarray:
    """Concatenate two channel-packed (real||imag) tensors keeping the packing:
    result = [a_real, b_real, a_imag, b_imag] along ``dim``."""
    a_real, a_imag = jnp.split(a, 2, axis=dim)
    b_real, b_imag = jnp.split(b, 2, axis=dim)
    return jnp.concatenate([a_real, b_real, a_imag, b_imag], axis=dim)
