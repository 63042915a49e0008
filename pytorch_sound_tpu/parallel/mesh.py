"""Mesh construction and sharding helpers."""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ('data',),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a device mesh.

    Default: all local devices on one 'data' axis. Pass ``shape`` (must multiply
    to the device count) and ``axis_names`` for dp x tp style meshes, e.g.
    ``make_mesh((2, 4), ('data', 'model'))`` on 8 chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    assert int(np.prod(shape)) == len(devices), \
        'mesh shape {} does not cover {} devices'.format(shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (parameters/optimizer state in pure DP)."""
    return NamedSharding(mesh, P())
