"""Device-mesh parallelism utilities (data-parallel training over ICI).

The reference had no distributed training (SURVEY.md §2.2); this package is the
TPU-native replacement: a `jax.sharding.Mesh` + NamedSharding annotations let
GSPMD insert psum/all-gather collectives over ICI, with per-host data feeding.
"""

from pytorch_sound_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             replicated_sharding)
from pytorch_sound_tpu.parallel.prefetch import prefetch_to_device

__all__ = ['make_mesh', 'batch_sharding', 'replicated_sharding',
           'prefetch_to_device', 'data']
