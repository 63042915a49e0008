"""Multi-host (multi-process) data feeding helpers.

In a JAX multi-host job every process sees only its local devices; each host
loads a distinct shard of the data and the global batch is assembled from
per-host local arrays (`jax.make_array_from_process_local_data`). These
helpers wrap that recipe for the SpeechDataLoader pipeline — the TPU
replacement for the reference's single-process DataLoader workers
(SURVEY.md §2.2 communication-backend row).
"""

from typing import Iterable, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_shard_indices(n_items: int, process_index: Optional[int] = None,
                          process_count: Optional[int] = None) -> np.ndarray:
    """Indices of the meta rows this host is responsible for (strided split,
    which keeps duration-sorted buckets balanced across hosts)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, n_items, pc)


def shard_meta_frame(meta_frame, process_index: Optional[int] = None,
                     process_count: Optional[int] = None):
    """Restrict a MetaFrame's rows to this host's shard (in place)."""
    idx = process_shard_indices(len(meta_frame), process_index, process_count)
    meta_frame._meta = meta_frame.meta.iloc[idx]
    return meta_frame


def global_batches(local_iter: Iterable, mesh: Mesh,
                   axis: str = 'data') -> Iterator:
    """Assemble per-host local batches into globally-sharded jax.Arrays.

    Each host's loader yields its *local* slice of the global batch (local
    batch size = global / process_count); the result is a list of jax.Arrays
    sharded over ``axis`` across all hosts' devices.
    """
    sharding = NamedSharding(mesh, P(axis))

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    for batch in local_iter:
        if isinstance(batch, (tuple, list)):
            yield type(batch)(to_global(x) for x in batch)
        else:
            yield to_global(batch)
