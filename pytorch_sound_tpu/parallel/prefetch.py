"""Double-buffered host -> HBM batch prefetching.

The reference performed one synchronous H2D copy per step
(`/root/reference/pytorch_sound/trainer.py:202`); on TPU that stalls the device
between steps. ``prefetch_to_device`` keeps ``size`` batches in flight:
``jax.device_put`` is asynchronous, so the transfer of batch N+1 overlaps the
computation of batch N — the main steps/sec lever called out in SURVEY.md §7.
"""

import collections
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


def _compatible_sharding(x, sharding):
    """Replicate (instead of batch-shard) arrays whose leading dim doesn't
    divide the mesh — e.g. a short final validation batch. Exact semantics
    under GSPMD (the program sees the same global array), just without the
    batch-axis parallelism for that straggler batch."""
    spec = getattr(sharding, 'spec', None)
    if not spec or not len(spec) or spec[0] is None:
        return sharding
    axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    n = int(np.prod([sharding.mesh.shape[a] for a in axes]))
    shape = getattr(x, 'shape', ())
    if not shape or shape[0] % n:
        from jax.sharding import NamedSharding, PartitionSpec
        return NamedSharding(sharding.mesh, PartitionSpec())
    return sharding


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding: Optional[jax.sharding.Sharding] = None) -> Iterator:
    """Yield device-resident batches, keeping ``size`` transfers in flight.

    Each batch may be an array or tuple/list of arrays; with ``sharding``
    given, arrays land directly in that layout (e.g. batch-sharded over a mesh).
    """
    queue = collections.deque()

    def put_one(x):
        return jax.device_put(x, _compatible_sharding(x, sharding))

    def put(batch):
        if isinstance(batch, (tuple, list)):
            return type(batch)(put_one(x) for x in batch)
        return put_one(batch)

    it = iter(iterator)
    if size <= 0:   # no lookahead: host draws happen exactly at consumption
        for batch in it:
            yield put(batch)
        return
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
