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


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding: Optional[jax.sharding.Sharding] = None) -> Iterator:
    """Yield device-resident batches, keeping ``size`` transfers in flight.

    Each batch may be an array or tuple/list of arrays; with ``sharding``
    given, arrays land directly in that layout (e.g. batch-sharded over a mesh).
    """
    queue = collections.deque()

    def put(batch):
        if isinstance(batch, (tuple, list)):
            return type(batch)(jax.device_put(x, sharding) for x in batch)
        return jax.device_put(batch, sharding)

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
