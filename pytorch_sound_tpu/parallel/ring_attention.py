"""Ring attention: exact softmax attention over a sequence-sharded mesh.

Sequence/context parallelism for long audio (SURVEY.md §2.2 SP/CP row — new
capability; the reference controlled length purely data-side). Q, K, V are
sharded along the sequence axis across a mesh axis; each device computes
attention partials against its local K/V shard, then K/V shards rotate around
the ring with ``lax.ppermute`` (ICI neighbor exchange) while partials merge
with the associative online-softmax combine. Communication overlaps the next
partial's compute under XLA's scheduler; local partials go blockwise for
long shards (peak memory O(T_local x block) instead of O(T_local^2)), and
the result is exact (verified against dense attention on an 8-device
virtual mesh).
"""

from functools import partial as _partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_sound_tpu.ops.attention import combine_attention_partials

try:   # jax >= 0.6 canonical location (kwarg renamed check_rep -> check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw['check_vma'] = kw.pop('check_rep', kw.pop('check_vma', True))
        return _shard_map(f, **kw)
except ImportError:   # older jax
    from jax.experimental.shard_map import shard_map


def _local_partials(q, k, v, scale):
    """(acc, running_max, denom) of q against one K/V shard (dense scores)."""
    s = jnp.einsum('nhqd,nhkd->nhqk', q, k) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    acc = jnp.einsum('nhqk,nhkd->nhqd', p, v)
    return acc, m, jnp.sum(p, axis=-1, keepdims=True)


# per-device shards at or above this length compute their local partials
# blockwise (O(T_local x block) memory) instead of materializing the
# (T_local, T_local) score tile
_BLOCKWISE_LOCAL_MIN_T = 2048


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = 'seq',
                   local: str = 'auto') -> jnp.ndarray:
    """Exact attention with Q/K/V sequence-sharded over ``axis`` of ``mesh``.

    :param q, k, v: (N, H, T, D); T must divide by the axis size
    :param local: per-shard partials strategy — 'dense' materializes the
        (T_local, T_local) score tile, 'blockwise' runs the O(T_local x
        block) online-softmax scan (`ops.attention.blockwise_attention_partials`),
        'auto' picks blockwise once shards reach 2048 rows. All produce the
        same partials contract, so the ring combine is unchanged.
    :return: (N, H, T, D), sharded like q
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    axis_size = mesh.shape[axis]
    assert q.shape[2] % axis_size == 0, 'sequence must divide the mesh axis'

    t_local = q.shape[2] // axis_size
    use_blockwise = (local == 'blockwise' or
                     (local == 'auto' and t_local >= _BLOCKWISE_LOCAL_MIN_T))
    if use_blockwise:
        from pytorch_sound_tpu.ops.attention import (
            blockwise_attention_partials)

        def partials(q_loc, k_loc, v_loc):
            return blockwise_attention_partials(q_loc, k_loc, v_loc,
                                                scale=scale)
    else:
        partials = _partial(_local_partials, scale=scale)

    spec = P(None, None, axis, None)

    @_partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
              out_specs=spec, check_rep=False)
    def _ring(q_loc, k_loc, v_loc):
        state = partials(q_loc, k_loc, v_loc)

        perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

        def body(_, carry):
            state, ks, vs = carry
            ks = lax.ppermute(ks, axis, perm)
            vs = lax.ppermute(vs, axis, perm)
            state = combine_attention_partials(state,
                                               partials(q_loc, ks, vs))
            return state, ks, vs

        (acc, _, denom), _, _ = lax.fori_loop(
            1, axis_size, body, (state, k_loc, v_loc))
        return acc / jnp.maximum(denom, 1e-30)

    sharding = NamedSharding(mesh, spec)
    return _ring(jax.device_put(q, sharding), jax.device_put(k, sharding),
                 jax.device_put(v, sharding))
