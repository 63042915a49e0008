"""Patch the GAN-ledger generator rows with all-XLA logical FLOPs.

The ledger times the NTC generator (its convs dispatch through the Pallas
grouped-conv custom calls, which cost_analysis() cannot see — the timed rows
reported ~1e8 'flops', i.e. only the XLA glue). This helper lowers the SAME
forward / forward+backward on the NCT (pure-XLA-conv) formulation, whose
cost_analysis() counts every conv, and prints the logical FLOPs to merge
into the ledger rows. Runs on the CPU backend — logical FLOPs are
backend-independent and this avoids burning tunnel compile time.

Reference anchor: /root/reference/pytorch_sound/models/vocoders/hifi_gan.py:96-147
"""
import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import sys
import json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401

B = int(os.environ.get('LEDGER_B', '16'))
T = int(os.environ.get('LEDGER_T', '8192'))
FRAMES = T // 256

gen = build_model('hifi_gan_v2')            # NCT: plain XLA convs
rng = np.random.default_rng(7)
mel = jnp.asarray(rng.standard_normal((B, 80, FRAMES)).astype(np.float32))
pg = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:1])


def flops_of(fn, *args):
    return float(jax.jit(fn).lower(*args).compile()
                 .cost_analysis().get('flops', 0.0))


fwd = flops_of(lambda m: jnp.sum(gen.apply(pg, m)), mel)
fwd_bwd = flops_of(
    lambda m: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(
        jax.grad(lambda p: jnp.sum(gen.apply(p, m)))(pg))), mel)
print(json.dumps({'gen_fwd_b16_flops_xla': fwd,
                  'gen_fwd_bwd_b16_flops_xla': fwd_bwd}))
