"""Time-folded conv parity: fold_conv1d_ntc vs the plain XLA conv.

The folded formulation (ops/fold_conv.py) must be numerically equivalent
(mod float summation order) to the dense stride-1 dilated conv it replaces
in the HiFi-GAN generator's ResBlock stacks (reference
/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:32-93) — forward,
input-gradient, and weight-gradient.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pytorch_sound_tpu.ops.fold_conv import (fold_conv1d_ntc, fold_eligible,
                                             fold_weight)
from pytorch_sound_tpu.ops.pallas.grouped_conv import grouped_conv1d_ntc


def _ref(x, w, b, padding, dilation, slope=None):
    return grouped_conv1d_ntc(x, w, b, stride=1, padding=padding,
                              dilation=dilation, slope=slope, backend='xla')


# the v2/v1 generators' narrow-stage geometries: (C, k, d)
GEOMS = [(8, 3, 1), (8, 11, 5), (16, 7, 3), (32, 11, 5), (32, 3, 1),
         (16, 11, 1)]


@pytest.mark.parametrize('c,k,d', GEOMS)
def test_fold_conv_forward_matches_xla(c, k, d):
    rng = np.random.default_rng(42)
    pad = (k - 1) * d // 2
    fold = fold_eligible(c, c, 1, 1, 256, k, d, pad)
    assert fold == 128 // max(c, 8)
    x = jnp.asarray(rng.standard_normal((2, 256, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((c, c, k)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    ref = _ref(x, w, b, pad, d)
    got = fold_conv1d_ntc(x, w, b, dilation=d, padding=pad, fold=fold)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_conv_fused_slope():
    rng = np.random.default_rng(0)
    c, k, d = 8, 11, 5
    pad = (k - 1) * d // 2
    x = jnp.asarray(rng.standard_normal((1, 128, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((c, c, k)).astype(np.float32) * 0.2)
    ref = _ref(x, w, None, pad, d, slope=0.1)
    got = fold_conv1d_ntc(x, w, None, dilation=d, padding=pad, fold=16,
                          slope=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('c,k,d', [(8, 11, 5), (16, 7, 3), (32, 3, 1)])
def test_fold_conv_grads_match_xla(c, k, d):
    rng = np.random.default_rng(7)
    pad = (k - 1) * d // 2
    fold = 128 // max(c, 8)
    x = jnp.asarray(rng.standard_normal((2, 128, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((c, c, k)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    probe = jnp.asarray(rng.standard_normal((2, 128, c)).astype(np.float32))

    def loss_ref(x, w, b):
        return jnp.sum(_ref(x, w, b, pad, d) * probe)

    def loss_fold(x, w, b):
        return jnp.sum(fold_conv1d_ntc(x, w, b, dilation=d, padding=pad,
                                       fold=fold) * probe)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_fold, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


def test_fold_weight_mac_accounting():
    # executed-MAC growth is f*k'/k; the plan must produce the documented
    # tap count k' = (f-1 + (k-1)*d)//f + 1
    w = jnp.ones((8, 8, 11), jnp.float32)
    wf = fold_weight(w, 5, 16)
    assert wf.shape == ((16 - 1 + 10 * 5) // 16 + 1, 128, 128)
    # every original weight entry lands exactly once per phase r
    assert float(jnp.sum(wf)) == pytest.approx(16 * 8 * 8 * 11)


def test_fold_eligible_gates():
    # stride, groups, channel mismatch, wide channels, ragged T all refuse
    assert fold_eligible(8, 8, 2, 1, 256, 3, 1, 1) == 0
    assert fold_eligible(8, 8, 1, 2, 256, 3, 1, 1) == 0
    assert fold_eligible(8, 16, 1, 1, 256, 3, 1, 1) == 0
    assert fold_eligible(64, 64, 1, 1, 256, 3, 1, 1) == 0
    assert fold_eligible(8, 8, 1, 1, 250, 3, 1, 1) == 0   # T % 16 != 0
    assert fold_eligible(8, 8, 1, 1, 256, 3, 1, 0) == 0   # not same-length
    assert fold_eligible(8, 8, 1, 1, 256, 11, 5, 25) == 16
    assert fold_eligible(32, 32, 1, 1, 256, 3, 1, 1) == 4
