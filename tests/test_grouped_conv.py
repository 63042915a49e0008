"""Pallas grouped/strided conv1d kernel vs XLA conv — fwd + full VJP.

Runs in Pallas interpret mode on CPU; the same code path compiles on TPU
(dispatch in ``grouped_conv1d_ntc``). Covers every geometry class the MSD
discriminator uses (`models/vocoders/discriminators.py:ScaleDiscriminator`):
grouped strided k=41 at strides 1/2/4, the dense k=5 top layer, and odd
shapes (non-divisible T, stride-3, narrow channels) plus the XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sound_tpu.ops.pallas.grouped_conv import (eligible,
                                                       grouped_conv1d_ntc)

SLOPE = 0.1


def _xla_ref(x, w, b, s, p, g, slope=SLOPE):
    out = jax.lax.conv_general_dilated(
        x, w.transpose(2, 1, 0), window_strides=(s,), padding=[(p, p)],
        dimension_numbers=('NHC', 'HIO', 'NHC'), feature_group_count=g,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    out = out + b[None, None, :]
    if slope is None:
        return out
    return jnp.where(out > 0, out, slope * out)


def _make(ci, co, k, g, t, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, t, ci), dtype=np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((co, ci // g, k),
                                        dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((co,), dtype=np.float32) * 0.1)
    return x, w, b


CASES = [
    # (cin, cout, K, stride, groups, T) — MSD geometries at small T
    (128, 128, 41, 2, 4, 512),
    (128, 256, 41, 2, 8, 256),
    (256, 512, 41, 4, 8, 256),
    (512, 1024, 41, 4, 8, 128),
    (1024, 1024, 41, 1, 8, 64),
    (1024, 1024, 5, 1, 1, 64),
    (64, 64, 15, 1, 1, 96),
    (96, 48, 7, 3, 4, 99),
]


@pytest.mark.parametrize('ci,co,k,s,g,t', CASES)
def test_grouped_conv_fwd_parity(ci, co, k, s, g, t):
    pad = 20 if k == 41 else (k - 1) // 2
    x, w, b = _make(ci, co, k, g, t)
    assert eligible(ci, co, k, s, g, t, pad)
    out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                             slope=SLOPE, precision='highest', interpret=True)
    ref = _xla_ref(x, w, b, s, pad, g)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize('ci,co,k,s,g,t', [
    (128, 128, 41, 2, 4, 512),    # dx reduction lanes 64 -> lane-padded
    (256, 512, 41, 4, 8, 256),
    (1024, 1024, 41, 1, 8, 64),
    (1024, 1024, 5, 1, 1, 64),
    (64, 64, 15, 1, 1, 96),       # dense lx=64 -> lane-padded
    (96, 48, 7, 3, 4, 99),        # no legal dx fold -> XLA dx fallback
])
def test_grouped_conv_vjp_parity(ci, co, k, s, g, t):
    pad = 20 if k == 41 else (k - 1) // 2
    x, w, b = _make(ci, co, k, g, t, seed=1)

    def loss_p(x, w, b):
        out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                                 slope=SLOPE, precision='highest',
                                 interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_r(x, w, b):
        return jnp.sum(jnp.sin(_xla_ref(x, w, b, s, pad, g)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(('dx', 'dw', 'db'), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4,
                                   err_msg=name)


def test_grouped_conv_no_bias_no_slope():
    x, w, _ = _make(128, 128, 41, 4, 256)
    out = grouped_conv1d_ntc(x, w, None, stride=2, padding=20, groups=4,
                             precision='highest', interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, w.transpose(2, 1, 0), window_strides=(2,), padding=[(20, 20)],
        dimension_numbers=('NHC', 'HIO', 'NHC'), feature_group_count=4,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ineligible_falls_back_to_xla():
    # cin/groups < 8 -> XLA fallback, still correct
    x, w, b = _make(8, 16, 5, 4, 64)
    assert not eligible(8, 16, 5, 1, 4, 64, 2)
    out = grouped_conv1d_ntc(x, w, b, stride=1, padding=2, groups=4,
                             slope=SLOPE, precision='highest', interpret=True)
    ref = _xla_ref(x, w, b, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_weight_norm_grads_flow_through_kernel():
    """Weight-normed parameterization (g * v / ||v||) must receive grads via
    the custom VJP — the integration mode used by ScaleDiscriminator."""
    x, w, b = _make(128, 128, 41, 4, 256, seed=3)
    v = w
    gsc = jnp.linalg.norm(v.reshape(128, -1), axis=1).reshape(128, 1, 1)

    def loss(v, gsc):
        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True) + 1e-12)
        weight = gsc * v / norm
        out = grouped_conv1d_ntc(x, weight, b, stride=2, padding=20, groups=4,
                                 slope=SLOPE, precision='highest',
                                 interpret=True)
        return jnp.mean(out * out)

    gv, gg = jax.grad(loss, argnums=(0, 1))(v, gsc)
    assert np.isfinite(np.asarray(gv)).all() and float(jnp.abs(gv).max()) > 0
    assert np.isfinite(np.asarray(gg)).all() and float(jnp.abs(gg).max()) > 0


# ---------------------------------------------------------------------------
# dilation, dense output folding, strided dense dx, transposed conv
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('ci,co,k,s,g,d,t', [
    (64, 64, 3, 1, 1, 3, 256),     # generator resblock geometry
    (32, 32, 7, 1, 1, 5, 300),
    (16, 16, 11, 1, 1, 3, 256),
    (128, 256, 41, 2, 8, 2, 256),  # grouped + dilated
])
def test_dilated_conv_parity(ci, co, k, s, g, d, t):
    pad = d * (k - 1) // 2
    x, w, b = _make(ci, co, k, g, t, seed=5)

    def ref(x, w, b):
        out = jax.lax.conv_general_dilated(
            x, w.transpose(2, 1, 0), window_strides=(s,), padding=[(pad, pad)],
            rhs_dilation=(d,), dimension_numbers=('NHC', 'HIO', 'NHC'),
            feature_group_count=g, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        out = out + b[None, None, :]
        return jnp.where(out > 0, out, SLOPE * out)

    out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                             dilation=d, slope=SLOPE, precision='highest',
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, w, b)),
                               atol=2e-5)

    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(grouped_conv1d_ntc(
        *a, stride=s, padding=pad, groups=g, dilation=d, slope=SLOPE,
        precision='highest', interpret=True))), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(('dx', 'dw', 'db'), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4,
                                   err_msg=name)


@pytest.mark.parametrize('ci,co,k,s,t', [
    (64, 128, 16, 8, 256),   # classic dense dx at stride>1 (o_dx>1 lanes)
    (128, 128, 5, 2, 128),
    (80, 128, 7, 1, 96),     # dense output folding (s_out=4, lo=512)
])
def test_dense_folded_vjp(ci, co, k, s, t):
    pad = (k - 1) // 2
    x, w, b = _make(ci, co, k, 1, t, seed=6)
    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(grouped_conv1d_ntc(
        *a, stride=s, padding=pad, slope=SLOPE, precision='highest',
        interpret=True))), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(_xla_ref(*a, s, pad, 1))),
                  argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(('dx', 'dw', 'db'), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4,
                                   err_msg=name)


@pytest.mark.parametrize('ci,co,k,s,p,t', [
    (128, 64, 16, 8, 4, 32),   # HiFi-GAN upsampler geometries
    (64, 32, 16, 8, 4, 64),
    (32, 16, 4, 2, 1, 128),
])
def test_conv_transpose_parity(ci, co, k, s, p, t):
    import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
    from pytorch_sound_tpu.ops.pallas.grouped_conv import (
        conv_transpose1d_ntc, convt_eligible)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, t, ci), dtype=np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((ci, co, k), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((co,), dtype=np.float32) * 0.1)
    assert convt_eligible(ci, co, k, s, t, p)

    def pal(x, w, b):
        return conv_transpose1d_ntc(x, w, b, stride=s, padding=p, slope=SLOPE,
                                    precision='highest', interpret=True)

    def ref(x, w, b):
        ce = gc.convt_eligible
        gc.convt_eligible = lambda *a: False
        try:
            return conv_transpose1d_ntc(x, w, b, stride=s, padding=p,
                                        slope=SLOPE, precision='highest',
                                        interpret=False)
        finally:
            gc.convt_eligible = ce

    np.testing.assert_allclose(np.asarray(pal(x, w, b)),
                               np.asarray(ref(x, w, b)), atol=2e-5)
    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(pal(*a))), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(('dx', 'dw', 'db'), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4,
                                   err_msg=name)


def test_conv_transpose_golden_torch():
    """Bit-level golden vs torch ConvTranspose1d on the v2 upsampler."""
    torch = pytest.importorskip('torch')
    ci, co, k, s, p, t = 128, 64, 16, 8, 4, 32
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, t, ci)).astype(np.float32) * 0.5
    w = rng.standard_normal((ci, co, k)).astype(np.float32) * 0.1
    b = rng.standard_normal((co,)).astype(np.float32)
    tm = torch.nn.ConvTranspose1d(ci, co, k, stride=s, padding=p)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(w))
        tm.bias.copy_(torch.from_numpy(b))
    ref = tm(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    from pytorch_sound_tpu.ops.pallas.grouped_conv import conv_transpose1d_ntc
    out = conv_transpose1d_ntc(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               stride=s, padding=p, precision='highest',
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-5)


@pytest.mark.parametrize('tap_mode,x_wire', [
    ('rot8', 'f32'), ('slice', 'bf16'), ('rot8', 'bf16')])
@pytest.mark.parametrize('ci,co,k,s,g,t', [
    (128, 128, 41, 2, 4, 512),     # folded, j_taps 7
    (1024, 1024, 41, 1, 8, 64),    # unfolded, j_taps 41 (multi-q rot8)
    (64, 64, 15, 1, 1, 96),        # dense fold
])
def test_executor_knob_parity(tap_mode, x_wire, ci, co, k, s, g, t,
                              monkeypatch):
    """The PSTPU_GC_TAP_MODE / PSTPU_GC_XWIRE executor knobs preserve
    numerics: 'rot8' is exact vs 'slice' (same matmuls, aligned reads);
    'bf16' x-wire only moves the bf16 rounding before the DMA."""
    import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
    pad = 20 if k == 41 else (k - 1) // 2
    x, w, b = _make(ci, co, k, g, t)
    base = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                              slope=SLOPE, precision='default',
                              interpret=True)
    monkeypatch.setattr(gc, 'TAP_MODE', tap_mode)
    monkeypatch.setattr(gc, 'X_WIRE', x_wire)
    out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                             slope=SLOPE, precision='default',
                             interpret=True)
    assert out.shape == base.shape
    if x_wire == 'f32':
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-6)   # bit-identical matmuls
    else:
        # bf16 rounding of x before (vs after) the DMA: same precision class
        ref = _xla_ref(x, w, b, s, pad, g)
        rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / \
            max(1e-6, np.abs(np.asarray(ref)).max())
        assert rel < 2e-2, rel
    # 'highest' must ignore the bf16 x-wire (parity contract)
    hi = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                            slope=SLOPE, precision='highest',
                            interpret=True)
    ref = _xla_ref(x, w, b, s, pad, g)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize('ci,co,k,s,g,t', [
    (128, 128, 41, 2, 4, 512),
    (1024, 1024, 41, 1, 8, 64),    # j_taps 41: multi-rotation dw/dx
])
def test_executor_knob_vjp_parity(ci, co, k, s, g, t, monkeypatch):
    """rot8 + bf16-wire knobs preserve the custom VJP (dx, dw, db)."""
    import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
    monkeypatch.setattr(gc, 'TAP_MODE', 'rot8')
    monkeypatch.setattr(gc, 'X_WIRE', 'bf16')
    pad = 20
    x, w, b = _make(ci, co, k, g, t, seed=2)

    def loss_p(x, w, b):
        out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                                 slope=SLOPE, precision='highest',
                                 interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_r(x, w, b):
        return jnp.sum(jnp.sin(_xla_ref(x, w, b, s, pad, g)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(('dx', 'dw', 'db'), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4,
                                   err_msg=name)


@pytest.mark.parametrize('cost,fold', [
    ('macs', 'never'),             # round-2 planner + per-item grid
    ('macs', 'always'),            # fold under the old plans
    ('rate', 'never'),             # lane-rate plans without fold
    ('pipe', 'auto'),              # double-buffered executor, rate plans
])
@pytest.mark.parametrize('ci,co,k,s,g,t', [
    (128, 128, 41, 2, 4, 512),     # L1 geometry: rate model widens lo
    (1024, 1024, 41, 1, 8, 64),    # L5 geometry: rate flips s_out 1 -> 4
    (256, 512, 41, 4, 8, 256),     # strided grouped
    (64, 64, 15, 1, 1, 96),        # dense
])
def test_planner_knob_parity(cost, fold, ci, co, k, s, g, t, monkeypatch):
    """PSTPU_GC_COST / PSTPU_GC_BATCH_FOLD only repartition the same math:
    every (cost model, batch fold) combo must match the default-knob output
    in 'highest' precision, fwd and full VJP. Compared with slope=None: a
    leaky-ReLU mask element sitting at +-1e-6 of zero can flip between two
    exact-but-differently-ordered f32 summations and swamp the comparison."""
    import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
    pad = 20 if k == 41 else (k - 1) // 2
    x, w, b = _make(ci, co, k, g, t, seed=4)

    def run_grads():
        def loss(x, w, b):
            out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad,
                                     groups=g, slope=None,
                                     precision='highest', interpret=True)
            return jnp.sum(jnp.sin(out)), out
        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(x, w, b)
        return out, grads

    base_out, base_grads = run_grads()
    ref = _xla_ref(x, w, b, s, pad, g, slope=None)
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(ref),
                               atol=2e-5)
    if cost == 'pipe':
        monkeypatch.setattr(gc, 'EXEC_MODE', 'pipe')
    else:
        monkeypatch.setattr(gc, 'COST_MODE', cost)
    monkeypatch.setattr(gc, 'BATCH_FOLD', fold)
    out, grads = run_grads()
    np.testing.assert_allclose(np.asarray(out), np.asarray(base_out),
                               atol=3e-5)
    for name, a, r in zip(('dx', 'dw', 'db'), grads, base_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-4,
                                   err_msg=name)


def test_batch_fold_single_item_and_large_batch():
    """Fold is a no-op at n=1 and exact at n=8 (guard rows isolate items)."""
    ci, co, k, s, g = 128, 256, 41, 2, 8
    pad = 20
    for n, t in ((1, 256), (8, 192)):
        rng = np.random.default_rng(5 + n)
        x = jnp.asarray(rng.standard_normal((n, t, ci), dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((co, ci // g, k),
                                            dtype=np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal((co,), dtype=np.float32))
        out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                                 slope=SLOPE, precision='highest',
                                 interpret=True)
        ref = _xla_ref(x, w, b, s, pad, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


@pytest.mark.parametrize('ci,co,s,t', [
    (32, 128, 3, 683),      # MPD body layers: dense k5 NTC convs on
    (128, 512, 3, 228),     # period-folded rows (B*P items, T/period rows)
    (512, 1024, 3, 76),
    (1024, 1024, 1, 26),
])
def test_mpd_geometry_kernel_parity(ci, co, s, t):
    """The MPD's period-folded dense conv1d geometries are all kernel-
    eligible and exact (`models/vocoders/discriminators.py:PeriodDiscriminator`
    with backends='auto'; reference 2D stack:
    /root/reference/pytorch_sound/models/vocoders/hifi_gan.py:96-121)."""
    k, pad, n = 5, 2, 10
    assert eligible(ci, co, k, s, 1, t, pad)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, t, ci)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.standard_normal((co, ci, k)).astype(np.float32) * .05)
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32) * 0.1)
    out = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=1,
                             slope=SLOPE, precision='highest', interpret=True)
    ref = _xla_ref(x, w, b, s, pad, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_pipe_executor_bf16_wire(monkeypatch):
    """PSTPU_GC_EXEC=pipe composed with the bf16 x-wire keeps the precision
    contract: 'highest' ignores the wire (exact), 'default' stays in the
    bf16 accuracy envelope."""
    import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
    monkeypatch.setattr(gc, 'EXEC_MODE', 'pipe')
    monkeypatch.setattr(gc, 'X_WIRE', 'bf16')
    ci, co, k, s, g, t = 256, 512, 41, 4, 8, 256
    pad = 20
    x, w, b = _make(ci, co, k, g, t, seed=8)
    ref = _xla_ref(x, w, b, s, pad, g)
    hi = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                            slope=SLOPE, precision='highest', interpret=True)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ref), atol=2e-5)
    lo = grouped_conv1d_ntc(x, w, b, stride=s, padding=pad, groups=g,
                            slope=SLOPE, precision='default', interpret=True)
    rel = np.abs(np.asarray(lo) - np.asarray(ref)).max() / \
        max(1e-6, np.abs(np.asarray(ref)).max())
    assert rel < 2e-2, rel


@pytest.mark.parametrize('ci,co,k,s,g,t', CASES)
def test_xla_dense_backend_parity(ci, co, k, s, g, t):
    """The zero-expanded dense formulation (backend='xla_dense') is exact vs
    XLA's grouped lowering — fwd AND grads (dw must land only on the true
    block-diagonal weights; the zero blocks contribute nothing)."""
    pad = 20 if k == 41 else (k - 1) // 2
    x, w, b = _make(ci, co, k, g, t)

    def f(backend):
        def loss(xx, ww, bb):
            out = grouped_conv1d_ntc(xx, ww, bb, stride=s, padding=pad,
                                     groups=g, slope=SLOPE, backend=backend,
                                     precision='highest')
            return (out * jnp.cos(out)).sum()
        return loss

    ref = f('xla')(x, w, b)
    got = f('xla_dense')(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(f('xla'), argnums=(0, 1, 2))(x, w, b)
    g_got = jax.grad(f('xla_dense'), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_auto_backend_grouped_routes_off_kernel_on_cpu():
    """'auto' + groups>1 must not crash off-TPU and must match XLA exactly.

    Covers both arms of the measured decision table: narrow per-group
    reductions (cin/groups <= 32, incl. the cg==32 boundary — the full
    training step measured dense 13.83 vs native 9.99 steps/s there,
    gan_r5.log) lower to xla_dense, wide ones (cin/groups > 32) to XLA's
    native grouped conv."""
    for ci, g in ((64, 4), (64, 8),    # cg = 16, 8  -> dense expansion
                  (256, 8),             # cg = 32     -> dense expansion
                  (512, 8)):            # cg = 64     -> native grouped
        x, w, b = _make(ci, 64, 9, g, 128)
        got = grouped_conv1d_ntc(x, w, b, stride=1, padding=4, groups=g,
                                 slope=SLOPE, backend='auto',
                                 precision='highest')
        ref = _xla_ref(x, w, b, 1, 4, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
