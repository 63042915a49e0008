"""Pallas grouped/strided conv1d (fwd + custom VJP) — the GAN-critic kernel.

Why: the HiFi-GAN multi-scale discriminator is a stack of grouped k=41 convs
(`models/vocoders/discriminators.py:ScaleDiscriminator`, the trainable critics
for the reference's bundled generator,
`/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:96-147`) and is
~88% of the adversarial VCTK step. XLA's grouped-conv lowering measures only
4-15 TFLOP/s on those shapes on v5e (all layouts/precisions) because each
group is a narrow (<=128-reduction) conv. This kernel reaches MXU-shaped
matmuls with three ideas:

1. **Phase folding**: a stride-``s`` conv is ``s`` polyphase stride-1 convs.
   The input is folded once at the XLA level into phase-major rows
   ``(T/s, s*C)`` (Mosaic cannot lower the sublane->lane merge for
   sub-128-lane slabs in-kernel), making every tap a *contiguous sublane
   slice* — the whole conv becomes J = ceil(K/s)+1 shifted matmuls
   ``out += xs[j : j+T] @ W_j`` with reduction ``s*C/G``.
2. **Group packing**: groups are packed ``gp`` at a time into block-diagonal
   taps so the matmul reduction/lane dims fill the 128-wide MXU; ``gp`` is
   chosen per layer by a cycle model (`_plan`).
3. **One generic executor** runs forward AND input-gradient: dx is the same
   shifted-matmul with taps transposed + tap order reversed, phases folded on
   the *output* side (`s_out`) instead of the input (`s_in`). A separate
   accumulation kernel produces the weight gradient with x tiles kept
   VMEM-resident across all taps.

Precision: 'default' = single-pass bf16 MXU with f32 accumulators (the
measured-fast critic mode, see discriminators.py docstring); 'highest' = f32
contractions (parity tests).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
MAX_TILE = 512          # out rows per program (M of the matmul)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _plan(cin: int, cout: int, k: int, stride: int, groups: int):
    """Choose the group-packing factor ``gp`` and tiling of the fwd matmul.

    Returns (gp, O, n_slabs, slab, lo) where per out-tile the matmul is
    (tile, s*slab) @ (s*slab, lo); O = number of out tiles, n_slabs = number
    of input channel slabs (== O for grouped, 1 for dense).
    """
    cg, cog = cin // groups, cout // groups
    if groups == 1:
        lo = cout if cout <= LANE else LANE
        return 1, _cdiv(cout, lo), 1, cin, lo
    best = None
    for gp in range(1, groups + 1):
        if groups % gp:
            continue
        lx, lo = gp * cg * stride, gp * cog
        # Mosaic constraint: the out lane-block must be a multiple of 128
        # lanes unless it covers the whole lane axis (single out tile)
        if gp != groups and lo % LANE:
            continue
        cost = (groups // gp) * _cdiv(lx, LANE) * _cdiv(lo, LANE)
        if best is None or cost < best[0]:
            best = (cost, gp)
    gp = best[1]
    return gp, groups // gp, groups // gp, gp * cg, gp * cog


def _plan_dx(cin: int, cout: int, k: int, stride: int, groups: int) -> int:
    """Group packing for the dx pass: its out lane-block is gp*cg lanes."""
    cg, cog = cin // groups, cout // groups
    best = None
    for gp in range(1, groups + 1):
        if groups % gp:
            continue
        if gp != groups and (gp * cg) % LANE:
            continue
        cost = (groups // gp) * _cdiv(gp * cog, LANE) * _cdiv(
            stride * gp * cg, LANE)
        if best is None or cost < best[0]:
            best = (cost, gp)
    return best[1]


def _geometry(k: int, stride: int, pad: int):
    """Phase-folded tap geometry: front raw pad P_f, tap offset d0, tap count J."""
    p_f = _round_up(pad, stride)
    d0 = p_f - pad
    j_taps = (k - 1 - pad + p_f) // stride + 1
    return p_f, d0, j_taps


def _pack_fwd_taps(w: jnp.ndarray, gp: int, O: int, s: int, j_taps: int,
                   d0: int, lo: int, groups: int) -> jnp.ndarray:
    """w (cout, cg, K) -> taps (O, J, s*slab, lo).

    Grouped (n_slabs == O): block-diagonal over the ``gp`` packed groups,
    row = p*slab + gi*cg + ci (phase-major), col = gi*cog + co.
    Dense (groups == 1): out-channel tiles of ``lo`` lanes, rows = p*cin + ci.
    """
    cout, cg, k = w.shape
    # w_ext[., ., m] = w[., ., m - d0], m = s*j + p in [0, s*J)
    w_ext = jnp.pad(w, [(0, 0), (0, 0), (d0, s * j_taps - k - d0)])
    if groups == 1:
        # dense: (cout, cin, J, s) -> (O, J, s, cin, lo)
        we = w_ext.reshape(O, lo, cg, j_taps, s)
        taps = we.transpose(0, 3, 4, 2, 1).reshape(O, j_taps, s * cg, lo)
        return taps
    cog = lo // gp
    # grouped block-diagonal
    we = w_ext.reshape(O, gp, cog, cg, j_taps, s)
    z = jnp.zeros((O, j_taps, s, gp, cg, gp, cog), w.dtype)
    ar = jnp.arange(gp)
    # advanced indexing with two index arrays -> diagonal; result dims move
    # the gp axis to the front: (gp, O, J, s, cg, cog)
    diag_src = we.transpose(1, 0, 4, 5, 3, 2)      # (gp, O, J, s, cg, cog)
    z = z.at[:, :, :, ar, :, ar, :].set(diag_src)
    slab = gp * cg
    return z.reshape(O, j_taps, s, slab, gp * cog).reshape(
        O, j_taps, s * slab, gp * cog)


def _kernel(x_ref, taps_ref, bias_ref, out_ref, scr, sem, *,
            tile: int, j_taps: int, n_slabs: int,
            n_out_tiles: int, lx: int, lo_mm: int, r_s: int,
            precision: str, slope: Optional[float], has_bias: bool):
    b = pl.program_id(0)
    o = pl.program_id(1)
    t = pl.program_id(2)
    if n_slabs == 1:
        slab_idx = 0
    else:
        slab_idx = o
    row0 = pl.multiple_of(t * tile, 8)
    dma = pltpu.make_async_copy(
        x_ref.at[b, slab_idx, pl.ds(row0, r_s), :], scr, sem)
    dma.start()
    dma.wait()
    xs = scr[...]
    if precision == 'default':
        xs = xs.astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32)
    else:
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    acc = jnp.zeros((tile, lo_mm), jnp.float32)
    for j in range(j_taps):
        acc = acc + jnp.dot(xs[j:j + tile], taps_ref[0, j], **kw)
    if has_bias:
        acc = acc + bias_ref[0, 0][None, :]
    if slope is not None:
        acc = jnp.where(acc > 0, acc, slope * acc)
    out_ref[0] = acc


def _phase_fold(x_pad: jnp.ndarray, s: int, n_slabs: int) -> jnp.ndarray:
    """(N, raw_rows, C) -> (N, n_slabs, raw_rows/s, s*slab), lanes p-major
    within each slab (p*slab + c) to match `_pack_fwd_taps` row order.

    The slab axis sits OUTSIDE the minor two dims so the kernel's DMA slices
    only untiled dims (Mosaic requires the (sublane, lane) dims of an HBM
    memref slice to stay tile-aligned)."""
    n, raw, c = x_pad.shape
    slab = c // n_slabs
    if s == 1 and n_slabs == 1:
        return x_pad.reshape(n, 1, raw, c)
    return x_pad.reshape(n, raw // s, s, n_slabs, slab) \
        .transpose(0, 3, 1, 2, 4).reshape(n, n_slabs, raw // s, s * slab)


def _phase_unfold(out: jnp.ndarray, s: int, n_out_tiles: int) -> jnp.ndarray:
    """(N, V, O*s*lo) phase-major kernel output -> (N, V*s, O*lo) raw rows."""
    n, v, w = out.shape
    if s == 1:
        return out
    lo = w // (n_out_tiles * s)
    return out.reshape(n, v, n_out_tiles, s, lo).transpose(0, 1, 3, 2, 4) \
        .reshape(n, v * s, n_out_tiles * lo)


def _shifted_matmul(x_ph: jnp.ndarray, taps: jnp.ndarray,
                    bias: Optional[jnp.ndarray], *, tile: int, out_rows: int,
                    precision: str, slope: Optional[float],
                    interpret: bool) -> jnp.ndarray:
    """Generic executor: x_ph (N, n_slabs, ph_rows, lx) phase-folded input,
    taps (O, J, lx, lo_mm) -> out (N, n_tiles*tile, O*lo_mm).
    """
    n, n_slabs, ph_rows, lx = x_ph.shape
    n_out_tiles, j_taps, lx_t, lo_mm = taps.shape
    assert lx_t == lx
    n_tiles = _cdiv(out_rows, tile)
    r_s = _round_up(tile + j_taps - 1, 8)
    assert ph_rows >= (n_tiles - 1) * tile + r_s, \
        'x_ph under-padded: %d < %d' % (ph_rows, (n_tiles - 1) * tile + r_s)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((n_out_tiles, 1, lo_mm), jnp.float32)
    if precision == 'default':
        taps = taps.astype(jnp.bfloat16)

    kernel = functools.partial(
        _kernel, tile=tile, j_taps=j_taps,
        n_slabs=n_slabs, n_out_tiles=n_out_tiles, lx=lx, lo_mm=lo_mm,
        r_s=r_s, precision=precision, slope=slope, has_bias=has_bias)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_out_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, j_taps, lx, lo_mm), lambda b, o, t: (o, 0, 0, 0)),
            pl.BlockSpec((1, 1, lo_mm), lambda b, o, t: (o, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, lo_mm),
                               lambda b, o, t: (b, t, o)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles * tile, n_out_tiles * lo_mm), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r_s, lx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x_ph, taps, bias)
    return out


def _pad_rows_for(t_rows_in: int, front: int, s_in: int, tile: int,
                  out_rows: int, j_taps: int) -> int:
    """Total raw rows after padding so every program's DMA span is in-bounds
    (a multiple of the phase-fold factor ``s_in``)."""
    n_tiles = _cdiv(out_rows, tile)
    r_s = _round_up(tile + j_taps - 1, 8)
    need_raw = ((n_tiles - 1) * tile + r_s) * s_in
    return max(need_raw, _round_up(front + t_rows_in, s_in))


def _pick_tile(out_rows: int) -> int:
    if out_rows >= MAX_TILE:
        return MAX_TILE
    return _round_up(out_rows, 8)


# -----------------------------------------------------------------------------
# forward / dx / dw wrappers
# -----------------------------------------------------------------------------

def _fwd_impl(x, w, b, stride, padding, groups, slope, precision, interpret):
    n, t_in, cin = x.shape
    cout, cg, k = w.shape
    t_out = (t_in + 2 * padding - k) // stride + 1
    gp, n_out, n_slabs, slab, lo = _plan(cin, cout, k, stride, groups)
    p_f, d0, j_taps = _geometry(k, stride, padding)
    tile = _pick_tile(t_out)
    total = _pad_rows_for(t_in, p_f, stride, tile, t_out, j_taps)
    x_pad = jnp.pad(x, [(0, 0), (p_f, total - p_f - t_in), (0, 0)])
    x_ph = _phase_fold(x_pad, stride, n_slabs)
    taps = _pack_fwd_taps(w, gp, n_out, stride, j_taps, d0, lo, groups)
    bias2 = None if b is None else b.reshape(n_out, 1, lo).astype(jnp.float32)
    out3 = _shifted_matmul(x_ph, taps, bias2, tile=tile, out_rows=t_out,
                           precision=precision, slope=slope,
                           interpret=interpret)
    return out3[:, :t_out, :cout]


def _dx_impl(gbar, w, stride, padding, groups, t_in, precision, interpret):
    """gbar (N, T_out, cout) -> dx (N, T_in, cin)."""
    n, t_out, cout = gbar.shape
    _, cg, k = w.shape
    cin = cg * groups
    p_f, d0, j_taps = _geometry(k, stride, padding)
    if groups == 1:
        gp, n_out = 1, 1 if cout <= LANE else cout // LANE
        lo = cout if cout <= LANE else LANE
    else:
        gp = _plan_dx(cin, cout, k, stride, groups)
        n_out = groups // gp
        lo = gp * (cout // groups)
    taps = _pack_fwd_taps(w, gp, n_out, stride, j_taps, d0, lo, groups)

    if groups == 1:
        # gather the full-cout reduction per dx out-tile of the s*cin lanes
        sin = taps.shape[2]                      # s * cin
        t_all = jnp.flip(taps, axis=1).transpose(1, 2, 0, 3) \
            .reshape(j_taps, sin, cout)
        o_dx = _cdiv(sin, LANE)
        lo_dx = sin // o_dx
        taps_dx = t_all.reshape(j_taps, o_dx, lo_dx, cout) \
            .transpose(1, 0, 3, 2)               # (O_dx, J, cout, lo_dx)
        slab_g = cout
        n_slabs_dx = 1
    else:
        taps_dx = jnp.flip(taps, axis=1).transpose(0, 1, 3, 2)
        o_dx = n_out
        lo_dx = taps_dx.shape[3]                 # s * slab
        slab_g = lo
        n_slabs_dx = n_out

    v_need = _cdiv(p_f + t_in, stride)
    tile = _pick_tile(v_need)
    front = j_taps - 1
    total = _pad_rows_for(t_out, front, 1, tile, v_need, j_taps)
    g_pad = jnp.pad(gbar, [(0, 0), (front, total - front - t_out), (0, 0)])
    g3 = _phase_fold(g_pad, 1, n_slabs_dx)
    out3 = _shifted_matmul(g3, taps_dx, None, tile=tile, out_rows=v_need,
                           precision=precision, slope=None,
                           interpret=interpret)
    # phase-major (N, V_pad, O*s*lo_out) -> raw padded x rows -> true rows
    raw = _phase_unfold(out3, stride, o_dx)
    dx = raw[:, p_f:p_f + t_in, :cin]
    return dx


def _dw_kernel(x_ref, g_ref, out_ref, scr, sem, *, tile, j_taps,
               n_slabs, lo_mm, r_s, precision):
    b = pl.program_id(1)
    o = pl.program_id(0)
    t = pl.program_id(2)
    if n_slabs == 1:
        slab_idx = 0
    else:
        slab_idx = o
    row0 = pl.multiple_of(t * tile, 8)
    dma = pltpu.make_async_copy(
        x_ref.at[b, slab_idx, pl.ds(row0, r_s), :], scr, sem)
    dma.start()

    @pl.when((b == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    dma.wait()
    xs = scr[...]
    g = g_ref[0]
    if precision == 'default':
        xs = xs.astype(jnp.bfloat16)
        g = g.astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32)
    else:
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    dn = (((0,), (0,)), ((), ()))
    for j in range(j_taps):
        out_ref[0, j] += jax.lax.dot_general(xs[j:j + tile], g, dn, **kw)


def _dw_impl(x, gbar, w_shape, stride, padding, groups, precision, interpret):
    """dw (cout, cg, K) from x (N, T_in, cin) and gbar (N, T_out, cout)."""
    n, t_in, cin = x.shape
    _, t_out, cout = gbar.shape
    cout_w, cg, k = w_shape
    gp, n_out, n_slabs, slab, lo = _plan(cin, cout, k, stride, groups)
    p_f, d0, j_taps = _geometry(k, stride, padding)
    tile = _pick_tile(t_out)
    n_tiles = _cdiv(t_out, tile)
    total = _pad_rows_for(t_in, p_f, stride, tile, t_out, j_taps)
    x_pad = jnp.pad(x, [(0, 0), (p_f, total - p_f - t_in), (0, 0)])
    x_ph = _phase_fold(x_pad, stride, n_slabs)
    g_pad = jnp.pad(gbar, [(0, 0), (0, n_tiles * tile - t_out), (0, 0)])
    r_s = _round_up(tile + j_taps - 1, 8)
    lx = stride * slab

    kernel = functools.partial(
        _dw_kernel, tile=tile, j_taps=j_taps, n_slabs=n_slabs,
        lo_mm=lo, r_s=r_s, precision=precision)
    taps_grad = pl.pallas_call(
        kernel,
        grid=(n_out, n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, tile, lo), lambda o, b, t: (b, t, o)),
        ],
        out_specs=pl.BlockSpec((1, j_taps, lx, lo),
                               lambda o, b, t: (o, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out, j_taps, lx, lo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r_s, lx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x_ph, g_pad)

    # unpack taps-layout gradient back to w (cout, cg, K)
    s = stride
    if groups == 1:
        # (O, J, s*cin, lo) -> w_ext (cout, cg, J, s) -> slice d0..d0+K
        wg = taps_grad.reshape(n_out, j_taps, s, cg, lo) \
            .transpose(0, 4, 3, 1, 2).reshape(cout, cg, j_taps * s)
    else:
        cog = lo // gp
        t7 = taps_grad.reshape(n_out, j_taps, s, gp, cg, gp, cog)
        ar = jnp.arange(gp)
        diag = t7[:, :, :, ar, :, ar, :]         # (gp, O, J, s, cg, cog)
        wg = diag.transpose(1, 0, 5, 4, 2, 3) \
            .reshape(cout, cg, j_taps * s)
    dw = wg[:, :, d0:d0 + k]
    return dw


# -----------------------------------------------------------------------------
# public op with custom VJP
# -----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _pallas_grouped_conv(x, w, b, stride, padding, groups, slope, precision,
                         interpret):
    return _fwd_impl(x, w, b, stride, padding, groups, slope, precision,
                     interpret)


def _pgc_fwd(x, w, b, stride, padding, groups, slope, precision, interpret):
    out = _fwd_impl(x, w, b, stride, padding, groups, slope, precision,
                    interpret)
    return out, (x, w, out if slope is not None else None)


def _pgc_bwd(stride, padding, groups, slope, precision, interpret, res, g):
    x, w, out = res
    if slope is not None:
        g = g * jnp.where(out > 0, 1.0, slope)
    db = jnp.sum(g, axis=(0, 1))
    dx = _dx_impl(g, w, stride, padding, groups, x.shape[1], precision,
                  interpret)
    dw = _dw_impl(x, g, w.shape, stride, padding, groups, precision,
                  interpret)
    return dx, dw, db


_pallas_grouped_conv.defvjp(_pgc_fwd, _pgc_bwd)


def eligible(cin: int, cout: int, k: int, stride: int, groups: int,
             t_in: int, padding: int) -> bool:
    """Shapes the kernel supports with sane MXU utilization."""
    if cin % groups or cout % groups:
        return False
    cg, cog = cin // groups, cout // groups
    t_out = (t_in + 2 * padding - k) // stride + 1
    if cg < 8 or cog < 8 or t_out < 8:
        return False
    if groups == 1:
        if cout > LANE and cout % LANE:
            return False
        sin = stride * cin
        if sin > LANE and sin % LANE:       # dx out-tile lanes
            return False
    return True


def grouped_conv1d_ntc(x: jnp.ndarray, w: jnp.ndarray,
                       b: Optional[jnp.ndarray] = None, *, stride: int = 1,
                       padding: int = 0, groups: int = 1,
                       slope: Optional[float] = None,
                       precision: str = 'default',
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Grouped conv1d on (N, T, C) with optional fused bias + leaky_relu.

    Dispatches to the Pallas kernel when the geometry is eligible AND the
    backend is TPU; everything else (ineligible shapes, CPU/GPU) falls back
    to XLA's conv. Pass ``interpret=True`` to force the kernel through the
    Pallas interpreter (parity tests on CPU). ``w`` is (C_out, C_in/groups,
    K) — the torch layout shared with
    :class:`models.vocoders.hifi_gan.WNConv1d`.
    """
    if interpret is None:
        interpret = False
        use_kernel = jax.default_backend() == 'tpu'
    else:
        use_kernel = True
    n, t_in, cin = x.shape
    cout, cg, k = w.shape
    if use_kernel and eligible(cin, cout, k, stride, groups, t_in, padding):
        return _pallas_grouped_conv(x, w, b, stride, padding, groups, slope,
                                    precision, interpret)
    # XLA fallback (NTC conv)
    out = jax.lax.conv_general_dilated(
        x, w.transpose(2, 1, 0), window_strides=(stride,),
        padding=[(padding, padding)], dimension_numbers=('NHC', 'HIO', 'NHC'),
        feature_group_count=groups,
        precision=(jax.lax.Precision.HIGHEST if precision == 'highest'
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b[None, None, :]
    if slope is not None:
        out = jnp.where(out > 0, out, slope * out)
    return out
