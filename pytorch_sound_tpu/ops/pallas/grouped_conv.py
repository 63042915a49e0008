"""Pallas grouped/strided conv1d (fwd + custom VJP) — the GAN-critic kernel.

Why: the HiFi-GAN multi-scale discriminator is a stack of grouped k=41 convs
(`models/vocoders/discriminators.py:ScaleDiscriminator`, the trainable critics
for the reference's bundled generator,
`/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:96-147`) and is
~88% of the adversarial VCTK step. XLA's grouped-conv lowering measures only
4-15 TFLOP/s on those shapes on v5e (all layouts/precisions) because each
group is a narrow (<=128-reduction) conv. This kernel reaches MXU-shaped
matmuls with three ideas:

1. **Two-sided phase folding**: a stride-``s`` conv is ``s`` polyphase
   stride-1 convs (input fold), and narrow outputs are widened by computing
   ``s_out`` consecutive output rows in the lane dim (output fold). With
   both folds the whole conv is J = ~ceil(K/(s*s_out))+1 shifted matmuls
   ``out += xs[j : j+T] @ W_j`` whose reduction is ``s*s_out*C/G`` and whose
   lane width is ``s_out*C_out/G`` — both sized to fill the 128-wide MXU
   with mostly-useful work. (Input folding happens once at the XLA level:
   Mosaic cannot lower the sublane->lane merge for sub-128-lane slabs
   in-kernel.)
2. **Group packing**: when folding alone can't fill the lanes, ``gp`` groups
   are packed into block-diagonal taps; the planner (`_plan`) minimizes
   executed (padded) MACs over all (gp, s_out) combos — e.g. the MSD's
   128->128 g=4 s=2 layer runs at 73% useful MXU work folded (s_out=4)
   vs 25% packed (gp=4).
3. **One generic executor** runs forward AND input-gradient: dx is the same
   shifted-matmul with taps transposed + tap order reversed and its own
   (fold, pack) plan. A separate accumulation kernel produces the weight
   gradient with x tiles kept VMEM-resident across all taps.

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

# Executor tuning knobs (A/B-able per process without code changes):
#   PSTPU_GC_TAP_MODE: 'slice' (default) feeds each tap's LHS as a
#     sublane-offset slice of the scratch block; 'rot8' materializes the
#     <=8 sublane-phase rotations once so every tap reads an 8-ALIGNED
#     slice (j_taps misaligned reads -> min(8, j) rotations).
#   PSTPU_GC_XWIRE: 'f32' (default) DMAs the phase-folded input as f32;
#     'bf16' halves the HBM->VMEM bytes (inputs are cast to bf16 for the
#     MXU in 'default' precision anyway, so 'bf16' only moves the rounding
#     before the DMA).
#   PSTPU_GC_COST: 'rate' (default) scales the planner's executed-MAC cost
#     by the measured lane-width rate curve (a 128-lane matmul runs ~0.25x
#     the 512-lane rate), so wider-lo plans win even at more executed MACs;
#     'macs' is the pure executed-MAC model (round-2 behavior).
#   PSTPU_GC_BATCH_FOLD: 'auto' (default) folds the batch dim into the
#     matmul row dim (with zero guard rows between items) when per-item
#     out rows < MAX_TILE — deep short-T layers get full-M matmuls and a
#     ~B-times smaller grid; 'never' / 'always' override.
import os as _os

TAP_MODE = _os.environ.get('PSTPU_GC_TAP_MODE', 'slice')
X_WIRE = _os.environ.get('PSTPU_GC_XWIRE', 'f32')
COST_MODE = _os.environ.get('PSTPU_GC_COST', 'rate')
BATCH_FOLD = _os.environ.get('PSTPU_GC_BATCH_FOLD', 'auto')
# PSTPU_GC_EXEC: 'grid' (default) = one program per out tile with a
# synchronous scratch DMA; 'pipe' = one program per (batch, out-lane-tile)
# looping tiles in-kernel with double-buffered scratch DMAs, so tile t+1's
# HBM->VMEM copy overlaps tile t's matmuls (recovers the ~5-15% the serial
# DMA costs). 'pipe' uses 'slice' tap reads (rot8 ignored).
EXEC_MODE = _os.environ.get('PSTPU_GC_EXEC', 'grid')

# skip planner combos whose packed taps alone would crowd VMEM
_MAX_TAP_BYTES = 40 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# -----------------------------------------------------------------------------
# planning
# -----------------------------------------------------------------------------

def _fold_options(limit: int):
    f = 1
    while f <= limit:
        yield f
        f *= 2


def _plan(cin: int, cout: int, k: int, stride: int, groups: int, pad: int,
          dilation: int = 1):
    """Choose (gp, s_out) minimizing executed MACs for the fwd matmul.

    Returns (gp, s_out, O, slab, lo_mm): per out-tile the matmul is
    (tile, S*slab) @ (S*slab, lo_mm) with S = stride*s_out, slab = gp*cg,
    lo_mm = s_out*gp*cog; O = number of out tiles (== input slab count for
    grouped convs, 1 slab for dense).
    """
    cg, cog = cin // groups, cout // groups
    if groups == 1:
        # dense: either classic out-channel tiles (s_out=1), or fold s_out
        # output rows into lanes — the narrow-channel long-T generator case
        # (e.g. 64ch k7: (tile,512)@(512,512) instead of (tile,128)@(128,64))
        best = None
        for s_out in _fold_options(LANE):
            lo = s_out * cout
            if lo > 4 * LANE:
                break
            if s_out > 1 and lo % LANE and lo > LANE:
                continue
            s = stride * s_out
            p_f = _round_up(pad, s)
            d0 = p_f - pad
            j_taps = (stride * (s_out - 1) + dilation * (k - 1) + d0) // s + 1
            if j_taps * _round_up(s * cin, LANE) * lo * 4 > _MAX_TAP_BYTES:
                continue
            # cost ∝ executed MACs / lane-width win: wider lo engages more
            # MXU lanes (measured: (K,128) runs ~0.5x the (K,512) rate)
            rate = min(lo, 512) / 512
            cost = j_taps * _round_up(s * cin, LANE) / rate
            if best is None or cost < best[0]:
                best = (cost, s_out)
        if best is not None and best[1] > 1:
            s_out = best[1]
            return 1, s_out, 1, cin, s_out * cout
        if cout <= LANE:
            return 1, 1, 1, cin, cout
        lo = LANE
        if COST_MODE == 'rate':
            # widest 128-aligned out tile <= 512 lanes: a (K,512) product
            # runs ~4x the (K,128) rate at identical executed MACs
            for cand in (4 * LANE, 2 * LANE):
                if cout % cand == 0:
                    lo = cand
                    break
        return 1, 1, _cdiv(cout, lo), cin, lo
    best = None
    for gp in range(1, groups + 1):
        if groups % gp:
            continue
        for s_out in _fold_options(LANE):
            lo = gp * cog * s_out
            if lo > 4 * LANE:
                break
            # out lane-block offset o*lo must stay 128-aligned unless
            # there is a single out tile covering the whole lane axis
            if groups // gp > 1 and lo % LANE:
                continue
            s = stride * s_out
            p_f = _round_up(pad, s)
            d0 = p_f - pad
            j_taps = (stride * (s_out - 1) + dilation * (k - 1) + d0) // s + 1
            lx_p = _round_up(s * gp * cg, LANE)
            if j_taps * lx_p * lo * 4 > _MAX_TAP_BYTES:
                continue
            # executed MACs ∝ G*cog * j_taps * pad128(S*gp*cg): the reduction
            # lane dim is zero-padded to the 128 tile by the executor
            cost = j_taps * lx_p
            if COST_MODE == 'rate':
                # narrow-lo matmuls leave MXU lanes idle (measured: a (K,128)
                # product runs ~0.25-0.5x the (K,512) rate) — normalize the
                # executed MACs by the lane-fill rate
                cost = cost / (min(lo, 4 * LANE) / (4 * LANE))
            if best is None or cost < best[0]:
                best = (cost, gp, s_out)
    _, gp, s_out = best
    return gp, s_out, groups // gp, gp * cg, s_out * gp * (cout // groups)


def _plan_dx(cin: int, cout: int, k: int, stride: int, groups: int,
             pad: int, dilation: int = 1):
    """(gp, e_g) for the dx pass (or None if no legal layout exists):
    out lanes are e_g*stride*gp*cg, reduction per tap is e_g*gp*cog."""
    cg, cog = cin // groups, cout // groups
    best = None
    for gp in range(1, groups + 1):
        if groups % gp:
            continue
        for e_g in _fold_options(LANE):
            lanes = e_g * stride * gp * cg
            if lanes > 4 * LANE:
                break
            if lanes % LANE and (groups // gp > 1 or lanes > LANE):
                continue
            f_pad = max(0, _cdiv(dilation * (k - 1) - pad, stride)) \
                + e_g - 1
            j_taps = (e_g * stride - 1 + pad + stride * f_pad) // (
                stride * e_g) + 1
            lx_p = _round_up(e_g * gp * cog, LANE)
            if j_taps * lx_p * lanes * 4 > _MAX_TAP_BYTES:
                continue
            # executed MACs ∝ G*cg * j_taps * pad128(e_g*gp*cog)
            cost = j_taps * lx_p
            if COST_MODE == 'rate':
                cost = cost / (min(lanes, 4 * LANE) / (4 * LANE))
            if best is None or cost < best[0]:
                best = (cost, gp, e_g)
    if best is None:
        return None
    return best[1], best[2]


def _geometry(k: int, stride: int, s_out: int, pad: int,
              dilation: int = 1):
    """Fwd fold geometry: front raw pad P_f, tap offset d0, tap count J."""
    s = stride * s_out
    p_f = _round_up(pad, s)
    d0 = p_f - pad
    span = dilation * (k - 1)
    j_taps = (stride * (s_out - 1) + span + d0) // s + 1
    return p_f, d0, j_taps


# -----------------------------------------------------------------------------
# tap packing
# -----------------------------------------------------------------------------

def _pack_fwd_taps(w: jnp.ndarray, gp: int, O: int, s_in: int, s_out: int,
                   j_taps: int, d0: int, groups: int,
                   dilation: int = 1) -> jnp.ndarray:
    """w (cout, cg, K) -> taps (O, J, S*slab, s_out*gp*cog).

    Row order within a tap: (p, gi, ci) phase-major over S = s_in*s_out;
    col order: (r, gi, co) output-phase-major — matching `_phase_fold` /
    `_phase_unfold`. taps[o,j,(p,gi,ci),(r,gi',co)] = w[o,gi,co,ci,m] for
    m = S*j + p - s_in*r - d0 in [0, K) and gi == gi', else 0.
    Dense (groups == 1, s_out == 1): out-channel tiles of `lo` lanes.
    """
    cout, cg, k = w.shape
    S = s_in * s_out
    if groups == 1 and s_out == 1 and dilation == 1:
        lo = cout // O
        w_ext = jnp.pad(w, [(0, 0), (0, 0), (d0, S * j_taps - k - d0)])
        we = w_ext.reshape(O, lo, cg, j_taps, S)
        return we.transpose(0, 3, 4, 2, 1).reshape(O, j_taps, S * cg, lo)
    cog = cout // groups
    wt = w.reshape(O, gp, cog, cg, k)
    jg = np.arange(j_taps)[:, None, None]
    pg = np.arange(S)[None, :, None]
    rg = np.arange(s_out)[None, None, :]
    pos = S * jg + pg - s_in * rg - d0                 # (J, S, s_out)
    m = pos // dilation
    valid = jnp.asarray((pos >= 0) & (pos % dilation == 0) & (m < k), w.dtype)
    mc = jnp.asarray(np.clip(m, 0, k - 1))
    # gathered (O, gp, cog, cg, J, S, s_out)
    gathered = wt[..., mc] * valid[None, None, None, None]
    # block-diagonal over gi: z[o, j, p, gi, ci, r, gi, co]
    z = jnp.zeros((O, j_taps, S, gp, cg, s_out, gp, cog), w.dtype)
    ar = jnp.arange(gp)
    diag_src = gathered.transpose(1, 0, 4, 5, 3, 6, 2)  # (gp,O,J,p,ci,r,co)
    z = z.at[:, :, :, ar, :, :, ar, :].set(diag_src)
    return z.reshape(O, j_taps, S * gp * cg, s_out * gp * cog)


def _pack_dx_taps(w: jnp.ndarray, gp: int, e_g: int, s_in: int, pad: int,
                  groups: int, f_pad: int, j_taps: int,
                  dilation: int = 1) -> jnp.ndarray:
    """Taps for dx: (O, J, e_g*gp*cog, E*gp*cg) with E = e_g*s_in.

    Row order: (q, gi, co) over the folded-by-e_g gradient; col order:
    (rho, gi, ci) over the folded-by-E dx rows.
    T[j][(q,gi,co),(rho,gi',ci)] = w[gi,co,ci,m] for
    m = rho + pad + s_in*f_pad - s_in*(e_g*j + q) in [0, K), gi == gi'.
    """
    cout, cg, k = w.shape
    cog = cout // groups
    O = groups // gp
    E = e_g * s_in
    wt = w.reshape(O, gp, cog, cg, k)
    jg = np.arange(j_taps)[:, None, None]
    qg = np.arange(e_g)[None, :, None]
    rg = np.arange(E)[None, None, :]
    pos = rg + pad + s_in * f_pad - s_in * (e_g * jg + qg)  # (J, e_g, E)
    m = pos // dilation
    valid = jnp.asarray((pos >= 0) & (pos % dilation == 0) & (m < k), w.dtype)
    mc = jnp.asarray(np.clip(m, 0, k - 1))
    gathered = wt[..., mc] * valid[None, None, None, None]  # (O,gp,cog,cg,J,e_g,E)
    z = jnp.zeros((O, j_taps, e_g, gp, cog, E, gp, cg), w.dtype)
    ar = jnp.arange(gp)
    diag_src = gathered.transpose(1, 0, 4, 5, 2, 6, 3)     # (gp,O,J,q,co,rho,ci)
    z = z.at[:, :, :, ar, :, :, ar, :].set(diag_src)
    return z.reshape(O, j_taps, e_g * gp * cog, E * gp * cg)


# -----------------------------------------------------------------------------
# executor
# -----------------------------------------------------------------------------

def _kernel(x_ref, taps_ref, bias_ref, out_ref, *scratch,
            tile: int, j_taps: int, n_slabs: int, lo_mm: int, r_s: int,
            precision: str, slope: Optional[float], has_bias: bool,
            tap_mode: str, rot_rows: int):
    if tap_mode == 'rot8':
        scr, rot, sem = scratch
    else:
        (scr, sem), rot = scratch, None
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
        if xs.dtype != jnp.bfloat16:
            xs = xs.astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32)
    else:
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    acc = jnp.zeros((tile, lo_mm), jnp.float32)
    if tap_mode == 'rot8':
        # materialize the <=8 sublane-phase rotations ONCE; every tap then
        # reads an 8-aligned slice (j_taps misaligned reads -> min(8, j)
        # rotations)
        for r in range(min(8, j_taps)):
            rot[r] = jnp.pad(xs[r:], ((0, r), (0, 0)))[:rot_rows]
        for j in range(j_taps):
            q8, r = divmod(j, 8)
            acc = acc + jnp.dot(rot[r, 8 * q8:8 * q8 + tile],
                                taps_ref[0, j], **kw)
    else:
        for j in range(j_taps):
            acc = acc + jnp.dot(xs[j:j + tile], taps_ref[0, j], **kw)
    if has_bias:
        acc = acc + bias_ref[0, 0][None, :]
    if slope is not None:
        acc = jnp.where(acc > 0, acc, slope * acc)
    out_ref[0] = acc


def _pipe_kernel(x_ref, taps_ref, bias_ref, out_ref, scr0, scr1, sem0, sem1,
                 *, tile: int, j_taps: int, n_slabs: int, lo_mm: int,
                 r_s: int, n_tiles: int, precision: str,
                 slope: Optional[float], has_bias: bool):
    """Double-buffered executor: grid (n, o); tiles loop in-kernel so tile
    t+1's scratch DMA overlaps tile t's matmuls."""
    b = pl.program_id(0)
    o = pl.program_id(1)
    slab_idx = 0 if n_slabs == 1 else o

    def dma_for(t, scr, sem):
        row0 = pl.multiple_of(t * tile, 8)
        return pltpu.make_async_copy(
            x_ref.at[b, slab_idx, pl.ds(row0, r_s), :], scr, sem)

    dma_for(0, scr0, sem0).start()
    for t in range(n_tiles):
        cur_scr, cur_sem = (scr0, sem0) if t % 2 == 0 else (scr1, sem1)
        nxt_scr, nxt_sem = (scr1, sem1) if t % 2 == 0 else (scr0, sem0)
        if t + 1 < n_tiles:
            dma_for(t + 1, nxt_scr, nxt_sem).start()
        dma_for(t, cur_scr, cur_sem).wait()
        xs = cur_scr[...]
        if precision == 'default':
            if xs.dtype != jnp.bfloat16:
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
        out_ref[0, t * tile:(t + 1) * tile, :] = acc


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
    if lx % LANE:
        # Mosaic requires HBM-DMA'd lane extents to be multiples of the 128
        # tile; zero-pad the reduction lanes (zero taps rows -> no effect)
        lx_p = _round_up(lx, LANE)
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0), (0, 0), (0, lx_p - lx)])
        taps = jnp.pad(taps, [(0, 0), (0, 0), (0, lx_p - lx), (0, 0)])
        lx = lx_p
    n_tiles = _cdiv(out_rows, tile)
    r_s = _round_up(tile + j_taps - 1, 8)
    assert ph_rows >= (n_tiles - 1) * tile + r_s, \
        'x_ph under-padded: %d < %d' % (ph_rows, (n_tiles - 1) * tile + r_s)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((n_out_tiles, 1, lo_mm), jnp.float32)
    if precision == 'default':
        taps = taps.astype(jnp.bfloat16)
        if X_WIRE == 'bf16':
            # halve the HBM->VMEM scratch DMA; the MXU consumes bf16 in
            # 'default' precision anyway (rounding moves before the DMA)
            x_ph = x_ph.astype(jnp.bfloat16)
    if EXEC_MODE == 'pipe':
        n_tiles_p = _cdiv(out_rows, tile)
        kernel = functools.partial(
            _pipe_kernel, tile=tile, j_taps=j_taps, n_slabs=n_slabs,
            lo_mm=lo_mm, r_s=r_s, n_tiles=n_tiles_p, precision=precision,
            slope=slope, has_bias=has_bias)
        out = pl.pallas_call(
            kernel,
            grid=(n, n_out_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, j_taps, lx, lo_mm), lambda b, o: (o, 0, 0, 0)),
                pl.BlockSpec((1, 1, lo_mm), lambda b, o: (o, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n_tiles_p * tile, lo_mm),
                                   lambda b, o: (b, 0, o)),
            out_shape=jax.ShapeDtypeStruct(
                (n, n_tiles_p * tile, n_out_tiles * lo_mm), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((r_s, lx), x_ph.dtype),
                pltpu.VMEM((r_s, lx), x_ph.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=('parallel', 'arbitrary')),
            interpret=interpret,
        )(x_ph, taps, bias)
        return out

    tap_mode = 'rot8' if TAP_MODE == 'rot8' else 'slice'
    n_q8 = _cdiv(j_taps, 8)
    rot_rows = _round_up(tile + 8 * (n_q8 - 1), 8)

    kernel = functools.partial(
        _kernel, tile=tile, j_taps=j_taps, n_slabs=n_slabs,
        lo_mm=lo_mm, r_s=r_s, precision=precision, slope=slope,
        has_bias=has_bias, tap_mode=tap_mode, rot_rows=rot_rows)
    scratch_shapes = [pltpu.VMEM((r_s, lx), x_ph.dtype)]
    if tap_mode == 'rot8':
        rot_dtype = (jnp.bfloat16 if precision == 'default'
                     else jnp.float32)
        scratch_shapes.append(
            pltpu.VMEM((min(8, j_taps), rot_rows, lx), rot_dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_out_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, j_taps, lx, lo_mm), lambda b, o, t: (o, 0, 0, 0)),
            pl.BlockSpec((1, 1, lo_mm), lambda b, o, t: (o, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, lo_mm),
                               lambda b, o, t: (b, t, o)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles * tile, n_out_tiles * lo_mm), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x_ph, taps, bias)
    return out


def _pad_rows_for(t_rows_in: int, front: int, s_fold: int, tile: int,
                  out_rows: int, j_taps: int) -> int:
    """Total raw rows after padding so every program's DMA span is in-bounds
    (a multiple of the fold factor ``s_fold``)."""
    n_tiles = _cdiv(out_rows, tile)
    r_s = _round_up(tile + j_taps - 1, 8)
    need_raw = ((n_tiles - 1) * tile + r_s) * s_fold
    return max(need_raw, _round_up(front + t_rows_in, s_fold))


def _pick_tile(out_rows: int) -> int:
    if out_rows >= MAX_TILE:
        return MAX_TILE
    return _round_up(out_rows, 8)


def _fold_rows(n: int, v_rows: int, j_taps: int, min_raw_rows: int):
    """Batch-fold item row stride R, or None when folding is off/unhelpful.

    Folding concatenates the N items along the matmul row dim with R rows per
    item: R >= v_rows + j_taps - 1 keeps every valid out row's tap window
    inside its own item's rows + trailing zero guard (windows starting in the
    guard produce garbage rows that the caller strips), and R >= min_raw_rows
    keeps the item's raw front-pad + signal in capacity. Worth it exactly when
    per-item out rows are tile-starved (v_rows < MAX_TILE): deep MSD layers
    (T<=256) go from (<=128, lx) matmuls and a B*O-program grid to full
    (512, lx) tiles and a ~B-times smaller grid.
    """
    if BATCH_FOLD == 'never' or n <= 1:
        return None
    if BATCH_FOLD != 'always' and v_rows >= MAX_TILE:
        return None
    return _round_up(max(v_rows + j_taps - 1, min_raw_rows), 8)


def _fold_items(x_ph: jnp.ndarray, out_rows: int, tile: int,
                j_taps: int) -> jnp.ndarray:
    """(N, n_slabs, R, lx) per-item phase rows -> (1, n_slabs, N*R(+pad), lx)
    with enough trailing rows for every program's DMA span."""
    n, n_slabs, r_rows, lx = x_ph.shape
    flat = jnp.swapaxes(x_ph, 0, 1).reshape(1, n_slabs, n * r_rows, lx)
    n_tiles = _cdiv(out_rows, tile)
    need = (n_tiles - 1) * tile + _round_up(tile + j_taps - 1, 8)
    if flat.shape[2] < need:
        flat = jnp.pad(flat, [(0, 0), (0, 0), (0, need - flat.shape[2]),
                              (0, 0)])
    return flat


def _unfold_items(out3: jnp.ndarray, n: int, r_rows: int,
                  v_rows: int) -> jnp.ndarray:
    """(1, rows, L) folded kernel output -> (N, v_rows, L) valid per-item rows."""
    o2 = out3[0]
    rows = n * r_rows
    if o2.shape[0] < rows:
        o2 = jnp.pad(o2, [(0, rows - o2.shape[0]), (0, 0)])
    return o2[:rows].reshape(n, r_rows, -1)[:, :v_rows]


# -----------------------------------------------------------------------------
# forward / dx / dw wrappers
# -----------------------------------------------------------------------------

def _fwd_impl(x, w, b, stride, padding, groups, dilation, slope,
              precision, interpret):
    n, t_in, cin = x.shape
    cout, cg, k = w.shape
    t_out = (t_in + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    gp, s_out, n_out, slab, lo_mm = _plan(cin, cout, k, stride, groups,
                                          padding, dilation)
    S = stride * s_out
    p_f, d0, j_taps = _geometry(k, stride, s_out, padding, dilation)
    v_rows = _cdiv(t_out, s_out)
    n_slabs = n_out if groups > 1 else 1
    R = _fold_rows(n, v_rows, j_taps, _cdiv(p_f + t_in, S))
    if R is not None:
        x_pad = jnp.pad(x, [(0, 0), (p_f, R * S - p_f - t_in), (0, 0)])
        out_rows = (n - 1) * R + v_rows
        tile = _pick_tile(out_rows)
        x_ph = _fold_items(_phase_fold(x_pad, S, n_slabs), out_rows, tile,
                           j_taps)
    else:
        out_rows = v_rows
        tile = _pick_tile(v_rows)
        total = _pad_rows_for(t_in, p_f, S, tile, v_rows, j_taps)
        x_pad = jnp.pad(x, [(0, 0), (p_f, total - p_f - t_in), (0, 0)])
        x_ph = _phase_fold(x_pad, S, n_slabs)
    taps = _pack_fwd_taps(w, gp, n_out, stride, s_out, j_taps, d0, groups,
                          dilation)
    if b is None:
        bias2 = None
    else:
        bt = b.reshape(n_out, lo_mm // s_out)
        bias2 = jnp.tile(bt, (1, s_out)).reshape(n_out, 1, lo_mm) \
            .astype(jnp.float32)
    out3 = _shifted_matmul(x_ph, taps, bias2, tile=tile, out_rows=out_rows,
                           precision=precision, slope=slope,
                           interpret=interpret)
    if R is not None:
        out3 = _unfold_items(out3, n, R, v_rows)
    raw = _phase_unfold(out3, s_out, n_out)
    return raw[:, :t_out, :cout]


def _dx_impl(gbar, w, stride, padding, groups, dilation, t_in, precision,
             interpret):
    """gbar (N, T_out, cout) -> dx (N, T_in, cin)."""
    n, t_out, cout = gbar.shape
    _, cg, k = w.shape
    cin = cg * groups

    if groups == 1 and dilation == 1 and _plan_dx(
            cin, cout, k, stride, 1, padding) in (None, (1, 1)):
        # dense: reuse the fwd packer at s_out=1, gather full-cout reduction.
        # (When an e_g>1 folded layout exists — narrow-channel generator
        # convs — the general grouped path below is the better program.)
        p_f, d0, j_taps = _geometry(k, stride, 1, padding, dilation)
        o_fw = 1 if cout <= LANE else cout // LANE
        taps = _pack_fwd_taps(w, 1, o_fw, stride, 1, j_taps, d0, groups,
                              dilation)
        sin = taps.shape[2]                      # s * cin
        t_all = jnp.flip(taps, axis=1).transpose(1, 2, 0, 3) \
            .reshape(j_taps, sin, cout)
        o_dx = _cdiv(sin, LANE)
        if COST_MODE == 'rate' and sin > LANE:
            for cand in (4 * LANE, 2 * LANE):   # widest 128-aligned dx tile
                if sin % cand == 0:
                    o_dx = sin // cand
                    break
        lo_dx = sin // o_dx
        taps_dx = t_all.reshape(j_taps, o_dx, lo_dx, cout) \
            .transpose(1, 0, 3, 2)               # (O_dx, J, cout, lo_dx)
        v_need = _cdiv(p_f + t_in, stride)
        front = j_taps - 1
        R = _fold_rows(n, v_need, j_taps, front + t_out)
        if R is not None:
            g_pad = jnp.pad(gbar, [(0, 0), (front, R - front - t_out),
                                   (0, 0)])
            out_rows = (n - 1) * R + v_need
            tile = _pick_tile(out_rows)
            g3 = _fold_items(_phase_fold(g_pad, 1, 1), out_rows, tile,
                             j_taps)
        else:
            out_rows = v_need
            tile = _pick_tile(v_need)
            total = _pad_rows_for(t_out, front, 1, tile, v_need, j_taps)
            g_pad = jnp.pad(gbar, [(0, 0), (front, total - front - t_out),
                                   (0, 0)])
            g3 = _phase_fold(g_pad, 1, 1)
        out3 = _shifted_matmul(g3, taps_dx, None, tile=tile,
                               out_rows=out_rows, precision=precision,
                               slope=None, interpret=interpret)
        if R is not None:
            out3 = _unfold_items(out3, n, R, v_need)
        # global out lanes are (p, ci) regardless of the executor's o_dx
        # lane-tile split, so unfold as ONE tile of stride phases
        raw = _phase_unfold(out3, stride, 1)
        return raw[:, p_f:p_f + t_in, :cin]

    plan = _plan_dx(cin, cout, k, stride, groups, padding, dilation)
    if plan is None:
        # no legal folded layout (odd channel counts) — XLA transposed conv
        def f(x):
            return jax.lax.conv_general_dilated(
                x, w.transpose(2, 1, 0), window_strides=(stride,),
                padding=[(padding, padding)],
                rhs_dilation=(dilation,),
                dimension_numbers=('NHC', 'HIO', 'NHC'),
                feature_group_count=groups,
                precision=(jax.lax.Precision.HIGHEST
                           if precision == 'highest'
                           else jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32)
        _, vjp = jax.vjp(f, jnp.zeros((n, t_in, cin), gbar.dtype))
        return vjp(gbar)[0]
    gp, e_g = plan
    O = groups // gp
    E = e_g * stride
    f_pad = max(0, _cdiv(dilation * (k - 1) - padding, stride)) + e_g - 1
    j_taps = (E - 1 + padding + stride * f_pad) // (stride * e_g) + 1
    taps_dx = _pack_dx_taps(w, gp, e_g, stride, padding, groups, f_pad,
                            j_taps, dilation)
    v_need = _cdiv(t_in, E)
    R = _fold_rows(n, v_need, j_taps, _cdiv(f_pad + t_out, e_g))
    if R is not None:
        g_pad = jnp.pad(gbar, [(0, 0), (f_pad, R * e_g - f_pad - t_out),
                               (0, 0)])
        out_rows = (n - 1) * R + v_need
        tile = _pick_tile(out_rows)
        g3 = _fold_items(_phase_fold(g_pad, e_g, O), out_rows, tile, j_taps)
    else:
        out_rows = v_need
        tile = _pick_tile(v_need)
        total = _pad_rows_for(t_out, f_pad, e_g, tile, v_need, j_taps)
        g_pad = jnp.pad(gbar, [(0, 0), (f_pad, total - f_pad - t_out),
                               (0, 0)])
        g3 = _phase_fold(g_pad, e_g, O)
    out3 = _shifted_matmul(g3, taps_dx, None, tile=tile, out_rows=out_rows,
                           precision=precision, slope=None,
                           interpret=interpret)
    if R is not None:
        out3 = _unfold_items(out3, n, R, v_need)
    raw = _phase_unfold(out3, E, O)
    return raw[:, :t_in, :cin]


def _dw_kernel(x_ref, g_ref, out_ref, *scratch, tile, j_taps,
               n_slabs, lo_mm, r_s, precision, tap_mode, rot_rows):
    if tap_mode == 'rot8':
        scr, rot, sem = scratch
    else:
        (scr, sem), rot = scratch, None
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
    g = g_ref[0, 0]
    if precision == 'default':
        if xs.dtype != jnp.bfloat16:
            xs = xs.astype(jnp.bfloat16)
        g = g.astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32)
    else:
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    dn = (((0,), (0,)), ((), ()))
    if tap_mode == 'rot8':
        for r in range(min(8, j_taps)):
            rot[r] = jnp.pad(xs[r:], ((0, r), (0, 0)))[:rot_rows]
        for j in range(j_taps):
            q8, r = divmod(j, 8)
            out_ref[0, j] += jax.lax.dot_general(
                rot[r, 8 * q8:8 * q8 + tile], g, dn, **kw)
    else:
        for j in range(j_taps):
            out_ref[0, j] += jax.lax.dot_general(xs[j:j + tile], g, dn, **kw)


def _dw_impl(x, gbar, w_shape, stride, padding, groups, dilation,
             precision, interpret):
    """dw (cout, cg, K) from x (N, T_in, cin) and gbar (N, T_out, cout).

    Accumulates the gradient in the packed fwd-tap layout (x tiles stay
    VMEM-resident across all taps), then unpacks: each weight w[m] appears
    s_out times in the packed layout (once per output phase r); the true
    gradient is the sum of the s_out copies.
    """
    n, t_in, cin = x.shape
    _, t_out, cout = gbar.shape
    cout_w, cg, k = w_shape
    gp, s_out, n_out, slab, lo_mm = _plan(cin, cout, k, stride, groups,
                                          padding, dilation)
    S = stride * s_out
    p_f, d0, j_taps = _geometry(k, stride, s_out, padding, dilation)
    v_rows = _cdiv(t_out, s_out)
    n_slabs = n_out if groups > 1 else 1
    R = _fold_rows(n, v_rows, j_taps, _cdiv(p_f + t_in, S))
    if R is not None:
        # batch-fold: contract ALL n*R folded rows (guard rows carry zero
        # gradient, so they add nothing to dw) in one batch-grid entry
        rows_all = n * R
        tile = _pick_tile(rows_all)
        n_tiles = _cdiv(rows_all, tile)
        x_pad = jnp.pad(x, [(0, 0), (p_f, R * S - p_f - t_in), (0, 0)])
        x_ph = _fold_items(_phase_fold(x_pad, S, n_slabs), rows_all, tile,
                           j_taps)
        g_pad = jnp.pad(gbar, [(0, 0), (0, R * s_out - t_out), (0, 0)])
        g4 = _phase_fold(g_pad, s_out, n_out)    # (N, O, R, lo_mm)
        g4 = jnp.swapaxes(g4, 0, 1).reshape(1, n_out, rows_all, lo_mm)
        if rows_all < n_tiles * tile:
            g4 = jnp.pad(g4, [(0, 0), (0, 0),
                              (0, n_tiles * tile - rows_all), (0, 0)])
        n_b = 1
    else:
        tile = _pick_tile(v_rows)
        n_tiles = _cdiv(v_rows, tile)
        total = _pad_rows_for(t_in, p_f, S, tile, v_rows, j_taps)
        x_pad = jnp.pad(x, [(0, 0), (p_f, total - p_f - t_in), (0, 0)])
        x_ph = _phase_fold(x_pad, S, n_slabs)
        g_rows = n_tiles * tile * s_out
        g_pad = jnp.pad(gbar, [(0, 0), (0, g_rows - t_out), (0, 0)])
        g4 = _phase_fold(g_pad, s_out, n_out)    # (N, O, v_rows_pad, lo_mm)
        n_b = n
    r_s = _round_up(tile + j_taps - 1, 8)
    lx_real = S * slab
    lx = _round_up(lx_real, LANE)               # DMA lane-tile alignment
    if lx != lx_real:
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0), (0, 0), (0, lx - lx_real)])

    if precision == 'default' and X_WIRE == 'bf16':
        x_ph = x_ph.astype(jnp.bfloat16)
    tap_mode = 'rot8' if TAP_MODE == 'rot8' else 'slice'
    n_q8 = _cdiv(j_taps, 8)
    rot_rows = _round_up(tile + 8 * (n_q8 - 1), 8)
    kernel = functools.partial(
        _dw_kernel, tile=tile, j_taps=j_taps, n_slabs=n_slabs,
        lo_mm=lo_mm, r_s=r_s, precision=precision, tap_mode=tap_mode,
        rot_rows=rot_rows)
    scratch_shapes = [pltpu.VMEM((r_s, lx), x_ph.dtype)]
    if tap_mode == 'rot8':
        scratch_shapes.append(pltpu.VMEM(
            (min(8, j_taps), rot_rows, lx),
            jnp.bfloat16 if precision == 'default' else jnp.float32))
    scratch_shapes.append(pltpu.SemaphoreType.DMA)
    taps_grad = pl.pallas_call(
        kernel,
        grid=(n_out, n_b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, tile, lo_mm), lambda o, b, t: (b, o, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, j_taps, lx, lo_mm),
                               lambda o, b, t: (o, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out, j_taps, lx, lo_mm),
                                       jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x_ph, g4)
    taps_grad = taps_grad[:, :, :lx_real, :]

    if groups == 1 and s_out == 1 and dilation == 1:
        # (O, J, S*cin, lo) -> w_ext (cout, cg, J*S) -> slice d0..d0+K
        lo = lo_mm
        wg = taps_grad.reshape(n_out, j_taps, S, cg, lo) \
            .transpose(0, 4, 3, 1, 2).reshape(cout, cg, j_taps * S)
        return wg[:, :, d0:d0 + k]
    cog = lo_mm // (s_out * gp)
    t8 = taps_grad.reshape(n_out, j_taps, S, gp, cg, s_out, gp, cog)
    ar = jnp.arange(gp)
    diag = t8[:, :, :, ar, :, :, ar, :]          # (gp, O, J, S, cg, s_out, cog)
    # dw[m] = sum_r diag[j(m,r), p(m,r), r]
    mg = np.arange(k)[:, None]
    rg = np.arange(s_out)[None, :]
    lin = stride * rg + dilation * mg + d0       # (K, s_out)
    j_idx = jnp.asarray(lin // S)
    p_idx = jnp.asarray(lin % S)
    r_idx = jnp.asarray(np.broadcast_to(rg, (k, s_out)))
    g6 = diag[:, :, j_idx, p_idx, :, r_idx, :]
    # index arrays at axes (2,3,5) are SEPARATED by the sliced cg axis, so
    # their broadcast shape (K, s_out) moves to the front:
    # g6 is (K, s_out, gp, O, cg, cog); the true dw[m] sums the s_out copies
    g5 = g6.sum(axis=1)                          # (K, gp, O, cg, cog)
    dw = g5.transpose(2, 1, 4, 3, 0).reshape(cout, cg, k)
    return dw


# -----------------------------------------------------------------------------
# public op with custom VJP
# -----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _pallas_grouped_conv(x, w, b, stride, padding, groups, dilation, slope,
                         precision, interpret):
    return _fwd_impl(x, w, b, stride, padding, groups, dilation, slope,
                     precision, interpret)


def _pgc_fwd(x, w, b, stride, padding, groups, dilation, slope, precision,
             interpret):
    out = _fwd_impl(x, w, b, stride, padding, groups, dilation, slope,
                    precision, interpret)
    return out, (x, w, out if slope is not None else None)


def _pgc_bwd(stride, padding, groups, dilation, slope, precision, interpret,
             res, g):
    x, w, out = res
    if slope is not None:
        g = g * jnp.where(out > 0, 1.0, slope)
    db = jnp.sum(g, axis=(0, 1))
    dx = _dx_impl(g, w, stride, padding, groups, dilation, x.shape[1],
                  precision, interpret)
    dw = _dw_impl(x, g, w.shape, stride, padding, groups, dilation,
                  precision, interpret)
    return dx, dw, db


_pallas_grouped_conv.defvjp(_pgc_fwd, _pgc_bwd)


def eligible(cin: int, cout: int, k: int, stride: int, groups: int,
             t_in: int, padding: int, dilation: int = 1) -> bool:
    """Shapes the kernel supports with sane MXU utilization."""
    if cin % groups or cout % groups:
        return False
    cg, cog = cin // groups, cout // groups
    t_out = (t_in + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    if cg < 8 or cog < 8 or t_out < 8:
        return False
    if groups == 1:
        if cout > LANE and cout % LANE:
            return False
        sin = stride * cin
        if sin > LANE and sin % LANE:       # dx out-tile lanes
            return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _pallas_conv_transpose(x, w, b, stride, padding, slope, precision,
                           interpret):
    return _convt_fwd_impl(x, w, b, stride, padding, slope, precision,
                           interpret)


def _convt_fwd_impl(x, w, b, stride, padding, slope, precision, interpret):
    n, t_in, cin = x.shape
    cin_w, cout, k = w.shape
    t_out = (t_in - 1) * stride + k - 2 * padding
    out = _dx_impl(x, w, stride, padding, 1, 1, t_out, precision, interpret)
    if b is not None:
        out = out + b[None, None, :]
    if slope is not None:
        out = jnp.where(out > 0, out, slope * out)
    return out


def _pct_fwd(x, w, b, stride, padding, slope, precision, interpret):
    out = _convt_fwd_impl(x, w, b, stride, padding, slope, precision,
                          interpret)
    return out, (x, w, out if slope is not None else None)


def _pct_bwd(stride, padding, slope, precision, interpret, res, g):
    x, w, out = res
    if slope is not None:
        g = g * jnp.where(out > 0, 1.0, slope)
    db = jnp.sum(g, axis=(0, 1))
    # grad wrt x: the plain strided conv of g with the same weight view
    dx = _fwd_impl(g, w, None, stride, padding, 1, 1, None, precision,
                   interpret)
    # grad wrt w: the conv weight-gradient with (input, cotangent) swapped
    dw = _dw_impl(g, x, w.shape, stride, padding, 1, 1, precision, interpret)
    return dx, dw, db


_pallas_conv_transpose.defvjp(_pct_fwd, _pct_bwd)


def convt_eligible(cin: int, cout: int, k: int, stride: int,
                   t_in: int, padding: int) -> bool:
    """ConvTranspose1d shapes the kernel path supports (the fwd is the
    strided-conv dx program; its plan must exist and stay lane-legal)."""
    if cin < 8 or cout < 8 or t_in < 8:
        return False
    if _plan_dx(cout, cin, k, stride, 1, padding) is None:
        return False
    # the bwd passes run the fwd/dw programs of the hypothetical conv
    # cout<-cin; their plans always exist when the dims are >= 8
    return True


def conv_transpose1d_ntc(x: jnp.ndarray, w: jnp.ndarray,
                         b: Optional[jnp.ndarray] = None, *, stride: int = 1,
                         padding: int = 0,
                         slope: Optional[float] = None,
                         precision: str = 'default',
                         backend: str = 'auto',
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """ConvTranspose1d on (N, T, C) with optional fused bias + leaky_relu.

    ``w`` is (C_in, C_out, K) — the torch ConvTranspose1d layout shared with
    :class:`models.vocoders.hifi_gan.WNConvTranspose1d`. T_out =
    (T_in-1)*stride + K - 2*padding. A transposed conv IS the input-gradient
    of the mirror strided conv, so the fwd here runs `_dx_impl`'s
    output-folded program (per output phase r, taps at m ≡ (r+pad) mod s),
    and the VJP reuses `_fwd_impl` (dx) and `_dw_impl` (dw) with the roles
    of input and cotangent swapped.

    ``backend='auto'`` routes to XLA by default: the generator-level A/B
    (gen_r5.log, 2026-08-20) measured the XLA path faster for the training
    fwd+bwd at every tested mix; PSTPU_GC_DENSE_PALLAS=1 restores the
    kernel routing, and backend='pallas' forces it per call.
    """
    if interpret is None:
        interpret = False
        use_kernel = (jax.default_backend() == 'tpu'
                      and (backend == 'pallas' or
                           _os.environ.get('PSTPU_GC_DENSE_PALLAS') == '1'))
    else:
        use_kernel = True
    if backend == 'xla':
        use_kernel = False
    n, t_in, cin = x.shape
    cin_w, cout, k = w.shape
    if use_kernel and convt_eligible(cin, cout, k, stride, t_in, padding):
        return _pallas_conv_transpose(x, w, b, stride, padding, slope,
                                      precision, interpret)
    # XLA fallback: lhs-dilated conv == transposed conv
    out = jax.lax.conv_general_dilated(
        x, jnp.flip(w, axis=2).transpose(2, 0, 1),   # (K, C_in, C_out) HIO
        window_strides=(1,), padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=('NHC', 'HIO', 'NHC'),
        precision=(jax.lax.Precision.HIGHEST if precision == 'highest'
                   else jax.lax.Precision.DEFAULT),
        # bf16 in -> bf16 out, same contract (and same AD-transpose dtype
        # constraint) as the grouped_conv1d_ntc fallback below
        preferred_element_type=(x.dtype if x.dtype == jnp.bfloat16
                                else jnp.float32))
    if b is not None:
        out = out + b[None, None, :]
    if slope is not None:
        out = jnp.where(out > 0, out, slope * out)
    return out


def grouped_conv1d_ntc(x: jnp.ndarray, w: jnp.ndarray,
                       b: Optional[jnp.ndarray] = None, *, stride: int = 1,
                       padding: int = 0, groups: int = 1, dilation: int = 1,
                       slope: Optional[float] = None,
                       precision: str = 'default',
                       backend: str = 'auto',
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Grouped conv1d on (N, T, C) with optional fused bias + leaky_relu.

    Dispatches to the Pallas kernel when the geometry is eligible AND the
    backend is TPU; everything else (ineligible shapes, CPU/GPU) falls back
    to XLA's conv. Pass ``interpret=True`` to force the kernel through the
    Pallas interpreter (parity tests on CPU). ``w`` is (C_out, C_in/groups,
    K) — the torch layout shared with
    :class:`models.vocoders.hifi_gan.WNConv1d`.

    ``backend``:
      'auto'      — the measured-fastest path per geometry on v5e
                    (benchmarks/probes/results/SUMMARY.json, 2026-08-19):
                    dense layers (groups == 1) ride the Pallas kernel when
                    eligible; grouped layers go to XLA — as a DENSE conv
                    with block-diagonal zero-expanded weights when the
                    per-group reduction is narrow (cin/groups <= 32: 2.6x
                    at the MSD's L1, 1.5x at L2 fwd+dx+dw; at the cg==32
                    L1/L3 the full GAN step measures dense 13.83 vs native
                    9.99 steps/s) and as XLA's native grouped conv from
                    cin/groups == 64 up (L4 4x, L5 7x over dense).
      'xla'       — XLA's grouped NTC conv.
      'xla_dense' — the zero-expanded dense formulation (executes
                    ``groups``x the true MACs at full 128-lane MXU fill).
      'pallas'    — the Pallas kernel for eligible shapes (requires TPU or
                    ``interpret=True``).
    """
    n, t_in, cin = x.shape
    cout, cg, k = w.shape
    expand = backend == 'xla_dense'
    if interpret is None:
        interpret = False
        use_kernel = jax.default_backend() == 'tpu'
        if backend == 'auto' and groups == 1:
            # measured decision (gen_r5.log, 2026-08-20): for the TRAINING
            # path XLA's dense NTC conv beats the Pallas kernel on the v2
            # generator's geometries — fwd 3.40 vs 5.88 ms, fwd+bwd 15.26
            # vs 21.70 ms at B=16 x T=8192 (XLA fuses leaky_relu/residual
            # chains across layer edges; the custom calls block that). The
            # kernel stays reachable via backend='pallas' (the fused
            # inference stages in ops/pallas/gen_stage.py are a separate,
            # still-measured-faster path). PSTPU_GC_DENSE_PALLAS=1 restores
            # the kernel routing for A/B sessions.
            use_kernel = (use_kernel and
                          _os.environ.get('PSTPU_GC_DENSE_PALLAS') == '1')
        if backend == 'auto' and groups > 1:
            # measured decision table (kvar + dense probes, 2026-08-19):
            # the kernel loses on every grouped MSD geometry; XLA's grouped
            # lowering collapses when the per-group reduction is narrow, so
            # dense expansion wins at cin/groups <= 32 and native grouped
            # from cg == 64 up (L4 4x, L5 7x fwd+dx+dw). The cg == 32
            # boundary sits with DENSE: a fwd-only layer table once put
            # native grouped 10% ahead there (0.88 vs 0.97 ms), but the
            # full training step regressed 13.83 -> 9.99 steps/s with
            # native at cg == 32 (grouped-conv BACKWARD collapses; A/B in
            # benchmarks/probes/results/gan_r5.log, 2026-08-19).
            # PSTPU_GC_DENSE_CG_MAX: A/B override — dense expansion is used
            # for cg < this bound (32 restores the fwd-table routing).
            use_kernel = False
            expand = cg < int(_os.environ.get('PSTPU_GC_DENSE_CG_MAX', '33'))
    else:
        use_kernel = True   # explicit interpret runs always take the kernel
    if backend in ('xla', 'xla_dense', 'fold'):
        use_kernel = False
    if use_kernel and eligible(cin, cout, k, stride, groups, t_in, padding,
                               dilation):
        return _pallas_grouped_conv(x, w, b, stride, padding, groups,
                                    dilation, slope, precision, interpret)
    # time-folded reformulation for narrow same-length dense convs (the
    # generator ResBlock regime): f consecutive timesteps folded into
    # channels so the conv runs at 128 MXU lanes (ops/fold_conv.py).
    # Measured (2026-08-20): generator fwd+bwd 8.72 ms folded vs 15.26 XLA
    # vs 21.70 Pallas (gen_r5.log); full adversarial step 16.85 vs 15.78 vs
    # 13.83 steps/s (ganstep_r5b.log) — so 'auto' takes it on TPU.
    # backend='fold' forces it anywhere; PSTPU_GC_FOLD=0 restores plain-XLA
    # routing for A/B sessions.
    if (backend == 'fold'
            or (backend == 'auto' and jax.default_backend() == 'tpu'
                and _os.environ.get('PSTPU_GC_FOLD', '1') == '1')):
        from pytorch_sound_tpu.ops.fold_conv import (fold_conv1d_ntc,
                                                     fold_eligible)
        f = fold_eligible(cin, cout, stride, groups, t_in, k, dilation,
                          padding)
        if f:
            return fold_conv1d_ntc(x, w, b, dilation=dilation,
                                   padding=padding, fold=f, slope=slope,
                                   precision=precision)
    # XLA fallback (NTC conv)
    if expand and groups > 1:
        # block-diagonal dense expansion: einsum against eye keeps the
        # parameter layout (C_out, C_in/g, K) and gives exact dw through AD
        cog = cout // groups
        eye = jnp.eye(groups, dtype=w.dtype)
        w_dense = jnp.einsum('gock,gh->gohck',
                             w.reshape(groups, cog, cg, k), eye)
        w = w_dense.reshape(cout, groups * cg, k)
        groups = 1
    out = jax.lax.conv_general_dilated(
        x, w.transpose(2, 1, 0), window_strides=(stride,),
        padding=[(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=('NHC', 'HIO', 'NHC'),
        feature_group_count=groups,
        precision=(jax.lax.Precision.HIGHEST if precision == 'highest'
                   else jax.lax.Precision.DEFAULT),
        # bf16 in -> bf16 out (the MXU accumulator is f32 either way; an
        # f32 output would make the grad-transpose cotangent f32 against
        # bf16 operands, which lax.conv rejects)
        preferred_element_type=(x.dtype if x.dtype == jnp.bfloat16
                                else jnp.float32))
    if b is not None:
        out = out + b[None, None, :]
    if slope is not None:
        out = jnp.where(out > 0, out, slope * out)
    return out
