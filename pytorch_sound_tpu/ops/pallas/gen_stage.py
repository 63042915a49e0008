"""Fully-fused HiFi-GAN upsample-stage Pallas kernel (inference).

Round-1's resblock kernel (:mod:`.resblock`) still round-tripped HBM at every
stage boundary: XLA ran [leaky_relu -> conv_transpose -> repack] between
kernels, and profiling showed those elementwise/relayout passes dominating.
This kernel computes an ENTIRE generator stage in one VMEM-resident program:

    leaky_relu(0.1) -> ConvTranspose1d(C_in -> C_out, stride u) -> 3 ResBlocks
    [-> leaky_relu(0.01) -> conv_post(k=7) -> tanh   on the last stage]

per (batch-group, output-time-tile). Techniques:

- the transpose conv is decomposed into its ``u`` polyphase regular convs
  (output o = i*u - pad + j  =>  per phase r, y_r[q] = sum_m x[q-m] W[r+m*u]),
  each an MXU matmul on the input tile; phases interleave to the upsampled
  tile with one sublane reshape — no dilated scatter, no HBM round trip;
- the input (C_in = 2*C_out) arrives as TWO lane planes of C_out channels,
  both packed with the OUTPUT stage's batch-packing factor P = 128 // C_out,
  multiplied against block-diagonal kron(I_P, W_half) taps; wide stages
  (C_out = 256, HiFi-GAN v1 stage 0) run unpacked with planes spanning
  C_out/128 lane tiles and full (C_out, C_out) taps — Mosaic tiles the
  wider matmuls over the MXU;
- resblocks run exactly as in :mod:`.resblock` (halo'd tiles, shifted-roll
  matmul taps, per-layer sequence-edge masking);
- the final stage folds conv_post + tanh: 7 more taps whose (128, 128)
  matrices are kron(I_P, outer(w_j, e_0)), writing each item's waveform into
  its lane p*C_out.

Matches ``Generator.__call__`` numerics at f32-HIGHEST (parity tests vs flax
on the real checkpoint). Reference being re-engineered:
`/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:122-138`.
"""

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_sound_tpu.ops.pallas.resblock import (HALO, LANE, TILE_T,
                                                   _round_up,
                                                   pack_stage_weights)


def _const_spec(arr) -> pl.BlockSpec:
    """Whole-array VMEM block, rank-agnostic (f32 or hi/lo-stacked weights)."""
    return pl.BlockSpec(arr.shape, lambda b, i, _n=arr.ndim: (0,) * _n)


def _pack_plane(x: jnp.ndarray, pack: int, width: int = LANE) -> jnp.ndarray:
    """(N, C, T) -> (N // pack, T, width): lane = p * C + c, zero lane padding."""
    n, c, t = x.shape
    out = x.reshape(n // pack, pack, c, t).transpose(0, 3, 1, 2) \
           .reshape(n // pack, t, pack * c)
    return jnp.pad(out, [(0, 0), (0, 0), (0, width - pack * c)])


def _pad_tap(w: jnp.ndarray, width: int = LANE) -> jnp.ndarray:
    """Zero-pad a (pack*C, pack*C) block-diagonal tap to (width, width)."""
    return jnp.pad(w, [(0, width - w.shape[0]), (0, width - w.shape[1])])


def best_pack(batch: int, c_out: int) -> int:
    """Largest batch-packing factor: divides ``batch``, pack*c_out <= 128."""
    pack = min(LANE // c_out, batch)
    while batch % pack:
        pack -= 1
    return pack


def _pack_up_weights(weight: jnp.ndarray, bias: jnp.ndarray, c_out: int,
                     u: int, pack: int, width: int = LANE):
    """ConvTranspose1d weight (C_in, C_out, k) -> polyphase block-diag taps.

    Returns (taps_lo, taps_hi) each (u * M, width, width) with
    taps[r * M + m] = kron(I_P, W_half[:, :, r + m*u]) (zero for j >= k),
    and the packed bias (width,).
    """
    c_in, c_out_w, k = weight.shape
    assert c_out_w == c_out and c_in == 2 * c_out
    m_taps = -(-k // u)
    eye = jnp.eye(pack, dtype=jnp.float32)
    lo, hi = [], []
    zero = jnp.zeros((width, width), jnp.float32)
    for r in range(u):
        for m in range(m_taps):
            j = r + m * u
            if j < k:
                lo.append(_pad_tap(jnp.kron(eye, weight[:c_out, :, j]), width))
                hi.append(_pad_tap(jnp.kron(eye, weight[c_out:, :, j]), width))
            else:
                lo.append(zero)
                hi.append(zero)
    bias_p = jnp.tile(jnp.asarray(bias), pack)
    bias_p = jnp.pad(bias_p, (0, width - bias_p.shape[0]))
    return jnp.stack(lo), jnp.stack(hi), bias_p


def _pack_post_weights(weight: jnp.ndarray, bias: jnp.ndarray, c: int,
                       pack: int, width: int = LANE):
    """conv_post weight (1, C, k) -> k taps of kron(I_P, outer(w_j, e0)):
    out[row, p*C] = sum_c in[row, p*C + c] * w[c, j]."""
    _, c_w, k = weight.shape
    assert c_w == c
    e0 = np.zeros((1, c), np.float32)
    e0[0, 0] = 1.0
    eye = jnp.eye(pack, dtype=jnp.float32)
    taps = [_pad_tap(jnp.kron(eye, weight[0, :, j][:, None] * jnp.asarray(e0)),
                     width)
            for j in range(k)]
    b_vec = np.zeros((width,), np.float32)
    b_vec[np.arange(pack) * c] = 1.0
    return jnp.stack(taps), jnp.asarray(b_vec) * bias[0]


def _split_bf16(h):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= h to ~16 mantissa bits."""
    hi = h.astype(jnp.bfloat16)
    lo = (h - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dot(precision):
    """Returns dot(h, w_ref, idx): full-precision or 3-pass bf16 contraction.

    'bf16x3' computes h_hi@w_hi + h_lo@w_hi + h_hi@w_lo on single-pass bf16
    MXU ops (w_ref then holds a (2, n, 128, 128) bf16 hi/lo stack) — half the
    MXU passes of f32-HIGHEST at ~1.5e-5 relative error (the dropped lo@lo
    term); 'highest'/'default' use a plain f32 dot at that XLA precision.
    """
    if precision == 'bf16x3':
        def dot(h, w_ref, idx):
            # split after any rolls: Mosaic can't rotate bf16 vectors
            h_hi, h_lo = _split_bf16(h)
            kw = dict(preferred_element_type=jnp.float32)
            w_hi = w_ref[0, idx]
            return (jnp.dot(h_hi, w_hi, **kw)
                    + jnp.dot(h_lo, w_hi, **kw)
                    + jnp.dot(h_hi, w_ref[1, idx], **kw))
        return dot

    prec = {'highest': jax.lax.Precision.HIGHEST,
            'default': jax.lax.Precision.DEFAULT}[precision]

    def dot(h, w_ref, idx):
        return jnp.dot(h, w_ref[idx], preferred_element_type=jnp.float32,
                       precision=prec)
    return dot


def _roll(h, shift):
    return pltpu.roll(h, shift, 0) if shift else h


PRE_HALO = 8        # mel-scratch halo rows for the folded conv_pre (k <= 17)


def _stage_kernel(xlo_ref, xhi_ref, up_lo_ref, up_hi_ref, up_bias_ref,
                  taps_ref, bias_ref, post_taps_ref, post_bias_ref,
                  pre_lo_ref, pre_hi_ref, pre_bias_ref, out_ref,
                  lo_scr, hi_scr, lo_sem, hi_sem,
                  *, tap_meta, plan, u: int, m_taps: int, pad: int,
                  t_in: int, t_out: int, tile_rows: int, halo_in: int,
                  rows_in: int, n_blocks: int, post_k: int, precision,
                  width: int = LANE, pre_k: int = 0):
    bgrp = pl.program_id(0)
    tile = pl.program_id(1)
    rows_out = tile_rows + 2 * HALO

    in_tile = tile_rows // u
    start_row = pl.multiple_of(tile * in_tile, 8)

    def lrelu(v, slope=0.1):
        return jnp.where(v > 0, v, slope * v)

    dot = _make_dot(precision)

    # q (pre-upsample sample index) of each x row; planes were front-padded
    # by (HALO//u + halo_in) zeros (+ PRE_HALO more for the folded conv_pre)
    q = jax.lax.broadcasted_iota(jnp.int32, (rows_in, width), 0) \
        + tile * in_tile - HALO // u - halo_in
    valid_in = ((q >= 0) & (q < t_in)).astype(jnp.float32)

    if pre_k:
        # folded conv_pre: DMA the single mel plane (with PRE_HALO extra rows
        # on both sides) and produce the two c_in half-planes in VMEM:
        # x_half[r] = sum_j mel[r + j - k//2] @ W_pre_half[j] + b_half.
        # Rolls are <= k//2 < PRE_HALO, so wraparound rows never reach the
        # consumed center; mel rows outside [0, t_in) are zero in the plane
        # (exact conv zero-pad parity) and x edge rows are re-masked below.
        dma = pltpu.make_async_copy(
            xlo_ref.at[bgrp, pl.ds(start_row, rows_in + 2 * PRE_HALO), :],
            lo_scr, lo_sem)
        dma.start()
        dma.wait()
        mel = lo_scr[...]
        half = (pre_k - 1) // 2
        xlo = jnp.zeros((rows_in, width), jnp.float32)
        xhi = jnp.zeros((rows_in, width), jnp.float32)
        for j in range(pre_k):
            shift = j - half
            rows_mel = rows_in + 2 * PRE_HALO
            # sh[r] = mel[r + PRE_HALO + shift] (see _roll: y[r] = h[r - a])
            sh = _roll(mel, (-(PRE_HALO + shift)) % rows_mel)[:rows_in]
            xlo = xlo + dot(sh, pre_lo_ref, j)
            xhi = xhi + dot(sh, pre_hi_ref, j)
        xlo = lrelu(xlo + pre_bias_ref[0][None, :]) * valid_in
        xhi = lrelu(xhi + pre_bias_ref[1][None, :]) * valid_in
    else:
        dma_lo = pltpu.make_async_copy(
            xlo_ref.at[bgrp, pl.ds(start_row, rows_in), :], lo_scr, lo_sem)
        dma_hi = pltpu.make_async_copy(
            xhi_ref.at[bgrp, pl.ds(start_row, rows_in), :], hi_scr, hi_sem)
        dma_lo.start()
        dma_hi.start()
        dma_lo.wait()
        dma_hi.wait()
        xlo = lrelu(lo_scr[...]) * valid_in
        xhi = lrelu(hi_scr[...]) * valid_in

    # polyphase transpose conv: y_r[q] = sum_m x[q-m] @ W[r + m*u]
    zeros = jnp.zeros((rows_in, width), jnp.float32)
    phases = []
    for r in range(u):
        y = zeros
        for m in range(m_taps):
            sl = _roll(xlo, m)
            sh = _roll(xhi, m)
            y = y + dot(sl, up_lo_ref, r * m_taps + m) \
                  + dot(sh, up_hi_ref, r * m_taps + m)
        phases.append(y + up_bias_ref[...][0][None, :])
    # interleave: Z[a*u + r] = y_r[a]  <=>  z = (q_start + a)*u + r
    z = jnp.stack(phases, axis=1).reshape(rows_in * u, width)
    offset = u * halo_in + pad          # static: first needed z row
    x = pltpu.roll(z, (-offset) % (rows_in * u), 0)[:rows_out]

    pos = jax.lax.broadcasted_iota(jnp.int32, (rows_out, width), 0) \
        + tile * tile_rows - HALO
    valid = ((pos >= 0) & (pos < t_out)).astype(jnp.float32)
    x = x * valid

    def conv(h, ci):
        start, k, d = tap_meta[ci]
        half = (k - 1) // 2
        y = jnp.zeros((rows_out, width), jnp.float32)
        for j in range(k):
            shift = (j - half) * d
            shifted = _roll(h, (-shift) % rows_out if shift else 0)
            y = y + dot(shifted, taps_ref, start + j)
        return (y + bias_ref[ci][None, :]) * valid

    acc = jnp.zeros_like(x)
    ci = 0
    for b in range(n_blocks):
        xb = x
        n_rounds = sum(1 for (bb, _, _) in plan if bb == b) // 2
        for _ in range(n_rounds):
            xt = conv(lrelu(xb), ci)
            ci += 1
            xt = conv(lrelu(xt), ci)
            ci += 1
            xb = xb + xt
        acc = acc + xb
    res = acc / n_blocks

    if post_k:                        # fold conv_post + tanh on the last stage
        h = lrelu(res, 0.01)
        half = (post_k - 1) // 2
        y = jnp.zeros((rows_out, width), jnp.float32)
        for j in range(post_k):
            shift = j - half
            shifted = _roll(h, (-shift) % rows_out if shift else 0)
            y = y + dot(shifted, post_taps_ref, j)
        res = jnp.tanh((y + post_bias_ref[...][0][None, :]) * valid)

    out_ref[0] = res[HALO:HALO + tile_rows]


def fused_generator_stage(x: jnp.ndarray, up_params: dict, stage: dict,
                          c_out: int, u: int, k_up: int,
                          kernel_sizes: Sequence[int] = (3, 7, 11),
                          dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3,
                          conv_post: Optional[dict] = None,
                          conv_pre: Optional[dict] = None,
                          tile_t: int = TILE_T, precision: str = 'highest',
                          interpret: bool = None) -> jnp.ndarray:
    """One full generator stage: x (N, 2*C_out, T) -> (N, C_out, u*T), or
    (N, 1, u*T) waveform when ``conv_post`` params are given (last stage).

    ``up_params``: {'weight' (C_in, C_out, k_up), 'bias'} of the stage's
    ConvTranspose1d; ``stage``: the three resblock param trees.
    ``conv_pre``: optional generator conv_pre params — folds the mel-frontend
    conv into stage 0: ``x`` is then the raw mel (N, C_mel, T) with
    C_mel <= 128, and the C_in half-planes are produced inside the kernel
    (wide/unpacked stages only, i.e. C_out > 128 — HiFi-GAN v1's stage 0).
    ``precision``: 'highest' (6-pass f32, exact flax parity), 'bf16x3'
    (3-pass hi/lo bf16 split, ~2x faster matmuls; cascaded over all four
    stages of the v2 generator this measures ~35 dB SNR vs f32 — mean 3e-4,
    max ~4e-2 waveform delta — a fast preview mode, not a parity mode),
    or 'default' (single bf16 pass, fastest).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, c_in, t_in = x.shape
    if conv_pre is not None:
        assert c_out > LANE and c_in <= LANE, \
            'conv_pre folding: wide stage only, mel channels <= 128'
        c_mel, c_in = c_in, 2 * c_out
    assert c_in == 2 * c_out and (c_out <= LANE or c_out % LANE == 0)
    if c_out > LANE:
        # wide stage (HiFi-GAN v1's 256-ch stage 0): no batch packing; the
        # channel plane spans c_out // 128 lane tiles and every tap matrix is
        # (c_out, c_out) — Mosaic tiles the wider matmuls onto the MXU
        pack, width = 1, c_out
        # wide tiles hold (tile + 2*HALO, width) f32 intermediates; cap the
        # tile so ~8 live values + the 2-plane scratch + the ~75 MB of
        # resident f32 taps fit the chip: 2048 measured 130.1 MB total on
        # v5e (128 MB VMEM), 1024 leaves headroom
        tile_t = min(tile_t, 1024)
    else:
        pack, width = best_pack(n, c_out), LANE
    pad = (k_up - u) // 2
    assert 0 <= pad < u and HALO % u == 0, 'unsupported upsample geometry'
    t_out = t_in * u
    m_taps = -(-k_up // u)

    # output tile must tile t_out with u*8-aligned input offsets
    tile_t = min(tile_t, _round_up(t_out, 8 * u))
    t_pad = _round_up(t_out, tile_t)

    up_lo, up_hi, up_bias = _pack_up_weights(
        jnp.asarray(up_params['weight']), jnp.asarray(up_params['bias']),
        c_out, u, pack, width)
    taps, bias_arr, tap_meta, plan = pack_stage_weights(
        stage, c_out, kernel_sizes, dilations, pack=pack, width=width)
    if conv_post is not None:
        post_taps, post_bias = _pack_post_weights(
            jnp.asarray(conv_post['weight']), jnp.asarray(conv_post['bias']),
            c_out, pack, width)
        post_k = post_taps.shape[0]
    else:   # dummy minimal constants (Mosaic needs real refs)
        post_taps = jnp.zeros((1, width, width), jnp.float32)
        post_bias = jnp.zeros((width,), jnp.float32)
        post_k = 0

    # the input tile must cover the OUTPUT tile incl. both out-halos plus the
    # polyphase back-taps: a_max - a_min needs (2*HALO + pad)/u + M extra rows
    # beyond tile_t/u, split as HALO/u (front, via the plane padding) and
    # halo_in (per side); under-covering corrupts interior tile boundaries
    halo_in = _round_up((2 * HALO + pad) // u + m_taps + 2, 8)
    rows_in = tile_t // u + 2 * halo_in

    if conv_pre is not None:
        # mel-frontend taps: W_pre (C_in, C_mel, k) torch layout; tap j is
        # W_pre[:, :, j].T split into the two C_in half-planes' columns
        w_pre = jnp.asarray(conv_pre['weight'])
        b_pre = jnp.asarray(conv_pre['bias'])
        pre_k = w_pre.shape[2]
        assert (pre_k - 1) // 2 < PRE_HALO, 'conv_pre kernel too long'
        mel_w = LANE
        pre_lo = jnp.stack([
            jnp.pad(w_pre[:c_out, :, j].T, [(0, mel_w - c_mel), (0, 0)])
            for j in range(pre_k)])
        pre_hi = jnp.stack([
            jnp.pad(w_pre[c_out:, :, j].T, [(0, mel_w - c_mel), (0, 0)])
            for j in range(pre_k)])
        pre_bias = jnp.stack([b_pre[:c_out], b_pre[c_out:]])
    else:   # dummy minimal constants
        pre_k = 0
        pre_lo = jnp.zeros((1, LANE, LANE), jnp.float32)
        pre_hi = jnp.zeros((1, LANE, LANE), jnp.float32)
        pre_bias = jnp.zeros((2, width), jnp.float32)

    if precision == 'bf16x3':   # hi/lo bf16 stacks for the 3-pass contraction
        def prep(w):
            hi = w.astype(jnp.bfloat16)
            lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.stack([hi, lo])
        up_lo, up_hi = prep(up_lo), prep(up_hi)
        taps, post_taps = prep(taps), prep(post_taps)
        pre_lo, pre_hi = prep(pre_lo), prep(pre_hi)

    # channel planes, front-padded so row 0 is q = -(HALO//u + halo_in)
    # (folded-conv_pre mode: ONE mel plane with PRE_HALO extra rows per side)
    front = HALO // u + halo_in
    back = t_pad // u + rows_in          # generous; reads past end are zeros
    if conv_pre is not None:
        xlo = _pack_plane(x, 1, LANE)
        xlo = jnp.pad(xlo, [(0, 0), (front + PRE_HALO,
                                     back - t_in + PRE_HALO), (0, 0)])
        xhi = jnp.zeros((n, 8, LANE), jnp.float32)       # unused dummy
        scratch_lo = pltpu.VMEM((rows_in + 2 * PRE_HALO, LANE), jnp.float32)
        scratch_hi = pltpu.VMEM((8, LANE), jnp.float32)  # unused dummy
    else:
        xlo = _pack_plane(x[:, :c_out, :], pack, width)
        xhi = _pack_plane(x[:, c_out:, :], pack, width)
        xlo = jnp.pad(xlo, [(0, 0), (front, back - t_in), (0, 0)])
        xhi = jnp.pad(xhi, [(0, 0), (front, back - t_in), (0, 0)])
        scratch_lo = pltpu.VMEM((rows_in, width), jnp.float32)
        scratch_hi = pltpu.VMEM((rows_in, width), jnp.float32)

    kernel = functools.partial(
        _stage_kernel, tap_meta=tap_meta, plan=plan, u=u, m_taps=m_taps,
        pad=pad, t_in=t_in, t_out=t_out, tile_rows=tile_t, halo_in=halo_in,
        rows_in=rows_in, n_blocks=len(kernel_sizes), post_k=post_k,
        precision=precision, width=width, pre_k=pre_k)

    out = pl.pallas_call(
        kernel,
        grid=(n // pack, t_pad // tile_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # xlo stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),        # xhi stays in HBM
            _const_spec(up_lo),
            _const_spec(up_hi),
            pl.BlockSpec((1, width), lambda b, i: (0, 0)),
            _const_spec(taps),
            pl.BlockSpec(bias_arr.shape, lambda b, i: (0, 0)),
            _const_spec(post_taps),
            pl.BlockSpec((1, width), lambda b, i: (0, 0)),
            _const_spec(pre_lo),
            _const_spec(pre_hi),
            pl.BlockSpec(pre_bias.shape, lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_t, width), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // pack, t_pad, width), jnp.float32),
        scratch_shapes=[
            scratch_lo,
            scratch_hi,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # v1's 256-wide stage keeps ~75 MB of f32 weight taps VMEM-
            # resident; 100 MB left it 20 MB short on the real chip (v5e has
            # 128 MB VMEM) and 127 MB overshot the chip by 2.1 MB at
            # tile 2048 — 124 MB cap + tile 1024 fits
            vmem_limit_bytes=124 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(xlo, xhi, up_lo, up_hi, up_bias[None, :], taps, bias_arr,
      post_taps, post_bias[None, :], pre_lo, pre_hi, pre_bias)

    out = out[:, :t_out, :]
    if conv_post is not None:   # waveform lives at lane p*c_out of each group
        wav = out[:, :, ::c_out][:, :, :pack]        # (N/pack, T, pack)
        return wav.transpose(0, 2, 1).reshape(n, 1, t_out)
    return out[:, :, :pack * c_out].reshape(n // pack, t_out, pack, c_out) \
              .transpose(0, 2, 3, 1).reshape(n, c_out, t_out)


def stage_eligible(c_out: int, batch: int, u: int, k_up: int) -> bool:
    """Polyphase geometry constraints for the fused stage (any batch size —
    the packing factor adapts, padding unused lanes). Wide stages (c_out a
    multiple of 128, up to 256) run unpacked with multi-lane-tile planes;
    at 512 the (c, c) resblock tap stack alone is ~132 MB — past VMEM."""
    pad = (k_up - u) // 2
    return ((c_out <= LANE or (c_out % LANE == 0 and c_out <= 256))
            and 0 <= pad < u and HALO % u == 0)
