"""Fused HiFi-GAN resblock-stage Pallas kernel (inference).

Motivation (profiled): XLA executes each upsample stage's 3 ResBlocks as ~18
convs + ~36 elementwise passes, and on this build the elementwise fusions
dominate decode time (~8 GB/s effective). This kernel computes an ENTIRE
stage — xs = (B1(x) + B2(x) + B3(x)) / 3 with ResBlock1 semantics — in one
VMEM-resident program per (batch-group, time-tile):

- convs become k shifted-sublane-roll matmuls against stacked (128, 128)
  weights; time tiles carry a halo >= the stage's one-sided receptive field
  (60 samples for kernels (3,7,11) x dilations (1,3,5)), so tile centers are
  exact under halo recompute;
- sequence edges are re-masked after every conv, reproducing per-layer zero
  padding exactly;
- small channel counts are **lane-packed**: P = 128 // C batch items share the
  lane dimension against block-diagonal weights, keeping the MXU utilized at
  C = 8..64 (HiFi-GAN v2's stages) instead of wasting up to 16x on channel
  padding.

Each stage touches HBM once in and once out (vs ~14 round trips), at the cost
of halo recompute. Inference-only (no custom VJP); the flax path remains the
training/reference implementation.
"""

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
HALO = 64          # >= total one-sided receptive field (60 for k<=11, d<=5)
TILE_T = 4096


def _round_up(x, m):
    return (x + m - 1) // m * m


def stage_plan(kernel_sizes: Sequence[int],
               dilations: Sequence[Sequence[int]]) -> List[Tuple[int, int, int]]:
    """Static conv schedule: one entry per conv = (block, kernel, dilation).
    ResBlock1: per block, rounds over dilations with a (k, d) conv then (k, 1)."""
    plan = []
    for b, (k, ds) in enumerate(zip(kernel_sizes, dilations)):
        for d in ds:
            plan.append((b, k, d))
            plan.append((b, k, 1))
    return plan


def pack_stage_weights(params: dict, channels: int,
                       kernel_sizes: Sequence[int] = (3, 7, 11),
                       dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3,
                       pack: int = None, width: int = LANE):
    """Marshal a stage's ResBlock1 param trees into kernel constants.

    :param params: dict with 'resblocks_{i}' entries for this stage's blocks
        (folded weights: each conv has 'weight' (C, C, k) torch-layout + 'bias')
    :param pack: batch-packing factor (default the full 128 // channels);
        smaller packs zero-pad the unused lanes
    :param width: lane width of the kernel's channel plane — 128 for
        lane-packed small stages, a multiple of 128 (= channels rounded up)
        for wide stages (HiFi-GAN v1's 256-channel stage 0)
    :returns: (taps (n_taps, width, width) block-diagonal weights,
               biases (n_convs_pad, width), tap metadata, plan)
    """
    pack = pack or max(1, LANE // channels)
    plan = stage_plan(kernel_sizes, dilations)
    eye = jnp.eye(pack, dtype=jnp.float32)

    def pad_tap(w):
        return jnp.pad(w, [(0, width - w.shape[0]), (0, width - w.shape[1])])

    tap_ws, biases, tap_meta = [], [], []
    tap_idx = 0
    for ci, (b, k, d) in enumerate(plan):
        conv_in_block = ci - sum(2 * len(dilations[j]) for j in range(b))
        r, which = divmod(conv_in_block, 2)
        name = ('convs1_%d' if which == 0 else 'convs2_%d') % r
        conv = params['resblocks_%d' % b][name]
        w = jnp.asarray(conv['weight'])          # (C_out, C_in, k)
        bias = jnp.asarray(conv['bias'])
        start = tap_idx
        for j in range(k):
            # block-diagonal lane packing, trace-compatible (params may be
            # traced jit arguments): kron(I_P, W_j^T)
            tap_ws.append(pad_tap(jnp.kron(eye, w[:, :, j].T)))
            tap_idx += 1
        b_packed = jnp.tile(bias, pack)
        biases.append(jnp.pad(b_packed, (0, width - b_packed.shape[0])))
        tap_meta.append((start, k, d))
    taps = jnp.stack(tap_ws)                                 # (n_taps, width, width)
    n_convs_pad = _round_up(len(biases), 8)
    bias_arr = jnp.zeros((n_convs_pad, width), jnp.float32)
    bias_arr = bias_arr.at[:len(biases)].set(jnp.stack(biases))
    return taps, bias_arr, tuple(tap_meta), tuple(plan)


def _stage_kernel(x_ref, taps_ref, bias_ref, out_ref, scratch, sem,
                  *, tap_meta, plan, t_true: int, tile_rows: int,
                  n_blocks: int, precision):
    """Per block: x_b = x; per round: xt = conv2(lrelu(conv1(lrelu(x_b))));
    x_b += xt. Stage output = mean_b(x_b) over the tile's center rows."""
    bgrp = pl.program_id(0)
    tile = pl.program_id(1)
    rows = tile_rows + 2 * HALO

    # halo'd tile DMA from the (B, T_padded, 128) HBM ref; offsets 8-aligned
    start_row = pl.multiple_of(tile * tile_rows, 8)
    dma = pltpu.make_async_copy(
        x_ref.at[bgrp, pl.ds(start_row, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[...]

    # global sample position of each row (input was front-padded by HALO)
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) \
        + tile * tile_rows - HALO
    valid = ((pos >= 0) & (pos < t_true)).astype(jnp.float32)

    def conv(h, ci):
        start, k, d = tap_meta[ci]
        half = (k - 1) // 2
        y = jnp.zeros_like(h)
        for j in range(k):
            shift = (j - half) * d
            shifted = pltpu.roll(h, (-shift) % rows, 0) if shift else h
            y = y + jnp.dot(shifted, taps_ref[start + j],
                            preferred_element_type=jnp.float32,
                            precision=precision)
        return (y + bias_ref[ci][None, :]) * valid

    def lrelu(v):
        return jnp.where(v > 0, v, 0.1 * v)

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
    out_ref[0] = (acc / n_blocks)[HALO:HALO + tile_rows]


def fused_resblock_stage(x: jnp.ndarray, params: dict, channels: int,
                         kernel_sizes: Sequence[int] = (3, 7, 11),
                         dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3,
                         tile_t: int = TILE_T, precision: str = 'highest',
                         interpret: bool = None) -> jnp.ndarray:
    """One HiFi-GAN upsample stage's resblock mean: x (N, C, T) -> (N, C, T).

    Requires C <= 128, 128 % C == 0 (lane packing), N % (128//C) == 0,
    ResBlock1 semantics, folded (inference) weights.
    ``precision``: 'highest' (6-pass f32, exact parity; the default) or
    'default' (single bf16 pass, ~1e-2 waveform error, several-fold faster
    matmuls). Mosaic does not support the intermediate HIGH tier in kernels.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, c, t = x.shape
    assert c == channels and LANE % c == 0 and c <= LANE
    pack = LANE // c
    assert n % pack == 0, 'batch must divide the lane-packing factor'
    tile_t = min(tile_t, _round_up(t, 8))   # no point tiling past the sequence

    taps, bias_arr, tap_meta, plan = pack_stage_weights(
        params, channels, kernel_sizes, dilations)

    # pack batch onto lanes: (N, C, T) -> (N/P, T, P*C); lane = p*C + c
    xp = x.reshape(n // pack, pack, c, t).transpose(0, 3, 1, 2) \
          .reshape(n // pack, t, pack * c)
    t_pad = _round_up(t, tile_t)
    xp = jnp.pad(xp, [(0, 0), (HALO, t_pad - t + HALO), (0, 0)])

    prec = {'highest': jax.lax.Precision.HIGHEST,
            'default': jax.lax.Precision.DEFAULT}[precision]
    kernel = functools.partial(_stage_kernel, tap_meta=tap_meta, plan=plan,
                               t_true=t, tile_rows=tile_t,
                               n_blocks=len(kernel_sizes), precision=prec)
    out = pl.pallas_call(
        kernel,
        grid=(n // pack, t_pad // tile_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec(taps.shape, lambda b, i: (0, 0, 0)),
            pl.BlockSpec(bias_arr.shape, lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_t, LANE), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // pack, t_pad, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_t + 2 * HALO, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # the 6.3MB tap stack is double-buffered by the pipeline; allow it
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(xp, taps, bias_arr)

    out = out[:, :t, :].reshape(n // pack, t, pack, c) \
                       .transpose(0, 2, 3, 1).reshape(n, c, t)
    return out


def stage_eligible(channels: int, batch: int) -> bool:
    """Whether a stage can run on this kernel (lane packing constraints)."""
    return (channels <= LANE and LANE % channels == 0
            and batch % (LANE // channels) == 0)
