"""Pin the grouped-conv Pallas kernel bottleneck with perf-variant probes.

For two representative MSD geometries (L2 wide-T, L5 deep), times:
  base      : the shipped kernel path (grouped_conv1d_ntc backend='pallas')
  xla       : the XLA fallback (backend='xla')
  a8        : variant with all tap LHS slices forced 8-row-aligned
              (WRONG MATH — isolates sublane-misalignment rotate cost)
  tap1      : variant executing only ONE tap (isolates per-tap marginal cost)
  bfdma     : variant DMA'ing a bf16 x_ph (halves scratch DMA bytes)
  tile256/1024 : tile-size sweep
  xla_dense : explicit dense expansion (zero-padded weights) — is XLA's
              grouped lowering worse than its own dense conv?
  xla_vmapg : vmap-over-groups dense conv
All perf variants share the same packed taps/x_ph; only 'base' is
parity-checked. Device-loop slope timing (single dispatch, tunnel-immune).
"""
import functools
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
INTERPRET = bool(int(os.environ.get('KVAR_INTERPRET', '0')))
if INTERPRET:
    import jax as _j
    _j.config.update('jax_platforms', 'cpu')
import numpy as np, jax, jax.numpy as jnp
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import pytorch_sound_tpu.ops.pallas.grouped_conv as gc
from timing import slope_timeit

B = 32
# (name, cin, cout, k, stride, groups, T) — the repo MSD's actual layers
# (models/vocoders/discriminators.py ScaleDiscriminator layout, scale 1)
GEOMS = [
    ('L1 128->128 k41 s2 g4 T8192', 128, 128, 41, 2, 4, 8192),
    ('L3 256->512 k41 s4 g8 T2048', 256, 512, 41, 4, 8, 2048),
    ('L5 1024->1024 k41 s1 g8 T128', 1024, 1024, 41, 1, 8, 128),
]


def variant_kernel(x_ref, taps_ref, out_ref, scr, sem, *, tile, j_taps,
                   n_slabs, lo_mm, r_s, align8, one_tap):
    b = pl.program_id(0)
    o = pl.program_id(1)
    t = pl.program_id(2)
    slab_idx = 0 if n_slabs == 1 else o
    row0 = pl.multiple_of(t * tile, 8)
    dma = pltpu.make_async_copy(
        x_ref.at[b, slab_idx, pl.ds(row0, r_s), :], scr, sem)
    dma.start()
    dma.wait()
    xs = scr[...]
    if xs.dtype != jnp.bfloat16:
        xs = xs.astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    acc = jnp.zeros((tile, lo_mm), jnp.float32)
    taps = range(1) if one_tap else range(j_taps)
    for j in taps:
        off = (j // 8) * 8 if align8 else j
        acc = acc + jnp.dot(xs[off:off + tile], taps_ref[0, j], **kw)
    out_ref[0] = acc


def rot8_kernel(x_ref, taps_ref, out_ref, scr, rot, sem, *, tile, j_taps,
                n_slabs, lo_mm, r_s, rot_rows):
    """Materialize the <=8 sublane-phase rotations ONCE, then every tap is an
    8-ALIGNED slice of its rotation — j_taps misaligned slices become
    min(8, j_taps) misaligned copies + j_taps aligned matmul reads."""
    b = pl.program_id(0)
    o = pl.program_id(1)
    t = pl.program_id(2)
    slab_idx = 0 if n_slabs == 1 else o
    row0 = pl.multiple_of(t * tile, 8)
    dma = pltpu.make_async_copy(
        x_ref.at[b, slab_idx, pl.ds(row0, r_s), :], scr, sem)
    dma.start()
    dma.wait()
    xs = scr[...]
    if xs.dtype != jnp.bfloat16:
        xs = xs.astype(jnp.bfloat16)
    n_rot = min(8, j_taps)
    for r in range(n_rot):
        rot[r] = jnp.pad(xs[r:], ((0, r), (0, 0)))[:rot_rows]
    acc = jnp.zeros((tile, lo_mm), jnp.float32)
    for j in range(j_taps):
        q, r = divmod(j, 8)
        acc = acc + jnp.dot(rot[r, 8 * q:8 * q + tile],
                            taps_ref[0, j],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc


def run_rot8(x_ph, taps, tile, out_rows):
    n, n_slabs, ph_rows, lx = x_ph.shape
    n_out_tiles, j_taps, lx_t, lo_mm = taps.shape
    if lx % 128:
        lx_p = -(-lx // 128) * 128
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0), (0, 0), (0, lx_p - lx)])
        taps = jnp.pad(taps, [(0, 0), (0, 0), (0, lx_p - lx), (0, 0)])
        lx = lx_p
    n_tiles = -(-out_rows // tile)
    r_s = -(-(tile + j_taps - 1) // 8) * 8
    if ph_rows < (n_tiles - 1) * tile + r_s:
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0),
                              (0, (n_tiles - 1) * tile + r_s - ph_rows),
                              (0, 0)])
    taps = taps.astype(jnp.bfloat16)
    n_q = -(-j_taps // 8)
    rot_rows = -(-(tile + 8 * (n_q - 1)) // 8) * 8
    kern = functools.partial(rot8_kernel, tile=tile, j_taps=j_taps,
                             n_slabs=n_slabs, lo_mm=lo_mm, r_s=r_s,
                             rot_rows=rot_rows)
    f = pl.pallas_call(
        kern,
        grid=(n, n_out_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, j_taps, lx, lo_mm), lambda b, o, t: (o, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, lo_mm), lambda b, o, t: (b, t, o)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles * tile, n_out_tiles * lo_mm), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r_s, lx), x_ph.dtype),
            pltpu.VMEM((min(8, j_taps), rot_rows, lx), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
        interpret=INTERPRET,
    )
    return f, x_ph, taps


def pipe_kernel(x_ref, taps_ref, out_ref, scr0, scr1, sem0, sem1, *, tile,
                j_taps, n_slabs, lo_mm, r_s, n_tiles):
    """Double-buffered variant: grid (n, o); loop tiles in-kernel, tile t+1's
    scratch DMA overlaps tile t's matmuls."""
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
        if xs.dtype != jnp.bfloat16:
            xs = xs.astype(jnp.bfloat16)
        acc = jnp.zeros((tile, lo_mm), jnp.float32)
        for j in range(j_taps):
            acc = acc + jnp.dot(xs[j:j + tile], taps_ref[0, j],
                                preferred_element_type=jnp.float32)
        out_ref[0, t * tile:(t + 1) * tile, :] = acc


def run_pipe(x_ph, taps, tile, out_rows, *, bf16_dma=False):
    n, n_slabs, ph_rows, lx = x_ph.shape
    n_out_tiles, j_taps, lx_t, lo_mm = taps.shape
    if lx % 128:
        lx_p = -(-lx // 128) * 128
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0), (0, 0), (0, lx_p - lx)])
        taps = jnp.pad(taps, [(0, 0), (0, 0), (0, lx_p - lx), (0, 0)])
        lx = lx_p
    n_tiles = -(-out_rows // tile)
    r_s = -(-(tile + j_taps - 1) // 8) * 8
    if ph_rows < (n_tiles - 1) * tile + r_s:
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0),
                              (0, (n_tiles - 1) * tile + r_s - ph_rows),
                              (0, 0)])
    taps = taps.astype(jnp.bfloat16)
    if bf16_dma:
        x_ph = x_ph.astype(jnp.bfloat16)
    kern = functools.partial(pipe_kernel, tile=tile, j_taps=j_taps,
                             n_slabs=n_slabs, lo_mm=lo_mm, r_s=r_s,
                             n_tiles=n_tiles)
    f = pl.pallas_call(
        kern,
        grid=(n, n_out_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, j_taps, lx, lo_mm), lambda b, o: (o, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_tiles * tile, lo_mm),
                               lambda b, o: (b, 0, o)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles * tile, n_out_tiles * lo_mm), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r_s, lx), x_ph.dtype),
            pltpu.VMEM((r_s, lx), x_ph.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=INTERPRET,
    )
    return f, x_ph, taps


def run_variant(x_ph, taps, tile, out_rows, *, align8=False, one_tap=False,
                bf16_dma=False):
    n, n_slabs, ph_rows, lx = x_ph.shape
    n_out_tiles, j_taps, lx_t, lo_mm = taps.shape
    if lx % 128:
        lx_p = -(-lx // 128) * 128
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0), (0, 0), (0, lx_p - lx)])
        taps = jnp.pad(taps, [(0, 0), (0, 0), (0, lx_p - lx), (0, 0)])
        lx = lx_p
    n_tiles = -(-out_rows // tile)
    r_s = -(-(tile + j_taps - 1) // 8) * 8
    if ph_rows < (n_tiles - 1) * tile + r_s:
        x_ph = jnp.pad(x_ph, [(0, 0), (0, 0),
                              (0, (n_tiles - 1) * tile + r_s - ph_rows),
                              (0, 0)])
    taps = taps.astype(jnp.bfloat16)
    if bf16_dma:
        x_ph = x_ph.astype(jnp.bfloat16)
    kern = functools.partial(variant_kernel, tile=tile, j_taps=j_taps,
                             n_slabs=n_slabs, lo_mm=lo_mm, r_s=r_s,
                             align8=align8, one_tap=one_tap)
    f = pl.pallas_call(
        kern,
        grid=(n, n_out_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, j_taps, lx, lo_mm), lambda b, o, t: (o, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, lo_mm), lambda b, o, t: (b, t, o)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles * tile, n_out_tiles * lo_mm), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r_s, lx), x_ph.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
        interpret=INTERPRET,
    )
    return f, x_ph, taps


def main():
    for name, cin, cout, k, stride, groups, t_in in GEOMS:
        print('=== %s  (B=%d)' % (name, B), flush=True)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((B, t_in, cin)), jnp.float32) * .1
        w = jnp.asarray(rng.standard_normal((cout, cin // groups, k)),
                        jnp.float32) * .05
        pad = (k - 1) // 2
        tflop = 2 * B * ((t_in + 2 * pad - k) // stride + 1) * cout \
            * (cin // groups) * k / 1e12

        def t_of(fn, arg):
            def mk(c):
                (a,) = c
                out = fn(a)
                s = out.mean()
                return (a * (1.0 + 1e-5 * jnp.tanh(s)),), s
            return slope_timeit(mk, (arg,), n1=8, n2=24)

        # -- library paths (pallas under both planner-knob combos)
        for bk, cm, bf in (('pallas', 'macs', 'never'),
                           ('pallas', 'rate', 'auto'),
                           ('xla', None, None)):
            label = bk if cm is None else '%s %s/%s' % (bk, cm, bf)
            if cm is not None:
                gc.COST_MODE, gc.BATCH_FOLD = cm, bf
            try:
                fn = lambda a: gc.grouped_conv1d_ntc(
                    a, w, None, stride=stride, padding=pad, groups=groups,
                    backend=bk)
                dt = t_of(fn, x)
                print('  %-18s %8.3f ms  %6.1f TF/s' %
                      (label, dt * 1e3, tflop / dt), flush=True)
            except Exception as e:
                print('  %-18s FAILED %r' % (label, str(e)[:120]), flush=True)
        gc.COST_MODE, gc.BATCH_FOLD = 'rate', 'auto'

        # -- XLA formulations
        wd = np.zeros((cout, cin, k), np.float32)
        cg, cog = cin // groups, cout // groups
        wnp = np.asarray(w)
        for g in range(groups):
            wd[g * cog:(g + 1) * cog, g * cg:(g + 1) * cg] = \
                wnp[g * cog:(g + 1) * cog]
        wd = jnp.asarray(wd)
        fn = lambda a: jax.lax.conv_general_dilated(
            a, wd.transpose(2, 1, 0), (stride,), [(pad, pad)],
            dimension_numbers=('NHC', 'HIO', 'NHC'),
            preferred_element_type=jnp.float32)
        try:
            dt = t_of(fn, x)
            print('  %-10s %8.3f ms  %6.1f TF/s (true-rate)' %
                  ('xla_dense', dt * 1e3, tflop / dt), flush=True)
        except Exception as e:
            print('  xla_dense FAILED %r' % str(e)[:120], flush=True)

        wg = w.reshape(groups, cog, cg, k)

        def vg(a):
            ag = a.reshape(B, -1, groups, cg).transpose(2, 0, 1, 3)
            f1 = lambda xx, ww: jax.lax.conv_general_dilated(
                xx, ww.transpose(2, 1, 0), (stride,), [(pad, pad)],
                dimension_numbers=('NHC', 'HIO', 'NHC'),
                preferred_element_type=jnp.float32)
            og = jax.vmap(f1)(ag, wg)              # (G, B, T', cog)
            return og.transpose(1, 2, 0, 3).reshape(B, -1, cout)
        try:
            dt = t_of(vg, x)
            print('  %-10s %8.3f ms  %6.1f TF/s' %
                  ('xla_vmapg', dt * 1e3, tflop / dt), flush=True)
        except Exception as e:
            print('  xla_vmapg FAILED %r' % str(e)[:120], flush=True)

        # -- kernel variants on the shipped packing
        gp, s_out, n_out, slab, lo_mm = gc._plan(cin, cout, k, stride,
                                                 groups, pad)
        S = stride * s_out
        p_f, d0, j_taps = gc._geometry(k, stride, s_out, pad, 1)
        v_rows = -(-((t_in + 2 * pad - k) // stride + 1) // s_out)
        n_slabs = n_out if groups > 1 else 1
        total = gc._pad_rows_for(t_in, p_f, S, gc._pick_tile(v_rows),
                                 v_rows, j_taps)
        x_pad = jnp.pad(x, [(0, 0), (p_f, total - p_f - t_in), (0, 0)])
        x_ph = gc._phase_fold(x_pad, S, n_slabs)
        taps = gc._pack_fwd_taps(w, gp, n_out, stride, s_out, j_taps, d0,
                                 groups, 1)
        base_tile = gc._pick_tile(v_rows)
        print('  plan: gp=%d s_out=%d n_out=%d lx=%d lo=%d j=%d tile=%d '
              'grid=%d' % (gp, s_out, n_out, taps.shape[2], lo_mm, j_taps,
                           base_tile, B * n_out * (-(-v_rows // base_tile))),
              flush=True)
        variants = [
            ('v_base', dict()),
            ('v_a8', dict(align8=True)),
            ('v_tap1', dict(one_tap=True)),
            ('v_bfdma', dict(bf16_dma=True)),
        ]
        tiles = sorted({base_tile, 256, min(1024, max(256, v_rows))})
        for nm, kwv in variants:
            try:
                f, xp, tp = run_variant(x_ph, taps, base_tile, v_rows, **kwv)
                dt = t_of(lambda a, f=f, tp=tp: f(a, tp), xp)
                print('  %-10s %8.3f ms  %6.1f TF/s' %
                      (nm, dt * 1e3, tflop / dt), flush=True)
            except Exception as e:
                print('  %-10s FAILED %r' % (nm, str(e)[:140]), flush=True)
        try:
            f, xp, tp = run_rot8(x_ph, taps, base_tile, v_rows)
            dt = t_of(lambda a, f=f, tp=tp: f(a, tp), xp)
            print('  %-10s %8.3f ms  %6.1f TF/s' %
                  ('v_rot8', dt * 1e3, tflop / dt), flush=True)
        except Exception as e:
            print('  %-10s FAILED %r' % ('v_rot8', str(e)[:140]), flush=True)
        for nm, kwv in (('v_pipe', dict()), ('v_pipe_bf', dict(bf16_dma=True))):
            try:
                f, xp, tp = run_pipe(x_ph, taps, base_tile, v_rows, **kwv)
                dt = t_of(lambda a, f=f, tp=tp: f(a, tp), xp)
                print('  %-10s %8.3f ms  %6.1f TF/s' %
                      (nm, dt * 1e3, tflop / dt), flush=True)
            except Exception as e:
                print('  %-10s FAILED %r' % (nm, str(e)[:140]), flush=True)
        for tl in tiles:
            if tl == base_tile or tl > v_rows:
                continue
            try:
                f, xp, tp = run_variant(x_ph, taps, tl, v_rows)
                dt = t_of(lambda a, f=f, tp=tp: f(a, tp), xp)
                print('  v_tile%-4d %8.3f ms  %6.1f TF/s' %
                      (tl, dt * 1e3, tflop / dt), flush=True)
            except Exception as e:
                print('  v_tile%-4d FAILED %r' % (tl, str(e)[:140]),
                      flush=True)


if __name__ == '__main__':
    main()
