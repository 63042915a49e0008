"""Time-folded dense conv1d: MXU-width reformulation of narrow-channel convs.

Why: the HiFi-GAN generator's late stages (the ResBlock stacks behind the
reference's upsampling pyramid,
/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:32-138) run
stride-1 dilated convs at 8-32 channels over 4k-8k timesteps. On TPU those
fill 8-32 of the MXU's 128 lanes — the round-5 generator ledger measured the
whole training forward at ~3% MFU (benchmarks/probes/results/gen_r5.log).

The fix is algebraic, not a kernel: fold ``f`` consecutive timesteps into
channels (``f = 128 // C``) so the conv runs at 128 lanes. For the stride-1
same-length conv ``y[t] = sum_j w[j] @ x[t + j*d - pad]``, write
``t = tau*f + r`` and shift ``a = r + j*d + s0`` with ``s0 = P0*f - pad``
(``P0 = ceil(pad/f)``) so every index splits cleanly as ``a = o*f + q``:

    y_fold[tau, r*C:(r+1)*C] = sum_o W_fold[o, q*C:(q+1)*C, r*C:(r+1)*C]
                                      @ x_fold[tau - P0 + o]

i.e. ONE ordinary (f*C -> f*C) conv with ``k' = (s0 + f-1 + (k-1)*d)//f + 1``
taps and block padding ``(P0, k'-1-P0)`` — no time-axis pad copy, no output
slice; the fold itself is a free contiguous reshape. The folded weight is the
original ``(C_out, C_in, k)`` weight contracted against a precomputed one-hot
placement tensor (a dense einsum: an ``.at[].add`` scatter here lowers to
thousands of serial scalar updates per step — measured 4x the conv's own
time). Autodiff through the einsum gives exact ``dw`` and through the wide
conv gives ``dx``, so the backward inherits the 128-lane shapes too.

Cost model: executed MACs grow by ``f*k'/k`` (the folded weight is mostly
zeros) but run at full lane width. Measured generator-level and step-level
A/Bs live in benchmarks/probes/results/gen_r5.log.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _fold_placement(k: int, dilation: int, fold: int, padding: int):
    """(k', P0, P1, P[j, r, o, q]) one-hot placement for the weight fold.

    numpy-only (device conversion happens at the use site): caching jnp
    arrays would capture trace-bound constants and leak tracers across jit
    boundaries.
    """
    p0 = -(-padding // fold)                      # ceil(pad/f) left blocks
    s0 = p0 * fold - padding
    j = np.arange(k)[None, :]                     # (1, k)
    r = np.arange(fold)[:, None]                  # (f, 1)
    a = r + dilation * j + s0                     # (f, k), all >= 0
    o, q = a // fold, a % fold
    kp = int(o.max()) + 1
    p1 = kp - 1 - p0                              # right blocks: out len T/f
    assert p1 >= 0, (k, dilation, fold, padding)
    pl = np.zeros((k, fold, kp, fold), np.float32)
    rr = np.broadcast_to(r, a.shape)
    jj = np.broadcast_to(j, a.shape)
    pl[jj.ravel(), rr.ravel(), o.ravel(), q.ravel()] = 1.0
    return kp, p0, p1, pl


def fold_weight(w: jnp.ndarray, dilation: int, fold: int,
                padding: int = 0) -> jnp.ndarray:
    """(C_out, C_in, K) torch-layout weight -> (K', f*C_in, f*C_out) HIO."""
    cout, cin, k = w.shape
    kp, _, _, pl = _fold_placement(k, dilation, fold, padding)
    # (kp, q, cin, r, cout): one small dense contraction over j
    wf = jnp.einsum('jroq,abj->oqbra', jnp.asarray(pl, dtype=w.dtype), w)
    return wf.reshape(kp, fold * cin, fold * cout)


def fold_conv1d_ntc(x: jnp.ndarray, w: jnp.ndarray, b=None, *,
                    dilation: int = 1, padding: int = 0, fold: int,
                    slope=None, precision: str = 'default') -> jnp.ndarray:
    """Stride-1 same-length conv1d on (N, T, C), folded to f*C lanes.

    Exact (mod float summation order) equivalent of
    ``grouped_conv1d_ntc(x, w, b, padding=padding, dilation=dilation)``
    for stride 1, groups 1, output length == T. Requires T % fold == 0.
    """
    n, t, cin = x.shape
    cout, cin_w, k = w.shape
    assert t % fold == 0, (t, fold)
    kp, p0, p1, _ = _fold_placement(k, dilation, fold, padding)
    wf = fold_weight(w, dilation, fold, padding)
    xf = x.reshape(n, t // fold, fold * cin)      # contiguous: free reshape
    out = jax.lax.conv_general_dilated(
        xf, wf, window_strides=(1,), padding=[(p0, p1)],
        dimension_numbers=('NHC', 'HIO', 'NHC'),
        precision=(jax.lax.Precision.HIGHEST if precision == 'highest'
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=(x.dtype if x.dtype == jnp.bfloat16
                                else jnp.float32))
    out = out.reshape(n, t, cout)
    if b is not None:
        out = out + b[None, None, :]
    if slope is not None:
        out = jnp.where(out > 0, out, slope * out)
    return out


def fold_eligible(cin: int, cout: int, stride: int, groups: int,
                  t_in: int, k: int, dilation: int, padding: int) -> int:
    """Fold factor for the folded path, or 0 when it doesn't apply.

    Same-length stride-1 dense convs at <= 32 channels (the measured-win
    regime) with a time axis divisible by the fold.
    """
    if stride != 1 or groups != 1 or cin != cout or cin > 32 or cin < 1:
        return 0
    if padding != (k - 1) * dilation // 2 or (k - 1) * dilation % 2:
        return 0
    fold = 128 // max(cin, 8)
    if t_in % fold or t_in // fold < 8:
        return 0
    return fold
