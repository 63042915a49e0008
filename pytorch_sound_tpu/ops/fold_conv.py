"""Time-folded dense conv1d: MXU-width reformulation of narrow-channel convs.

Why: the HiFi-GAN generator's late stages (the ResBlock stacks behind the
reference's upsampling pyramid,
/root/reference/pytorch_sound/models/vocoders/hifi_gan.py:32-138) run
stride-1 dilated convs at 8-32 channels over 4k-8k timesteps. On TPU those
fill 8-32 of the MXU's 128 lanes — the round-5 generator ledger measured the
whole training forward at ~3% MFU (benchmarks/probes/results/gen_r5.log).

The fix is algebraic, not a kernel: fold ``f`` consecutive timesteps into
channels (``f = 128 // C``) so the conv runs at 128 lanes. For the stride-1
conv ``y[t] = sum_j w[j] @ xp[t + j*d]`` (xp = input padded by ``pad``),
write ``t = tau*f + r``; then ``a = r + j*d`` splits as ``a = o*f + q`` and

    y_fold[tau, r*C:(r+1)*C] = sum_o W_fold[o, q*C:(q+1)*C, r*C:(r+1)*C]
                                      @ xp_fold[tau + o]

i.e. ONE ordinary (f*C -> f*C) conv with ``k' = (f-1 + (k-1)*d)//f + 1``
taps, whose weight is the original ``(C_out, C_in, k)`` weight zero-scattered
into block positions — a trace-time-static scatter, so autodiff gives exact
``dw`` (gather-transpose) and ``dx`` (wide transposed conv) for free.

Cost model: executed MACs grow by ``f*k'/k`` (the scattered weight is mostly
zeros) but run at full lane width; at 8 channels that trades ~7x the FLOPs
for ~16x the utilization, and both the forward and EVERY AD-generated
backward conv inherit the wide shape. Measured generator-level and
step-level A/Bs live in benchmarks/probes/results/gen_r5.log.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _fold_plan(k: int, dilation: int, fold: int):
    """Static (o, q, r, j) index table for the weight scatter.

    numpy-only (device conversion happens at the use site): caching jnp
    arrays would capture trace-bound constants and leak tracers across jit
    boundaries.
    """
    j = np.arange(k)[None, :]                     # (1, k)
    r = np.arange(fold)[:, None]                  # (f, 1)
    a = r + dilation * j                          # (f, k)
    o, q = a // fold, a % fold
    kp = int(o.max()) + 1
    return (kp, o.ravel(), q.ravel(),
            np.broadcast_to(r, a.shape).ravel(),
            np.broadcast_to(j, a.shape).ravel())


def fold_weight(w: jnp.ndarray, dilation: int, fold: int) -> jnp.ndarray:
    """(C_out, C_in, K) torch-layout weight -> (K', f*C_in, f*C_out) HIO."""
    cout, cin, k = w.shape
    kp, o, q, r, j = _fold_plan(k, dilation, fold)
    wf = jnp.zeros((kp, fold * cin, fold * cout), dtype=w.dtype)
    # w[:, :, j] -> (cout, cin, f*k); scatter each (q,r) channel block
    wj = w[:, :, j].transpose(2, 1, 0)            # (f*k, cin, cout)
    ci = jnp.arange(cin)
    co = jnp.arange(cout)
    return wf.at[o[:, None, None],
                 q[:, None, None] * cin + ci[None, :, None],
                 r[:, None, None] * cout + co[None, None, :]].add(wj)


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
    wf = fold_weight(w, dilation, fold)
    kp = wf.shape[0]
    # pad so that folded tap tau + o reads xp[tau*f + o*f + q] = x[t - pad + a]
    right = kp * fold - padding
    xp = jnp.pad(x, ((0, 0), (padding, right), (0, 0)))
    xf = xp.reshape(n, (t + padding + right) // fold, fold * cin)
    out = jax.lax.conv_general_dilated(
        xf, wf, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=('NHC', 'HIO', 'NHC'),
        precision=(jax.lax.Precision.HIGHEST if precision == 'highest'
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=(x.dtype if x.dtype == jnp.bfloat16
                                else jnp.float32))
    out = out[:, :t // fold].reshape(n, t, cout)
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
