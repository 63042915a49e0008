"""Slope-based device-loop timing robust to tunnel RTT AND dispatch dedup.

dt/iter = (T(N2) - T(N1)) / (N2 - N1) with content-unique inputs per call.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def slope_timeit(make_step, carry0, n1=40, n2=240, trials=3):
    def run_n(iters):
        @jax.jit
        def run(c0):
            def body(_, carry):
                c, acc = carry
                c2, s = make_step(c)
                return c2, acc + s
            return jax.lax.fori_loop(0, iters, body, (c0, jnp.float32(0)))[1]
        return run

    r1, r2 = run_n(n1), run_n(n2)

    def fresh(k):
        # content-unique input per dispatch (survives f32 rounding) so the
        # tunnel cannot dedup repeated executions
        return jax.tree_util.tree_map(
            lambda a: (a * (1.0 + 1e-4 * (k + 1))).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, carry0)

    c = fresh(0)
    float(np.asarray(r1(c))); float(np.asarray(r2(fresh(1))))
    t1s, t2s = [], []
    for tr in range(trials):
        c1, c2 = fresh(2 + 2 * tr), fresh(3 + 2 * tr)
        jax.block_until_ready((c1, c2))
        t0 = time.perf_counter(); float(np.asarray(r1(c1)))
        t1 = time.perf_counter(); float(np.asarray(r2(c2)))
        t2 = time.perf_counter()
        t1s.append(t1 - t0); t2s.append(t2 - t1)
    slopes = [(b - a) / (n2 - n1) for a in t1s for b in t2s if b > a]
    if slopes:
        return float(np.median(slopes))
    return min(t2s) / n2
