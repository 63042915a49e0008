"""Per-dispatch floor probe for the e2e preprocess pipeline (VERDICT r4 #2).

The round-4/5 leg probes (results/e2e.log, e2ewire2.log) established that
neither bandwidth nor compute binds the e2e preprocess number through the
axon tunnel: at i16_tgt/int8 the wire legs support ~550 utt/s serialized
and the chip computes at 33k utt/s, yet the pipeline measures 130-171.
This probe isolates the remaining term — the tunnel's PER-DISPATCH round
trip — by timing minimal RPCs of each kind the pipeline issues per batch:

  put   — device_put of a tiny (8,) f32 (pure H2D RPC, no payload to speak of)
  exec  — jitted x+1 on a resident tiny array (pure execute RPC)
  fetch — np.asarray of a tiny resident result (pure D2H RPC)

The 2-stage pipeline issues put+exec+fetch per batch (the put rides the
exec dispatch via jnp.asarray, but the tunnel still sees both legs), so

  per-batch floor = RTT_put + RTT_exec + RTT_fetch + bytes/bandwidth

which this probe evaluates against the measured per-batch e2e time, then
extrapolates to co-located hardware (PCIe-class H2D >= 8 GB/s, sub-ms
dispatch) where the floor collapses and the host decode leg binds instead.
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp


def med_ms(fn, n=15):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


tiny = np.ones(8, np.float32)
f = jax.jit(lambda x: x + 1)
resident = jax.device_put(tiny)
jax.block_until_ready(f(resident))   # compile out of the way

rtt_put = med_ms(lambda: jax.block_until_ready(jax.device_put(tiny)))
rtt_exec = med_ms(lambda: jax.block_until_ready(f(resident)))
rtt_fetch = med_ms(lambda: np.asarray(f(resident)))
print('tiny-op RTT: put=%.1f ms  exec=%.1f ms  fetch(exec+d2h)=%.1f ms'
      % (rtt_put, rtt_exec, rtt_fetch), flush=True)

# pipeline-shaped payload legs at batch 64 (i16_tgt H2D, int8 D2H).
# D2H must fetch a DISTINCT array each iteration: jax caches the host copy
# of an already-fetched Array, so re-fetching one resident array times a
# no-op memcpy, not the wire.
h2d_b = np.zeros((64, 88712), np.int16)            # 11.4 MB, the real wire
feat = np.zeros((64, 80, 345), np.int8)            # 1.77 MB features
d2h_pool = [jax.device_put(feat + i) for i in range(7)]
jax.block_until_ready(d2h_pool)
t_h2d = med_ms(lambda: jax.block_until_ready(jax.device_put(h2d_b)), n=7)
t_d2h = med_ms(lambda: np.asarray(d2h_pool.pop()), n=7)
print('payload legs b64: h2d 11.4MB=%.1f ms (%.2f GB/s)  '
      'd2h 1.8MB=%.1f ms (%.1f MB/s)'
      % (t_h2d, h2d_b.nbytes / t_h2d / 1e6,
         t_d2h, feat.nbytes / t_d2h / 1e3), flush=True)

rtt = rtt_put + rtt_fetch                      # exec rides the fetch's queue
floor_ms = rtt + t_h2d + t_d2h
print('per-batch floor (b64) = RTT %.1f + h2d %.1f + d2h %.1f = %.1f ms '
      '-> ceiling %.0f utt/s through THIS tunnel'
      % (rtt, t_h2d, t_d2h, floor_ms, 64 / floor_ms * 1e3), flush=True)

# co-located extrapolation: dispatch ~0.1 ms, H2D >= 8 GB/s, D2H >= 8 GB/s;
# the host decode leg (native C pipeline, results/e2e.log: 8178 utt/s on
# this 1-core host) becomes the binding stage of the overlapped pipeline
h2d_co = h2d_b.nbytes / 8e9 * 1e3
d2h_co = feat.nbytes / 8e9 * 1e3
floor_co = 0.3 + h2d_co + d2h_co
print('co-located floor (b64) = 0.3 + %.2f + %.2f = %.2f ms -> %.0f utt/s '
      'wire ceiling; overlapped pipeline then binds on host decode '
      '(~8.2k utt/s measured) >> the 200 utt/s target'
      % (h2d_co, d2h_co, floor_co, 64 / floor_co * 1e3), flush=True)
