"""v1 fused-generator: compiled parity + samples/s, cache-warming run.

Runs the exact bench.py entry points (same HLO -> warms the persistent
compile cache for the driver's bench run) and prints the numbers so the
VERDICT item-3 evidence exists even if a later driver bench is cut short.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
import bench

err = bench._vocoder_v1_parity_err()
print('v1 fused parity max abs err (compiled, f32-HIGHEST): %.3e' % err,
      flush=True)
sps = bench.bench_vocoder_v1()
print('v1 fused samples/s (highest): %.3e  (%.1fx realtime @22.05k)'
      % (sps, sps / 22050.0), flush=True)
sps3 = bench.bench_vocoder_v1(precision='bf16x3')
print('v1 fused samples/s (bf16x3):  %.3e  (%.1fx realtime @22.05k)'
      % (sps3, sps3 / 22050.0), flush=True)
spsx = bench.bench_vocoder_v1(fused=False)
print('v1 un-fused XLA samples/s:    %.3e  -> fused/XLA = %.2fx'
      % (spsx, sps / spsx), flush=True)
