"""E2e wire round 2: batch-size sweep (per-dispatch tunnel tax vs overlap).

exp_e2ewire measured i16_tgt/int8 at 153 utt/s — but the leg sum says ~275
is available. Suspects: per-dispatch overhead (3 dispatches) and the 1-core
host competing with the main thread. Sweep the chunking; one giant dispatch
trades all overlap for zero per-dispatch tax.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
import bench

for h2d in ('i16_tgt', 'mulaw8_tgt'):
    for b in (192, 96, 64, 32):
        try:
            v = bench.bench_preprocess_e2e(wire='int8', h2d=h2d, batch=b)
            print('e2e h2d=%-11s batch=%-4d %8.1f utt/s' % (h2d, b, v),
                  flush=True)
        except Exception as e:
            print('e2e h2d=%-11s batch=%-4d FAILED %r'
                  % (h2d, b, str(e)[:140]), flush=True)
