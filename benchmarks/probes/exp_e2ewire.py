"""E2e preprocess H2D-wire ladder on the real device (+ accuracy deltas)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()
import bench

acc = bench.bench_preprocess_wire_accuracy()
for k, v in acc.items():
    print('wire %-12s log-mel delta max %.4f mean %.6f'
          % (k, v['max_abs'], v['mean_abs']), flush=True)

for h2d, wire in (('i16_src', 'bf16'), ('i16_src', 'int8'),
                  ('i16_tgt', 'int8'), ('mulaw8_tgt', 'int8')):
    try:
        v = bench.bench_preprocess_e2e(wire=wire, h2d=h2d)
        print('e2e h2d=%-11s wire=%-5s %8.1f utt/s' % (h2d, wire, v),
              flush=True)
    except Exception as e:
        print('e2e h2d=%-11s wire=%-5s FAILED %r' % (h2d, wire, str(e)[:140]),
              flush=True)
