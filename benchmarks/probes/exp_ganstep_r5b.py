"""Step-level GAN A/B for the round-5 dense-conv routing change.

Runs the exact bench entrypoint (`bench.bench_trainer_vctk_gan`, the
BASELINE 'Trainer steps/sec (VCTK)' config: 0.93M v2 generator + 84M
MPD+MSD critics, batch 16 x 8192) under each routing:

  xla_dense  — the new 'auto' default (generator convs on XLA; measured
               6.4 ms faster fwd+bwd at the component level, gen_r5.log)
  fold       — + PSTPU_GC_FOLD=1 (narrow ResBlock convs time-folded to
               128 lanes, ops/fold_conv.py)
  pallas_r4  — PSTPU_GC_DENSE_PALLAS=1 (the round-4 routing; recorded
               13.83 steps/s)

Reference anchor: /root/reference/pytorch_sound/models/vocoders/hifi_gan.py:96-147.
"""
import os
import sys
import json
import time

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

MODE = sys.argv[1] if len(sys.argv) > 1 else 'xla_dense'
if MODE == 'fold':
    os.environ['PSTPU_GC_FOLD'] = '1'
elif MODE == 'pallas_r4':
    os.environ['PSTPU_GC_DENSE_PALLAS'] = '1'

from pytorch_sound_tpu.utils.commons import enable_compilation_cache
enable_compilation_cache()

import bench

t0 = time.perf_counter()
aux = {}
steps = bench.bench_trainer_vctk_gan(aux=aux)
print(json.dumps({'mode': MODE,
                  'steps_per_sec': round(steps, 3),
                  'ms_per_step': round(1e3 / steps, 2),
                  'mfu': aux.get('mfu'),
                  'wall_s': round(time.perf_counter() - t0, 1)}),
      flush=True)
