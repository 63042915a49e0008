"""Round-5 e2e steady-state probe: amortize the 3-stage pipeline fill/drain.

The first round-5 e2e run measured batch 16 fastest (131.7 vs 124.8 at b64)
on a 192-file corpus — at b64 that corpus is only THREE batches, so the
three-stage pipeline (decode || H2D+dispatch || D2H) spends most of its
life filling and draining. This probe scales the corpus so every config
sees >= 12 in-flight batches, measuring the pipeline's steady state
(the number a real corpus run would sustain).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import bench

for name, kw in (
        ('s2_i16_tgt_int8_b64_n384', dict(wire='int8', h2d='i16_tgt',
                                          batch=64, n_files=384, stages=2)),
        ('s2_i16_tgt_int8_b32_n384', dict(wire='int8', h2d='i16_tgt',
                                          batch=32, n_files=384, stages=2)),
        ('s2_i16_tgt_int8_b16_n384', dict(wire='int8', h2d='i16_tgt',
                                          batch=16, n_files=384, stages=2)),
        ('s3_i16_tgt_int8_b32_n384', dict(wire='int8', h2d='i16_tgt',
                                          batch=32, n_files=384, stages=3)),
        ('s2_i16_tgt_bf16_b32_n384', dict(wire='bf16', h2d='i16_tgt',
                                          batch=32, n_files=384, stages=2)),
        ('s2_i16_src_int8_b32_n384', dict(wire='int8', batch=32,
                                          n_files=384, stages=2)),
):
    try:
        v = bench.bench_preprocess_e2e(**kw)
        print('%s: %.1f utt/s' % (name, v), flush=True)
    except Exception as e:
        print('%s: FAILED %r' % (name, e), flush=True)
