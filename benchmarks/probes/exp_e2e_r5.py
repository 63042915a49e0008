"""Round-5 e2e preprocess probe: three-stage overlapped pipeline vs target.

Runs bench.bench_preprocess_e2e (now decode || H2D+dispatch || D2H on three
threads) for the accuracy-gated wire variants at two batch sizes. Target:
>= 200 utt/s (BASELINE north star; round-4 best was 171 with the two-stage
pipeline).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import bench

for name, kw in (
        ('i16_src_bf16_b64', dict()),
        ('i16_src_int8_b64', dict(wire='int8')),
        ('i16_tgt_int8_b64', dict(wire='int8', h2d='i16_tgt')),
        ('i16_tgt_int8_b32', dict(wire='int8', h2d='i16_tgt', batch=32)),
        ('i16_tgt_int8_b16', dict(wire='int8', h2d='i16_tgt', batch=16)),
        ('i16_tgt_bf16_b32', dict(wire='bf16', h2d='i16_tgt', batch=32)),
):
    try:
        v = bench.bench_preprocess_e2e(**kw)
        print('%s: %.1f utt/s' % (name, v), flush=True)
    except Exception as e:
        print('%s: FAILED %r' % (name, e), flush=True)
