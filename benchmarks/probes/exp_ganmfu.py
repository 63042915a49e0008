"""Per-component MFU ledger for the 72.3 ms GAN step (VERDICT r4 #4).

The round-5 A/B settled that neither bf16 critics nor the folded MSD beats
the round-4 configuration, so this probe answers the VERDICT's alternate
done-condition: show where the step's time physically goes at MFU
granularity. It computes cost_analysis() FLOPs for each component program
at the exact bench shapes ON CPU (FLOP counts are shape properties of the
HLO, not of the backend; no TPU tunnel needed) and joins them against the
measured per-component times from the committed on-TPU ganprof probe
(benchmarks/probes/results/SUMMARY.json ganprof_b32_msd_b16_gen,
2026-08-19). Peak denominator: v5e bf16 197 TFLOP/s.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')   # axon sitecustomize overrides env
import jax.numpy as jnp

from pytorch_sound_tpu.models import build_model
import pytorch_sound_tpu.models.vocoders.discriminators  # noqa: F401
import pytorch_sound_tpu.models.vocoders.hifi_gan  # noqa: F401
from pytorch_sound_tpu.ops import mel as mel_ops

B, T = 32, 8192          # disc-phase effective batch (16 real + 16 fake)
PEAK = 197e12
MEL_KW = dict(sampling_rate=22050, n_fft=1024, window_size=1024, hop_size=256,
              num_mels=80, fmin=0.0, fmax=8000.0)

rng = np.random.default_rng(11)
wav = jnp.asarray(rng.standard_normal((B, 1, T)) * 0.1, jnp.float32)

msd = build_model('hifi_gan_msd_base')
mpd = build_model('hifi_gan_mpd_base')
msd_p = msd.init(jax.random.PRNGKey(0), wav[:2])
mpd_p = mpd.init(jax.random.PRNGKey(1), wav[:2])
gen = build_model('hifi_gan_v2', extra_kwargs=dict(data_format='NTC'))
mel0 = mel_ops.hifigan_mel_spectrogram(wav[:16, 0], **MEL_KW)
gen_p = gen.init(jax.random.PRNGKey(2), mel0)


def _scal(out):
    s = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        s = s + leaf.mean()
    return s


def flops_of(f, *args, grad=False):
    run = jax.grad(f) if grad else f           # d/d(input), like ganprof
    try:
        c = jax.jit(run).lower(*args).compile()
        return float(c.cost_analysis().get('flops') or 0.0)
    except Exception as e:
        print('  flops FAILED: %r' % str(e)[:120], flush=True)
        return 0.0


# measured per-component ms on v5e through the committed ganprof probe
# (SUMMARY.json ganprof_b32_msd_b16_gen, 2026-08-19) — the same shapes
MEASURED_MS = {
    'msd_fwd_b32': 14.62, 'msd_fwd_bwd_b32': 29.93,
    'mpd_fwd_b32': 1.85, 'mpd_fwd_bwd_b32': 3.21,
    'gen_ntc_fwd_b16': 5.81, 'gen_ntc_fwd_bwd_b16': 15.64,
    'mel_b16': 0.13,
}

rows = []


def row(name, f, *args, grad=False):
    fl = flops_of(f, *args, grad=grad)
    ms = MEASURED_MS.get(name)
    tf = (fl / (ms * 1e-3) / 1e12) if (ms and fl) else None
    rows.append((name, fl, ms, tf))
    print('%-22s flops=%.3e  measured=%s ms  ->  %s TF/s  MFU=%s'
          % (name, fl, ms if ms is not None else '--',
             ('%.1f' % tf) if tf else '--',
             ('%.3f' % (tf * 1e12 / PEAK)) if tf else '--'), flush=True)


row('msd_fwd_b32', lambda x: _scal(msd.apply(msd_p, x)), wav)
row('msd_fwd_bwd_b32', lambda x: _scal(msd.apply(msd_p, x)), wav, grad=True)
row('mpd_fwd_b32', lambda x: _scal(mpd.apply(mpd_p, x)), wav)
row('mpd_fwd_bwd_b32', lambda x: _scal(mpd.apply(mpd_p, x)), wav, grad=True)
row('gen_ntc_fwd_b16', lambda m: gen.apply(gen_p, m).mean(), mel0)
row('gen_ntc_fwd_bwd_b16', lambda m: gen.apply(gen_p, m).mean(), mel0,
    grad=True)
row('mel_b16',
    lambda x: mel_ops.hifigan_mel_spectrogram(x, **MEL_KW).mean(),
    wav[:16, 0])

# optimizer leg: two adamw updates over 85M params are HBM-bound, not
# FLOP-bound — ideal time from bytes, for the ledger's residual row
n_params = 85008114
adamw_bytes = n_params * 4 * (4 + 3) * 2   # rd p,g,m,v + wr p,m,v; 2 opts
print('adamw_x2: ~%.0f MB traffic -> ideal %.2f ms at 819 GB/s HBM'
      % (adamw_bytes / 1e6, adamw_bytes / 819e9 * 1e3), flush=True)

print('\nfused step measured 72.30 ms, cost_analysis 6.265e12 flops '
      '-> 86.7 TF/s, MFU 0.440 (bench_vctk_gan r5)', flush=True)
