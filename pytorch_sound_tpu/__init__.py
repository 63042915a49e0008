"""pytorch_sound_tpu — a TPU-native audio deep-learning toolkit built on JAX/XLA/Pallas.

Provides the same capabilities as AppleHolic/pytorch_sound (see /root/reference):
dataset meta-files + preprocessing, generalized dataset/loader machinery, reusable
sound DSP modules + a fairseq-style model registry, and an abstract ``Trainer``
turning a user ``forward() -> (loss, meta)`` into a full train loop — re-architected
TPU-first: on-device fused STFT/mel kernels, jit/pjit data parallelism over a device
mesh, static-shape bucketed batching, and double-buffered host->HBM prefetch.
"""

__version__ = '0.1.0'

from pytorch_sound_tpu import settings  # noqa: F401


def __getattr__(name):
    """Lazy convenience exports: ``pytorch_sound_tpu.Trainer`` /
    ``build_model`` / ``LogType`` without importing jax at package import."""
    if name in ('Trainer', 'LogType'):
        from pytorch_sound_tpu import trainer
        return getattr(trainer, name)
    if name in ('build_model', 'register_model', 'register_model_architecture'):
        from pytorch_sound_tpu import models
        return getattr(models, name)
    if name == 'Interface':
        from pytorch_sound_tpu.interface import Interface
        return Interface
    raise AttributeError('module {!r} has no attribute {!r}'.format(__name__, name))
