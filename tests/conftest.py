"""Test configuration: force a virtual 8-device CPU mesh before jax import.

Multi-device tests (pmap/pjit/shard_map) run against CPU devices as the fake
backend replacement for a TPU slice, per SURVEY.md §4.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# The axon TPU plugin's sitecustomize calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# SILENTLY OVERRIDES the env var above — tests would then dispatch through
# the TPU tunnel (glacial for interpret-mode Pallas). Re-force CPU at the
# config level, which wins over the sitecustomize update.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', \
    'tests must run on the virtual CPU mesh, got %s' % jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# loaders_smoke/ holds reference-parity manual smoke CLIs needing real datasets
collect_ignore_glob = ['loaders_smoke/*']


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope='session')
def sine_wav(rng):
    """1.5 s of 220 Hz sine + light noise at the default sample rate."""
    sr = 22050
    t = np.arange(int(sr * 1.5)) / sr
    wav = 0.5 * np.sin(2 * np.pi * 220.0 * t) + 0.01 * rng.standard_normal(len(t))
    return wav.astype(np.float32)
