"""Test configuration: run on CPU with 8 virtual XLA devices so sharding
tests work without real multi-chip hardware (the TPU analog of the
reference's CPU-Warp CI strategy, reference .github/workflows/ci.yml)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_enable_x64', True)
