"""Test configuration: run on CPU with 8 virtual XLA devices so sharding
tests work without real multi-chip hardware (the TPU analog of the
reference's CPU-Warp CI strategy, reference .github/workflows/ci.yml).

NOTE: under the axon TPU tunnel the JAX_PLATFORMS env var is overridden
by the plugin, so the platform must be forced through jax.config (env
alone silently leaves the suite running on the TPU chip, where float64 is
emulated and the machine-precision oracle tests fail)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
# Persistent compile cache: full-env CPU compiles dominate suite wall
# time (minutes each); cached reruns take seconds. Host-fingerprinted:
# XLA:CPU AOT executables from another machine SIGSEGV on load
# (mjlab_tpu/utils/cache.py).
from mjlab_tpu.utils.cache import cpu_cache_dir  # noqa: E402

jax.config.update(
    'jax_compilation_cache_dir',
    cpu_cache_dir(os.path.dirname(os.path.dirname(__file__))))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

assert jax.default_backend() == 'cpu', (
    'tests must run on the CPU backend, got ' + jax.default_backend())
assert jax.device_count() == 8, 'expected 8 virtual CPU devices'
