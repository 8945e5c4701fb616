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

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _bounded_compiler_state():
  """Drop compiled executables between test modules.

  The suite compiles dozens of full-robot/full-env XLA:CPU programs into
  one long-lived process; the accumulated LLVM JIT state has been
  observed to crash late-suite compiles nondeterministically (SIGSEGV in
  backend_compile_and_load / SIGABRT in the AOT loader, at ~50% through
  the run). Clearing jit caches per module keeps that state bounded; the
  host-fingerprinted persistent disk cache makes any re-compilation of a
  still-live jitted function a fast disk reload, not a real compile."""
  yield
  jax.clear_caches()
  gc.collect()
