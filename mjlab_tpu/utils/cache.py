"""Persistent-compile-cache helpers.

XLA:CPU executables are AOT-compiled against the BUILD host's CPU
features; loading them on a host with different features is undefined
behavior (the cpu_aot_loader warns, then can SIGILL/SIGSEGV — observed
killing the test suite when the cache followed the repo across machines).
CPU cache entries therefore live in a per-host-fingerprint subdirectory.
TPU executables target the TPU, not the host, so the shared directory
stays correct for them.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
  # The cpuinfo `flags` line alone is NOT discriminating enough: cloud
  # hypervisors mask the model name and can expose identical flag sets
  # on different microarchitectures, while XLA:CPU additionally bakes
  # LLVM *tuning* features chosen from the CPUID model (observed:
  # +prefer-no-scatter/+prefer-no-gather entries from a foreign host
  # SIGABRTing on load here). CPUID family/model/stepping pass through
  # virtualization and track the real part; include them plus the
  # jaxlib version (serialization format).
  parts = []
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        key = line.split(':')[0].strip()
        if key in ('flags', 'cpu family', 'model', 'stepping',
                   'model name'):
          parts.append(line.strip())
          if key == 'flags':
            break
  except OSError:
    pass
  if not parts:
    parts = [platform.processor() or platform.machine()]
  try:
    import jaxlib
    parts.append(f'jaxlib={jaxlib.__version__}')
  except Exception:
    pass
  return hashlib.sha256('|'.join(parts).encode()).hexdigest()[:16]


def cpu_cache_dir(repo_root: str) -> str:
  """Host-specific persistent cache directory for the CPU backend."""
  return os.path.join(repo_root, '.jax_cache_cpu', _host_fingerprint())


def setup_compilation_cache(repo_root: str | None = None) -> None:
  """Point JAX's persistent compile cache at the repo-local directory
  (CPU backends get the host-fingerprinted subdir). Tunneled-TPU
  backends pay a remote round trip per compile, so caching across
  processes matters; safe no-op if the config is unavailable."""
  import jax
  if repo_root is None:
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
  try:
    if jax.default_backend() == 'cpu':
      cache = cpu_cache_dir(repo_root)
    else:
      cache = os.path.join(repo_root, '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass


def apply_platform_env() -> None:
  """Honor MJLAB_PLATFORM (e.g. 'cpu') through jax.config.

  The axon TPU plugin OVERRIDES the JAX_PLATFORMS environment variable,
  so subprocesses (tests, CI) cannot force the CPU backend through the
  environment alone; every CLI calls this before touching JAX so
  `MJLAB_PLATFORM=cpu play ...` works anywhere. No-op when unset or
  after backend init."""
  plat = os.environ.get('MJLAB_PLATFORM')
  if plat:
    try:
      import jax
      jax.config.update('jax_platforms', plat)
    except Exception:
      pass
