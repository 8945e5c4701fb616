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
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith('flags'):
          src = line
          break
      else:
        src = platform.processor() or platform.machine()
  except OSError:
    src = platform.processor() or platform.machine()
  return hashlib.sha256(src.encode()).hexdigest()[:16]


def cpu_cache_dir(repo_root: str) -> str:
  """Host-specific persistent cache directory for the CPU backend."""
  return os.path.join(repo_root, '.jax_cache_cpu', _host_fingerprint())
