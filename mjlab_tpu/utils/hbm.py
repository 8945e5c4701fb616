"""Pre-execution HBM fit check (VERDICT r4 #8).

The round-4 8192-env batch-scale measurement crashed the TPU worker
outright (HBM exhaustion during execution — the axon backend kills the
worker instead of raising RESOURCE_EXHAUSTED, and a crashed worker can
wedge the tunnel for hours). XLA already knows the peak memory of a
compiled executable, so the guard is TPU-native: AOT-lower + compile,
read `memory_analysis()`, and refuse to execute programs whose
argument + output + temp footprint exceeds the device's HBM budget.

Usage (perf harness / bench):
    compiled = jax.jit(fn).lower(*args).compile()
    hbm.assert_fits(compiled, label='env.step @8192')
    compiled(*args)

The check is advisory-by-construction on backends that expose no
memory analysis or device limits (CPU tests): it degrades to a no-op
rather than guessing.
"""

from __future__ import annotations

import dataclasses

import jax

# Fraction of the device budget a single program may claim. XLA's
# number is exact for the program itself but excludes allocator
# fragmentation and any resident buffers the caller keeps alive
# elsewhere (donated-arg double buffers during the swap, compile-time
# scratch), so leave headroom.
DEFAULT_FRACTION = 0.92


@dataclasses.dataclass
class MemoryReport:
  argument_bytes: int
  output_bytes: int
  temp_bytes: int
  alias_bytes: int
  generated_code_bytes: int
  capacity_bytes: int | None

  @property
  def peak_bytes(self) -> int:
    # aliased (donated) buffers are counted in both arguments and
    # outputs but occupy one allocation
    return (self.argument_bytes + self.output_bytes + self.temp_bytes
            + self.generated_code_bytes - self.alias_bytes)

  def __str__(self):
    gb = lambda b: f'{b / 2**30:.2f} GiB'
    cap = gb(self.capacity_bytes) if self.capacity_bytes else 'unknown'
    return (f'args {gb(self.argument_bytes)} + out {gb(self.output_bytes)}'
            f' + temp {gb(self.temp_bytes)} - aliased {gb(self.alias_bytes)}'
            f' = peak {gb(self.peak_bytes)} (device capacity {cap})')


def memory_report(compiled, device=None) -> MemoryReport | None:
  """XLA memory analysis of a jax `Compiled` object; None when the
  backend exposes none (CPU)."""
  try:
    ma = compiled.memory_analysis()
  except Exception:
    return None
  if ma is None:
    return None
  cap = device_capacity(device)
  return MemoryReport(
      argument_bytes=int(getattr(ma, 'argument_size_in_bytes', 0)),
      output_bytes=int(getattr(ma, 'output_size_in_bytes', 0)),
      temp_bytes=int(getattr(ma, 'temp_size_in_bytes', 0)),
      alias_bytes=int(getattr(ma, 'alias_size_in_bytes', 0)),
      generated_code_bytes=int(getattr(ma, 'generated_code_size_in_bytes',
                                       0)),
      capacity_bytes=cap)


def device_capacity(device=None) -> int | None:
  """Device memory limit in bytes, when the backend reports one."""
  d = device or jax.devices()[0]
  try:
    stats = d.memory_stats()
  except Exception:
    return None
  if not stats:
    return None
  return stats.get('bytes_limit') or stats.get('bytes_reservable_limit')


class HbmWouldOverflowError(RuntimeError):
  pass


def assert_fits(compiled, label: str = 'program', device=None,
                fraction: float = DEFAULT_FRACTION) -> MemoryReport | None:
  """Raise HbmWouldOverflowError when the compiled program's XLA peak
  memory exceeds `fraction` of the device budget. Returns the report
  (None on backends without memory analysis — then nothing is checked)."""
  rep = memory_report(compiled, device)
  if rep is None or not rep.capacity_bytes:
    return rep
  budget = int(rep.capacity_bytes * fraction)
  if rep.peak_bytes > budget:
    raise HbmWouldOverflowError(
        f'{label}: XLA peak memory {rep.peak_bytes / 2**30:.2f} GiB exceeds '
        f'{fraction:.0%} of device capacity '
        f'{rep.capacity_bytes / 2**30:.2f} GiB — refusing to execute '
        f'(an over-budget launch crashes the TPU worker and can wedge the '
        f'tunnel; shrink the batch or shard over more chips). {rep}')
  return rep
