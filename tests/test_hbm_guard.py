"""HBM fit guard (mjlab_tpu/utils/hbm.py, VERDICT r4 #8): the perf
harness and bench refuse to execute programs whose XLA peak memory
exceeds the device budget, instead of crashing the TPU worker."""

import jax
import jax.numpy as jnp
import pytest

from mjlab_tpu.utils import hbm


def _compiled(n=256):
  f = jax.jit(lambda x: (x @ x).sum())
  return f.lower(jnp.ones((n, n))).compile()


def test_memory_report_or_graceful_none():
  rep = hbm.memory_report(_compiled())
  if rep is None:
    pytest.skip('backend exposes no memory analysis')
  assert rep.peak_bytes >= rep.temp_bytes >= 0
  assert 'peak' in str(rep)


def test_assert_fits_is_noop_without_capacity(monkeypatch):
  # backends without device limits (CPU) must not guess
  monkeypatch.setattr(hbm, 'device_capacity', lambda device=None: None)
  assert_result = hbm.assert_fits(_compiled(), label='x')
  assert assert_result is None or assert_result.capacity_bytes is None


def test_assert_fits_raises_over_budget(monkeypatch):
  rep = hbm.memory_report(_compiled())
  if rep is None:
    pytest.skip('backend exposes no memory analysis')
  # pretend the device is tiny: any real program overflows
  monkeypatch.setattr(hbm, 'device_capacity', lambda device=None: 16)
  with pytest.raises(hbm.HbmWouldOverflowError) as e:
    hbm.assert_fits(_compiled(), label='env.step @8192')
  assert 'env.step @8192' in str(e.value)
  assert 'refusing to execute' in str(e.value)


def test_assert_fits_passes_under_budget(monkeypatch):
  rep = hbm.memory_report(_compiled())
  if rep is None:
    pytest.skip('backend exposes no memory analysis')
  monkeypatch.setattr(hbm, 'device_capacity',
                      lambda device=None: rep.peak_bytes * 10)
  out = hbm.assert_fits(_compiled(), label='ok')
  assert out is not None and out.peak_bytes == rep.peak_bytes
