"""Unit tests: string resolution, circular buffer, noise, task math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.utils import buffers, noise
from mjlab_tpu.utils.math import (
    quat_apply,
    quat_apply_inverse,
    quat_error_magnitude,
    quat_from_euler_xyz,
    quat_mul,
    wrap_to_pi,
    yaw_quat,
)
from mjlab_tpu.utils.string import (
    resolve_matching_names,
    resolve_matching_names_values,
)

NAMES = ['FL_hip', 'FL_knee', 'FR_hip', 'FR_knee', 'spine']


def test_resolve_matching_names_order_and_dedup():
  ids, names = resolve_matching_names(['.*_hip', 'spine'], NAMES)
  assert names == ['FL_hip', 'FR_hip', 'spine']
  assert ids == [0, 2, 4]
  with pytest.raises(ValueError):
    resolve_matching_names(['nomatch.*'], NAMES)
  with pytest.raises(ValueError):  # double match
    resolve_matching_names(['FL_hip', 'FL_.*'], NAMES)


def test_resolve_matching_names_preserve_order():
  ids, names = resolve_matching_names(['spine', '.*_hip'], NAMES,
                                      preserve_order=True)
  assert names == ['spine', 'FL_hip', 'FR_hip']


def test_resolve_matching_names_values():
  ids, names, vals = resolve_matching_names_values(
      {'.*_knee': 2.0, 'spine': 3.0}, NAMES)
  assert names == ['FL_knee', 'FR_knee', 'spine']
  assert vals == [2.0, 2.0, 3.0]


def test_circular_buffer_backfill_and_lifo():
  cb = buffers.create(2, 3, 1)
  cb = buffers.append(cb, jnp.asarray([[1.0], [10.0]]))
  # first append backfills all slots
  frames = buffers.all_frames(cb)
  np.testing.assert_allclose(frames[:, :, 0], [[1, 1, 1], [10, 10, 10]])
  cb = buffers.append(cb, jnp.asarray([[2.0], [20.0]]))
  cb = buffers.append(cb, jnp.asarray([[3.0], [30.0]]))
  frames = buffers.all_frames(cb)
  np.testing.assert_allclose(frames[:, :, 0], [[1, 2, 3], [10, 20, 30]])
  # newest via lag 0
  newest = buffers.lag(cb, jnp.zeros(2, jnp.int32))
  np.testing.assert_allclose(newest[:, 0], [3, 30])
  # per-env reset: env 0 resets, env 1 keeps history
  cb = buffers.reset(cb, jnp.asarray([True, False]))
  cb = buffers.append(cb, jnp.asarray([[9.0], [40.0]]))
  frames = buffers.all_frames(cb)
  np.testing.assert_allclose(frames[0, :, 0], [9, 9, 9])
  np.testing.assert_allclose(frames[1, :, 0], [20, 30, 40])


def test_noise_ops():
  key = jax.random.PRNGKey(0)
  x = jnp.ones((4, 3))
  out = noise.apply_noise(noise.UniformNoiseCfg(n_min=0.5, n_max=0.5), key, x)
  np.testing.assert_allclose(out, 1.5)
  out = noise.apply_noise(
      noise.ConstantNoiseCfg(bias=2.0, operation='scale'), key, x)
  np.testing.assert_allclose(out, 2.0)
  cfg = noise.NoiseModelWithAdditiveBiasCfg(
      noise_cfg=None, bias_noise_cfg=noise.UniformNoiseCfg(n_min=1., n_max=1.))
  b = noise.bias_init(cfg, 4, 3)
  b = noise.bias_reset(cfg, key, b, jnp.asarray([True, True, False, False]))
  np.testing.assert_allclose(b[:2], 1.0)
  np.testing.assert_allclose(b[2:], 0.0)


def test_quat_roundtrips():
  rng = np.random.default_rng(0)
  q = rng.normal(size=(16, 4))
  q /= np.linalg.norm(q, axis=-1, keepdims=True)
  q = jnp.asarray(q)
  v = jnp.asarray(rng.normal(size=(16, 3)))
  np.testing.assert_allclose(
      quat_apply_inverse(q, quat_apply(q, v)), v, atol=1e-5)
  # yaw quat only has yaw
  yq = yaw_quat(q)
  assert np.allclose(np.asarray(yq)[:, 1:3], 0, atol=1e-6)
  # error magnitude of identical quats
  np.testing.assert_allclose(quat_error_magnitude(q, q), 0, atol=1e-3)
  # euler roundtrip for yaw-only
  qz = quat_from_euler_xyz(jnp.zeros(4), jnp.zeros(4),
                           jnp.asarray([0.3, -0.8, 2.0, 3.0]))
  ang = quat_error_magnitude(qz, jnp.tile(jnp.asarray([1., 0, 0, 0]), (4, 1)))
  np.testing.assert_allclose(ang, [0.3, 0.8, 2.0, 3.0], atol=1e-5)
  np.testing.assert_allclose(np.abs(wrap_to_pi(jnp.asarray(3 * np.pi))),
                             np.pi, atol=1e-6)
  np.testing.assert_allclose(wrap_to_pi(jnp.asarray(0.5)), 0.5, atol=1e-6)


def test_get_terms_declaration_order():
  """Term discovery must follow dataclass declaration order (the obs
  concat layout and episode-sum columns depend on it; a hash-ordered set
  here once scrambled observation vectors across processes)."""
  import dataclasses

  from mjlab_tpu.utils.dataclasses import get_terms, term

  @dataclasses.dataclass
  class T:
    x: float = 0.0

  @dataclasses.dataclass
  class Cfg:
    zebra: T = term(T, x=1.0)
    apple: T = term(T, x=2.0)
    mango: T = term(T, x=3.0)
    other: int = 5

  cfg = Cfg()
  assert list(get_terms(cfg, T).keys()) == ['zebra', 'apple', 'mango']
  # injected (non-field) terms come after declared fields
  cfg.banana = T(x=4.0)
  assert list(get_terms(cfg, T).keys()) == ['zebra', 'apple', 'mango',
                                            'banana']
