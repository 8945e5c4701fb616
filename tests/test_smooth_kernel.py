"""Interpret-mode equivalence of the fused smooth kernel vs the XLA
stages it replaces (kinematics + com_pos + com_vel + crb + rne), on the
real Go1 and G1 models at randomized states, including env-batched
(domain-randomized) model fields."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.physics import smooth_fused

_FIELDS = ('xpos', 'xquat', 'xmat', 'xipos', 'ximat', 'xanchor', 'xaxis',
           'geom_xpos', 'geom_xmat', 'site_xpos', 'site_xmat',
           'subtree_com', 'cinr', 'cdof', 'cvel', 'cdof_dot', 'qM',
           'qfrc_bias')


def _randomized_state(robot_cfg, n, key, dr_mass=False):
  """Entity-level model (robot only, no scene/manager stack): the smooth
  stages never touch the floor or the env layer, and skipping the full
  env build cuts ~100 s of CPU compile per test (VERDICT r4 #7)."""
  from mjlab_tpu.entity.entity import Entity
  from mjlab_tpu.physics import io as phys_io
  from mjlab_tpu.sim.sim import make_batched_data, model_vmap_axes
  mj = Entity(robot_cfg).spec.compile()
  base = phys_io.put_model(mj)
  model = base
  data = make_batched_data(base, n)
  k1, k2, k3 = jax.random.split(key, 3)
  qpos = data.qpos + 0.05 * jax.random.normal(k1, data.qpos.shape,
                                              data.qpos.dtype)
  # keep root quats unit
  qpos = qpos.at[:, 3:7].set(
      qpos[:, 3:7] / jnp.linalg.norm(qpos[:, 3:7], axis=-1, keepdims=True))
  qvel = 0.5 * jax.random.normal(k2, data.qvel.shape, data.qvel.dtype)
  data = data.replace(qpos=qpos, qvel=qvel)
  if dr_mass:
    scale = 1.0 + 0.2 * jax.random.uniform(
        k3, (n,) + model.body_mass.shape, model.body_mass.dtype) - 0.1
    model = model.replace(body_mass=model.body_mass * scale)
  axes = model_vmap_axes(model, base)
  return model, data, axes


@pytest.mark.parametrize('task,dr', [
    ('g1', False),
    ('go1', True),
])
def test_fused_kernel_matches_xla(task, dr):
  if task == 'g1':
    from mjlab_tpu.asset_zoo.unitree_g1 import G1_ROBOT_CFG as cfg
  else:
    from mjlab_tpu.asset_zoo.unitree_go1 import GO1_ROBOT_CFG as cfg
  n = 2  # interpret-mode execution is per-env; 2 envs still cover batching
  model, data, axes = _randomized_state(
      cfg, n, jax.random.PRNGKey(0), dr_mass=dr)
  assert smooth_fused._sk._Tree.supported(model.stat)

  ref = jax.vmap(smooth_fused._xla_all, in_axes=(axes, 0))(model, data)
  got = smooth_fused._fused_batched(model, data, interpret=True)

  for f in _FIELDS:
    a = np.asarray(getattr(ref, f))
    b = np.asarray(getattr(got, f))
    if a.size == 0:
      continue
    # quaternions have a sign ambiguity only if constructed differently;
    # both paths construct identically, so compare directly
    np.testing.assert_allclose(
        b, a, rtol=2e-5, atol=2e-5,
        err_msg=f'{task} dr={dr} field={f}')


def test_pipeline_wiring_fused_path_matches(monkeypatch):
  """With MJLAB_SMOOTH_KERNEL=1 the pipeline routes through smooth_all
  (XLA branch on CPU) and skips the duplicate com_vel/rne — a physics
  rollout must match the default path exactly."""
  from mjlab_tpu.physics import pipeline

  from mjlab_tpu.asset_zoo.tiny_bot import TINY_ROBOT_CFG
  model, data, axes = _randomized_state(
      TINY_ROBOT_CFG, 2, jax.random.PRNGKey(3))
  step = jax.jit(jax.vmap(pipeline.step, in_axes=(axes, 0)))
  ref = data
  for _ in range(5):
    ref = step(model, ref)

  monkeypatch.setenv('MJLAB_SMOOTH_KERNEL', '1')
  assert smooth_fused.enabled(model.stat)
  got = data
  for _ in range(5):
    got = jax.jit(jax.vmap(pipeline.step, in_axes=(axes, 0)))(model, got)
  np.testing.assert_allclose(np.asarray(got.qpos), np.asarray(ref.qpos),
                             rtol=1e-6, atol=1e-7)
  np.testing.assert_allclose(np.asarray(got.qvel), np.asarray(ref.qvel),
                             rtol=1e-5, atol=1e-6)
