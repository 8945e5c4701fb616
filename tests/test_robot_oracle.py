"""Full-robot oracle parity: real Unitree G1/Go1 vs CPU MuJoCo.

BASELINE.json config-1 at robot scale (reference analog:
tests/smoke_test.py + per-robot constants tests). Two layers:

1. Re-synced single-step parity: along a 200-step oracle trajectory,
   reset the engine state to the oracle state each step and compare the
   one-step result tightly (1e-9). This checks the dynamics function
   itself, immune to chaotic divergence of contact-rich trajectories.
2. Free-trajectory drift budget: full 300-step rollouts stay within a
   small envelope of the oracle (contact solvers at different round-off
   diverge chaotically; ~1e-7 per-step differences compound).
"""

import dataclasses

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.asset_zoo.unitree_g1 import G1_ROBOT_CFG
from mjlab_tpu.asset_zoo.unitree_go1 import GO1_ROBOT_CFG
from mjlab_tpu.entity.entity import Entity
from mjlab_tpu.physics import io
from mjlab_tpu.physics.pipeline import step

_ITERS = 30


def _robot_scene(cfg):
  """Robot entity + ground plane, Newton solver, oracle settings."""
  entity = Entity(cfg)
  spec = entity.spec
  spec.worldbody.add_geom(
      name='floor', type=mujoco.mjtGeom.mjGEOM_PLANE, size=[10, 10, 0.1])
  mj = spec.compile()
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  mj.opt.iterations = _ITERS
  mj.opt.ls_iterations = 50
  # run the oracle to full iteration count (no early exit) so both
  # solvers are equally converged
  mj.opt.tolerance = 0.0
  model = io.put_model(mj, dtype=jnp.float64, ncon_cap=0)
  model = model.replace(stat=dataclasses.replace(
      model.stat, iterations=_ITERS, ls_iterations=50))
  return mj, model


def _keyframe_reset(mj, md):
  kid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_KEY, 'init_state')
  assert kid >= 0, 'entity keyframe missing'
  mujoco.mj_resetDataKeyframe(mj, md, kid)


def _ctrl_fns(mj, robot_seed):
  kid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_KEY, 'init_state')
  base = mj.key_ctrl[kid].copy()
  rng = np.random.default_rng(robot_seed)
  phases = rng.uniform(0, 2 * np.pi, mj.nu)
  amps = rng.uniform(0.05, 0.15, mj.nu)
  return {
      'hold': lambda t: base,
      'excite': lambda t: base + amps * np.sin(0.02 * t + phases),
  }


@pytest.mark.parametrize('robot', ['g1', 'go1'])
@pytest.mark.parametrize('mode', ['hold', 'excite'])
def test_robot_resynced_step_parity_f64(robot, mode):
  """One engine step == one mj_step from identical states, everywhere
  along a 200-step oracle trajectory with contacts active."""
  cfg = G1_ROBOT_CFG if robot == 'g1' else GO1_ROBOT_CFG
  mj, model = _robot_scene(cfg)
  ctrl_fn = _ctrl_fns(mj, 0)[mode]

  md = mujoco.MjData(mj)
  _keyframe_reset(mj, md)
  d0 = io.make_data(model, dtype=jnp.float64)
  jstep = jax.jit(step)

  worst_qpos = worst_qvel = 0.0
  contact_steps = 0
  for t in range(200):
    ctrl = ctrl_fn(t)
    d = d0.replace(qpos=jnp.asarray(md.qpos.copy()),
                   qvel=jnp.asarray(md.qvel.copy()),
                   qacc_warmstart=jnp.asarray(md.qacc_warmstart.copy()),
                   ctrl=jnp.asarray(ctrl))
    md.ctrl[:] = ctrl
    mujoco.mj_step(mj, md)
    if md.ncon:
      contact_steps += 1
    d = jstep(model, d)
    worst_qpos = max(worst_qpos, float(np.abs(d.qpos - md.qpos).max()))
    worst_qvel = max(worst_qvel, float(np.abs(d.qvel - md.qvel).max()))
  assert contact_steps > 100, 'oracle trajectory had too few contacts'
  assert worst_qpos < 1e-9, f'qpos parity {worst_qpos}'
  assert worst_qvel < 1e-7, f'qvel parity {worst_qvel}'


@pytest.mark.parametrize('robot', ['g1', 'go1'])
def test_robot_trajectory_drift_budget_f64(robot):
  """Free 300-step rollout stays within a small envelope of the oracle
  (chaotic contact divergence bounded, no blowup/NaN)."""
  cfg = G1_ROBOT_CFG if robot == 'g1' else GO1_ROBOT_CFG
  mj, model = _robot_scene(cfg)
  ctrl_fn = _ctrl_fns(mj, 0)['hold']

  md = mujoco.MjData(mj)
  _keyframe_reset(mj, md)
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()),
                qvel=jnp.asarray(md.qvel.copy()))
  jstep = jax.jit(step)
  for t in range(300):
    ctrl = ctrl_fn(t)
    md.ctrl[:] = ctrl
    mujoco.mj_step(mj, md)
    d = jstep(model, d.replace(ctrl=jnp.asarray(ctrl)))
  assert bool(np.isfinite(md.qpos).all())
  assert bool(jnp.all(jnp.isfinite(d.qpos)))
  np.testing.assert_allclose(d.qpos, md.qpos, atol=1e-4)
  np.testing.assert_allclose(d.qvel, md.qvel, atol=1e-3)


def test_g1_f32_drift_budget():
  """f32 engine vs f64 oracle: bounded drift over 50 contact-rich steps."""
  cfg = G1_ROBOT_CFG
  entity = Entity(cfg)
  spec = entity.spec
  spec.worldbody.add_geom(
      name='floor', type=mujoco.mjtGeom.mjGEOM_PLANE, size=[10, 10, 0.1])
  mj = spec.compile()
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  mj.opt.iterations = 10
  mj.opt.ls_iterations = 20
  model = io.put_model(mj, dtype=jnp.float32, ncon_cap=0)
  model = model.replace(stat=dataclasses.replace(
      model.stat, iterations=10, ls_iterations=20))
  md = mujoco.MjData(mj)
  _keyframe_reset(mj, md)
  ctrl = md.ctrl.copy()
  d = io.make_data(model, dtype=jnp.float32)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy(), jnp.float32),
                qvel=jnp.asarray(md.qvel.copy(), jnp.float32),
                ctrl=jnp.asarray(ctrl, jnp.float32))
  jstep = jax.jit(step)
  for _ in range(50):
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
  drift = np.abs(np.asarray(d.qpos, np.float64) - md.qpos).max()
  assert np.isfinite(drift)
  assert drift < 2e-2, f'f32 drift {drift}'
