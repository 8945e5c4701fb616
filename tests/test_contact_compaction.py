"""Contact compaction: the runtime top-K constraint assembly must agree
with the full static assembly whenever the cap covers every active
contact (the TPU analog of the reference's nconmax pool, reference
src/mjlab/sim/sim.py:87-88)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io as pio
from mjlab_tpu.physics import pipeline


def _many_contact_model():
  """A pile of spheres + boxes over a plane with self-collisions: large
  candidate pair table, few simultaneously-active contacts."""
  spec = mujoco.MjSpec()
  spec.worldbody.add_geom(type=mujoco.mjtGeom.mjGEOM_PLANE,
                          size=[5, 5, 0.1], name='floor')
  rng = np.random.default_rng(0)
  for i in range(8):
    b = spec.worldbody.add_body(
        name=f'b{i}', pos=[rng.uniform(-0.6, 0.6), rng.uniform(-0.6, 0.6),
                           0.3 + 0.25 * i])
    b.add_joint(type=mujoco.mjtJoint.mjJNT_FREE)
    if i % 3 == 2:
      b.add_geom(name=f'g{i}', type=mujoco.mjtGeom.mjGEOM_BOX,
                 size=[0.08, 0.06, 0.05], mass=0.3)
    else:
      b.add_geom(name=f'g{i}', type=mujoco.mjtGeom.mjGEOM_SPHERE,
                 size=[0.08, 0, 0], mass=0.2)
  spec.option.timestep = 0.005
  return spec.compile()


def _rollout(model, steps=120):
  d = pio.make_data(model, dtype=jnp.float64)
  step = jax.jit(lambda dd: pipeline.step(model, dd))
  for _ in range(steps):
    d = step(d)
  return d


def test_compacted_matches_full():
  mj = _many_contact_model()
  full = pio.put_model(mj, dtype=jnp.float64, ncon_cap=0)
  assert full.stat.ncon_cap == 0
  ncand = full.stat.pairs.ncon_max
  assert ncand > 30  # self-collision table is meaningfully large
  # cap generously above the simultaneously-active count
  comp = pio.put_model(mj, dtype=jnp.float64, ncon_cap=min(48, ncand - 1))
  assert comp.stat.ncon_cap > 0

  d_full = _rollout(full)
  d_comp = _rollout(comp)
  assert bool(jnp.isfinite(d_comp.qpos).all())
  np.testing.assert_allclose(np.asarray(d_comp.qpos),
                             np.asarray(d_full.qpos), atol=1e-6)
  np.testing.assert_allclose(np.asarray(d_comp.qvel),
                             np.asarray(d_full.qvel), atol=1e-5)


def test_auto_cap_threshold():
  mj = _many_contact_model()
  auto = pio.put_model(mj, dtype=jnp.float64)  # large table -> compacted
  assert auto.stat.ncon_cap == 64 or auto.stat.pairs.ncon_max <= 64

  # small model: no compaction
  spec = mujoco.MjSpec()
  spec.worldbody.add_geom(type=mujoco.mjtGeom.mjGEOM_PLANE,
                          size=[5, 5, 0.1])
  b = spec.worldbody.add_body(pos=[0, 0, 1])
  b.add_joint(type=mujoco.mjtJoint.mjJNT_FREE)
  b.add_geom(type=mujoco.mjtGeom.mjGEOM_SPHERE, size=[0.1, 0, 0], mass=1)
  small = pio.put_model(spec.compile())
  assert small.stat.ncon_cap == 0


def test_condim1_equivalence():
  """Frictionless contacts through the compacted +/- normal-pair rows
  match the single-row formulation."""
  spec = mujoco.MjSpec()
  spec.worldbody.add_geom(type=mujoco.mjtGeom.mjGEOM_PLANE,
                          size=[5, 5, 0.1], name='floor', condim=1)
  for i in range(4):
    # staggered heights: at most 3 spheres touch within the horizon
    b = spec.worldbody.add_body(name=f'b{i}', pos=[0.3 * i, 0,
                                                   0.15 + 0.25 * i])
    b.add_joint(type=mujoco.mjtJoint.mjJNT_FREE)
    b.add_geom(name=f'g{i}', type=mujoco.mjtGeom.mjGEOM_SPHERE,
               size=[0.1, 0, 0], mass=0.5, condim=1)
  spec.option.timestep = 0.005
  mj = spec.compile()
  full = pio.put_model(mj, dtype=jnp.float64, ncon_cap=0)
  comp = pio.put_model(mj, dtype=jnp.float64, ncon_cap=3)
  # only 4 plane contacts possible; cap 3 < 4 would drop one when all
  # touch, so compare while at most 3 are in contact (staggered drops)
  d_full = _rollout(full, steps=60)
  d_comp = _rollout(comp, steps=60)
  np.testing.assert_allclose(np.asarray(d_comp.qpos),
                             np.asarray(d_full.qpos), atol=1e-6)

def test_mixed_pool_equivalence():
  """Split-pool compaction (frictional + frictionless pools with separate
  top-K selections and row structures) matches the full assembly on a
  mixed-condim scene."""
  spec = mujoco.MjSpec()
  spec.worldbody.add_geom(type=mujoco.mjtGeom.mjGEOM_PLANE,
                          size=[5, 5, 0.1], name='floor')
  rng = np.random.default_rng(3)
  for i in range(6):
    b = spec.worldbody.add_body(
        name=f'b{i}', pos=[rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5),
                           0.25 + 0.22 * i])
    b.add_joint(type=mujoco.mjtJoint.mjJNT_FREE)
    # alternate frictional boxes and frictionless spheres
    if i % 2:
      b.add_geom(name=f'g{i}', type=mujoco.mjtGeom.mjGEOM_BOX,
                 size=[0.08, 0.06, 0.05], mass=0.3, condim=3)
    else:
      b.add_geom(name=f'g{i}', type=mujoco.mjtGeom.mjGEOM_SPHERE,
                 size=[0.08, 0, 0], mass=0.2, condim=1)
  spec.option.timestep = 0.005
  mj = spec.compile()
  full = pio.put_model(mj, dtype=jnp.float64, ncon_cap=0)
  ncand = full.stat.pairs.ncon_max
  comp = pio.put_model(mj, dtype=jnp.float64, ncon_cap=min(32, ncand - 1))
  assert comp.stat.ncon_cap > 0 and comp.stat.ncon_cap1 > 0

  d_full = _rollout(full, steps=100)
  d_comp = _rollout(comp, steps=100)
  assert bool(jnp.isfinite(d_comp.qpos).all())
  np.testing.assert_allclose(np.asarray(d_comp.qpos),
                             np.asarray(d_full.qpos), atol=1e-6)


def test_contact_force_sensor_equivalence():
  """contact_force must decode the compacted efc rows and scatter them back
  to candidate-slot indices (what contact sensors address)."""
  from mjlab_tpu.physics import sensor as psensor
  mj = _many_contact_model()
  full = pio.put_model(mj, dtype=jnp.float64, ncon_cap=0)
  comp = pio.put_model(mj, dtype=jnp.float64,
                       ncon_cap=min(48, full.stat.pairs.ncon_max - 1))
  d_full = _rollout(full, steps=60)
  d_comp = _rollout(comp, steps=60)
  f_full = np.asarray(psensor.contact_force(full, d_full))
  f_comp = np.asarray(psensor.contact_force(comp, d_comp))
  assert np.abs(f_full).max() > 1e-3  # something is actually in contact
  np.testing.assert_allclose(f_comp, f_full, atol=1e-6)
