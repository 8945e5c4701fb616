"""Explicit <pair> element oracle tests.

Predefined contact pairs bypass contype/conaffinity filtering, carry
their own condim/friction/solref/solimp/margin/gap, and suppress the
duplicate dynamically-generated pair (MuJoCo "Collision detection"
semantics; reference relies on plain geom mixing, so this is
general-MJCF parity beyond the reference surface).
"""

import dataclasses

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io
from mjlab_tpu.physics.pipeline import forward, step

FILTERED_XML = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1" contype="0"
          conaffinity="0"/>
    <body name="ball" pos="0.02 -0.01 0.118">
      <freejoint/>
      <geom name="ballg" type="sphere" size="0.12" mass="0.4" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <contact>
    <pair geom1="floor" geom2="ballg" condim="6"
          friction="1.1 1.1 0.008 0.004 0.004"
          solref="0.015 0.8" solimp="0.85 0.98 0.002 0.6 2"
          margin="0.002" gap="0.001"/>
  </contact>
</mujoco>
"""

DEDUP_XML = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="boxb" pos="0 0 0.12" euler="3 2 0">
      <freejoint/>
      <geom name="boxg" type="box" size="0.1 0.08 0.06" mass="0.5"/>
    </body>
  </worldbody>
  <contact>
    <pair geom1="floor" geom2="boxg" condim="3" friction="0.4 0.4 0.005"
          solref="0.01 1"/>
  </contact>
</mujoco>
"""


def _make(xml):
  mj = mujoco.MjModel.from_xml_string(xml)
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  mj.opt.iterations = 30
  mj.opt.ls_iterations = 50
  model = io.put_model(mj, dtype=jnp.float64)
  model = model.replace(stat=dataclasses.replace(
      model.stat, iterations=30, ls_iterations=50))
  return mj, model


def test_pair_bypasses_contype_filter():
  """contype=0 everywhere: only the explicit pair produces candidates,
  with the pair's condim."""
  mj, model = _make(FILTERED_XML)
  s = model.stat
  assert s.pairs.ncon_max >= 1
  assert int(s.con_dim[0]) == 6
  ((g1s, g2s, pids, _, _),) = tuple(s.pairs.groups.values())
  assert (np.asarray(pids) >= 0).all()


def test_pair_params_and_rollout_oracle():
  """Settling/rolling trajectory matches mj_step to f64 precision with
  all pair overrides active (condim 6, custom solref/solimp/margin/gap)."""
  mj, model = _make(FILTERED_XML)
  md = mujoco.MjData(mj)
  md.qvel[:3] = [0.8, -0.3, 0.0]
  md.qvel[3:6] = [0.0, 4.0, 1.0]

  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()),
                qvel=jnp.asarray(md.qvel.copy()))
  jstep = jax.jit(step)
  for _ in range(300):
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
  assert md.ncon >= 1  # the pair actually collided in the oracle
  np.testing.assert_allclose(d.qpos, md.qpos, atol=1e-8)
  np.testing.assert_allclose(d.qvel, md.qvel, atol=1e-8)


def test_pair_contact_params_match_oracle():
  """The active contact carries the pair's friction/solref/solimp
  verbatim (no geom mixing)."""
  mj, model = _make(FILTERED_XML)
  md = mujoco.MjData(mj)
  mujoco.mj_forward(mj, md)
  assert md.ncon == 1
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()))
  d = forward(model, d)
  k = int(np.argmin(np.asarray(d.contact.dist)))
  np.testing.assert_allclose(d.contact.friction[k],
                             md.contact[0].friction, atol=1e-12)
  np.testing.assert_allclose(d.contact.solref[k],
                             md.contact[0].solref, atol=1e-12)
  np.testing.assert_allclose(d.contact.solimp[k],
                             md.contact[0].solimp, atol=1e-12)
  np.testing.assert_allclose(d.contact.includemargin[k],
                             md.contact[0].includemargin, atol=1e-12)


def test_pair_dedups_dynamic_candidate():
  """A geom pair that both passes the dynamic filter and is predefined
  collides ONCE, with pair parameters; rollout matches the oracle."""
  mj, model = _make(DEDUP_XML)
  ((g1s, _, pids, _, _),) = tuple(model.stat.pairs.groups.values())
  assert len(g1s) == 1 and int(pids[0]) == 0

  md = mujoco.MjData(mj)
  md.qvel[:3] = [0.5, 0.1, 0.0]
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()),
                qvel=jnp.asarray(md.qvel.copy()))
  jstep = jax.jit(step)
  for _ in range(250):
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
  np.testing.assert_allclose(d.qpos, md.qpos, atol=1e-8)
  np.testing.assert_allclose(d.qvel, md.qvel, atol=1e-8)


def test_pair_solreffriction_raises():
  xml = DEDUP_XML.replace('solref="0.01 1"',
                          'solref="0.01 1" solreffriction="0.02 1"')
  mj = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match='solreffriction'):
    io.put_model(mj, dtype=jnp.float64)
