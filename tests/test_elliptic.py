"""Elliptic friction cone oracle parity (reference option surface:
src/mjlab/sim/sim.py:42-82 accepts cone='elliptic'; the solver cost is
MuJoCo's elliptic-cone Newton formulation, extracted empirically from
mj_constraintUpdate — see scratch/probe_elliptic*.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io, pipeline, sensor
from mjlab_tpu.physics.solver import _elliptic_forces

MIXED_XML = """
<mujoco>
  <option cone="elliptic" impratio="1.5" timestep="0.002" iterations="30"
          ls_iterations="50"/>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0.0 0 0.15">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1" condim="4"
            friction="0.7 0.08 .001"/>
    </body>
    <body pos="0.25 0 0.4" euler="15 5 0">
      <freejoint/>
      <geom type="box" size=".08 .06 .05" mass="0.5" condim="3"
            friction="0.9"/>
    </body>
    <body pos="-0.3 0 0.2">
      <freejoint/>
      <geom type="sphere" size="0.06" mass="0.2" condim="1"/>
    </body>
  </worldbody>
</mujoco>"""


def _mj(xml):
  m = mujoco.MjModel.from_xml_string(xml)
  m.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  return m


def _rollout(mj, model, steps):
  md = mujoco.MjData(mj)
  d = io.make_data(model, dtype=jnp.float64)
  jstep = jax.jit(pipeline.step)
  maxerr = 0.0
  for _ in range(steps):
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
    maxerr = max(maxerr,
                 float(np.abs(np.asarray(d.qpos) - md.qpos).max()))
  return maxerr, d, md


def test_elliptic_zone_formulas_vs_constraint_update():
  """The zone cost/force formulas match mj_constraintUpdate to ~1e-13
  for anisotropic friction, impratio != 1, and condim 3/4/6."""
  for condim, friction, impratio in [
      (3, '1 .005 .0001', 1.0),
      (3, '0.6 .005 .0001', 4.0),
      (4, '0.7 0.12 .0001', 2.0),
      (6, '0.9 0.1 0.05', 3.0)]:
    xml = f"""
<mujoco>
  <option cone="elliptic" impratio="{impratio}" timestep="0.002">
    <flag frictionloss="disable"/>
  </option>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.095">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1" condim="{condim}"
            friction="{friction}"/>
    </body>
  </worldbody>
</mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    con = d.contact[0]
    dim = condim
    fr = jnp.asarray(np.array(con.friction)[None, :dim - 1], jnp.float64)
    mu = jnp.asarray([con.mu], jnp.float64)
    xD = jnp.asarray(d.efc_D[None, :dim], jnp.float64)
    act = jnp.asarray([True])
    rng = np.random.default_rng(1)
    cost = np.zeros(1)
    for _ in range(50):
      jar_c = rng.normal(size=dim) * rng.choice([0.05, 0.5, 3.0])
      jar = np.zeros(d.nefc)
      jar[:dim] = jar_c
      mujoco.mj_constraintUpdate(m, d, jar, cost, 0)
      f, c = _elliptic_forces(jnp.asarray(jar_c[None]), xD, mu, fr, act)
      np.testing.assert_allclose(np.asarray(f[0]), d.efc_force[:dim],
                                 atol=1e-10)
      np.testing.assert_allclose(float(c), cost[0], atol=1e-10)


def test_elliptic_mixed_condim_trajectory_parity():
  """300-step rollout, condim 1/3/4 mix, anisotropic friction,
  impratio=1.5: machine-precision parity vs mj_step."""
  mj = _mj(MIXED_XML)
  model = io.put_model(mj, dtype=jnp.float64)
  maxerr, d, md = _rollout(mj, model, 300)
  assert maxerr < 1e-8, maxerr

  # contact-force decode parity (mj_contactForce analog, elliptic rows
  # are contact-frame forces directly)
  cf = np.asarray(sensor.contact_force(model, d))
  s = model.stat
  ours = {}
  for c in range(s.pairs.ncon_max):
    key = (int(s.con_geom1[c]), int(s.con_geom2[c]))
    if np.abs(cf[c]).sum() > 1e-9:
      ours.setdefault(key, []).append(cf[c][:4])
  for i in range(md.ncon):
    out = np.zeros(6)
    mujoco.mj_contactForce(mj, md, i, out)
    key = (int(md.contact.geom1[i]), int(md.contact.geom2[i]))
    cand = ours.get(key, []) + ours.get((key[1], key[0]), [])
    best = min((np.abs(np.asarray(x) - out[:4]).max() for x in cand),
               default=np.inf)
    assert best < 1e-8, (key, out[:4], cand)


def test_elliptic_condim6_torsional_rolling():
  xml = MIXED_XML.replace('condim="4"', 'condim="6"').replace(
      'friction="0.7 0.08 .001"', 'friction="0.7 0.1 0.05"')
  mj = _mj(xml)
  model = io.put_model(mj, dtype=jnp.float64)
  maxerr, _, _ = _rollout(mj, model, 300)
  assert maxerr < 1e-8, maxerr


def test_elliptic_compacted_equivalence():
  """Compacted elliptic block (cap below pool size but covering all
  active contacts) matches the oracle trajectory."""
  xml = MIXED_XML.replace(
      '<body pos="-0.3 0 0.2">',
      '<body pos="2.0 2.0 3.0">')  # third body airborne: inactive slots
  mj = _mj(xml)
  model = io.put_model(mj, dtype=jnp.float64, ncon_cap=6)
  s = model.stat
  assert s.ncon_cap and s.ncon_cap < s.pairs.ncon_max
  maxerr, _, _ = _rollout(mj, model, 150)
  assert maxerr < 1e-8, maxerr


def test_elliptic_sliding_friction_direction():
  """A sphere shoved sideways on a frictional floor decelerates along
  the slip direction (middle-zone forces) and stops; elliptic cone with
  anisotropic friction decelerates faster along the high-mu axis."""
  xml = """
<mujoco>
  <option cone="elliptic" timestep="0.002" iterations="30"
          ls_iterations="50"/>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.1">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1" condim="3" friction="0.4"/>
    </body>
  </worldbody>
</mujoco>"""
  mj = _mj(xml)
  model = io.put_model(mj, dtype=jnp.float64)
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qvel=d.qvel.at[0].set(2.0))
  md = mujoco.MjData(mj)
  md.qvel[0] = 2.0
  jstep = jax.jit(pipeline.step)
  maxerr = 0.0
  for _ in range(400):
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
    maxerr = max(maxerr,
                 float(np.abs(np.asarray(d.qpos) - md.qpos).max()))
  assert maxerr < 1e-8, maxerr
  # slide friction converts the slip into rolling: contact-point slip
  # velocity v_x - omega_y * r -> 0 while the ball keeps rolling
  slip = float(d.qvel[0] - d.qvel[4] * 0.1)
  assert abs(slip) < 0.01, slip  # soft contact keeps a tiny creep
  assert float(d.qvel[0]) > 0.5  # still rolling (no rolling friction)
