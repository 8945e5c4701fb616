"""Tendon support: fixed (joint-coupling) and spatial (site-chain)
tendons with limits, deadband springs, dampers, and tendon actuator
transmission — oracle parity vs mujoco.mj_step (general-MJCF parity
surface; the reference robots use none, VERDICT round-1 missing #8)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io, pipeline

TENDON_XML = """
<mujoco>
  <option timestep="0.002" integrator="Euler" iterations="30"
          ls_iterations="50"/>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.5">
      <joint name="j1" type="hinge" axis="0 1 0" range="-1.5 1.5"
             damping="0.1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.2 0 0" mass="0.3"/>
      <site name="s1" pos="0.2 0 0.03"/>
      <body pos="0.2 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-2 2"
               damping="0.05"/>
        <geom type="capsule" size="0.025" fromto="0 0 0 0.15 0 0"
              mass="0.2"/>
        <site name="s2" pos="0.15 0 0.025"/>
      </body>
    </body>
    <site name="anchor" pos="0.1 0 0.8"/>
    <body pos="0.5 0 0.1">
      <freejoint/>
      <geom type="box" size=".05 .05 .05" mass="0.4"/>
    </body>
  </worldbody>
  <tendon>
    <fixed name="couple" limited="true" range="-0.5 0.5" stiffness="2.0"
           damping="0.1">
      <joint joint="j1" coef="1.0"/>
      <joint joint="j2" coef="-0.5"/>
    </fixed>
    <spatial name="cable" limited="true" range="0 0.75" stiffness="10"
             damping="0.2" springlength="0.3 0.5">
      <site site="anchor"/>
      <site site="s1"/>
      <site site="s2"/>
    </spatial>
  </tendon>
  <actuator>
    <motor tendon="cable" gear="1.5" ctrlrange="-5 5" ctrllimited="true"/>
    <position joint="j1" kp="3"/>
  </actuator>
</mujoco>"""


def _run_parity(xml, steps=300, ctrl_scale=2.0, seed=2):
  mj = mujoco.MjModel.from_xml_string(xml)
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  md = mujoco.MjData(mj)
  model = io.put_model(mj, dtype=jnp.float64)
  d = io.make_data(model, dtype=jnp.float64)
  jstep = jax.jit(pipeline.step)
  rng = np.random.default_rng(seed)
  maxerr = 0.0
  for _ in range(steps):
    ctrl = rng.uniform(-ctrl_scale, ctrl_scale, size=mj.nu)
    md.ctrl[:] = ctrl
    d = d.replace(ctrl=jnp.asarray(ctrl))
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
    maxerr = max(maxerr,
                 float(np.abs(np.asarray(d.qpos) - md.qpos).max()))
  return maxerr, d, md


def test_tendon_rollout_parity():
  """Fixed + spatial tendons, limits, deadband spring/damper, tendon
  actuator, plus floor contacts: 300-step random-ctrl trajectory parity."""
  maxerr, d, md = _run_parity(TENDON_XML)
  assert maxerr < 1e-8, maxerr
  np.testing.assert_allclose(np.asarray(d.ten_length), md.ten_length,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.ten_velocity), md.ten_velocity,
                             atol=1e-8)


def test_tendon_limit_engages():
  """Strong actuator pull drives the cable to its limit; the limit
  constraint holds the length near the range edge (and matches MuJoCo)."""
  mj = mujoco.MjModel.from_xml_string(TENDON_XML)
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  md = mujoco.MjData(mj)
  model = io.put_model(mj, dtype=jnp.float64)
  d = io.make_data(model, dtype=jnp.float64)
  jstep = jax.jit(pipeline.step)
  for _ in range(500):
    md.ctrl[:] = [-5.0, 0.0]  # winch the cable in hard
    d = d.replace(ctrl=jnp.asarray([-5.0, 0.0]))
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
  err = float(np.abs(np.asarray(d.qpos) - md.qpos).max())
  assert err < 1e-7, err
  assert float(d.ten_length[1]) < 0.76  # limit respected (range hi 0.75)


def test_tendon_unsupported_gates():
  wrap_xml = """
<mujoco>
  <worldbody>
    <site name="a" pos="0 0 1"/>
    <geom name="cyl" type="cylinder" size="0.05 0.2" pos="0.2 0 0.5"/>
    <body pos="0.4 0 0.2"><freejoint/>
      <geom type="sphere" size="0.05" mass="0.1"/>
      <site name="b" pos="0 0 0"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t">
      <site site="a"/>
      <geom geom="cyl"/>
      <site site="b"/>
    </spatial>
  </tendon>
</mujoco>"""
  mj = mujoco.MjModel.from_xml_string(wrap_xml)
  with pytest.raises(NotImplementedError):
    io.put_model(mj)

  implicit_xml = TENDON_XML.replace('integrator="Euler"',
                                    'integrator="implicitfast"')
  mj2 = mujoco.MjModel.from_xml_string(implicit_xml)
  with pytest.raises(NotImplementedError):
    io.put_model(mj2)


def test_tendon_deadband_spring():
  """Spring force only outside [springlength0, springlength1]: a hanging
  mass on a slack cable matches the oracle through engage/disengage."""
  xml = """
<mujoco>
  <option timestep="0.002" iterations="30" ls_iterations="50"/>
  <worldbody>
    <site name="top" pos="0 0 1"/>
    <body pos="0 0 0.7">
      <joint type="slide" axis="0 0 1" damping="0.5"/>
      <geom type="sphere" size="0.05" mass="0.5"/>
      <site name="bob" pos="0 0 0"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="spring" stiffness="200" damping="2"
             springlength="0.2 0.4">
      <site site="top"/>
      <site site="bob"/>
    </spatial>
  </tendon>
</mujoco>"""
  maxerr, d, md = _run_parity(xml, steps=400, ctrl_scale=0.0)
  assert maxerr < 1e-9, maxerr
  # the mass settles with the cable stretched past the deadband
  assert float(d.ten_length[0]) > 0.4
