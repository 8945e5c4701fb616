"""Actuator activation dynamics (dyntype filter / filterexact /
integrator): oracle parity vs mujoco.mj_step, both integrators.
General-MJCF parity; the reference's PD actuators are stateless."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io, pipeline

XML = """
<mujoco>
  <option timestep="0.002" integrator="{integ}" iterations="30"
          ls_iterations="50"/>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.5">
      <joint name="j1" type="hinge" axis="0 1 0" range="-1.5 1.5"
             damping="0.2"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.25 0 0" mass="0.4"/>
      <body pos="0.25 0 0">
        <joint name="j2" type="slide" axis="1 0 0" range="-0.1 0.1"
               damping="0.1"/>
        <geom type="box" size=".04 .04 .04" mass="0.2"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <general joint="j1" dyntype="filter" dynprm="0.08" gaintype="fixed"
             gainprm="6" biastype="none" ctrlrange="-2 2"
             ctrllimited="true"/>
    <general joint="j2" dyntype="filterexact" dynprm="0.03" gainprm="15"/>
    <general joint="j1" dyntype="integrator" gainprm="0.5"
             actrange="-1 1" actlimited="true"/>
  </actuator>
</mujoco>"""


@pytest.mark.parametrize('integ', ['Euler', 'implicitfast'])
def test_activation_dynamics_parity(integ):
  """filter + filterexact + integrator (with actrange clamp and ctrl
  clamping) match mj_step bitwise on act and ~1e-13 on qpos."""
  mj = mujoco.MjModel.from_xml_string(XML.format(integ=integ))
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  md = mujoco.MjData(mj)
  model = io.put_model(mj, dtype=jnp.float64)
  d = io.make_data(model, dtype=jnp.float64)
  jstep = jax.jit(pipeline.step)
  rng = np.random.default_rng(3)
  maxq = maxa = 0.0
  for _ in range(300):
    ctrl = rng.uniform(-2, 2, size=mj.nu)
    md.ctrl[:] = ctrl
    d = d.replace(ctrl=jnp.asarray(ctrl))
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
    maxq = max(maxq, float(np.abs(np.asarray(d.qpos) - md.qpos).max()))
    maxa = max(maxa, float(np.abs(np.asarray(d.act) - md.act).max()))
  assert maxq < 1e-10, maxq
  assert maxa < 1e-12, maxa


def test_activation_unsupported_gates():
  muscle = """
<mujoco>
  <worldbody>
    <body><joint name="j" type="hinge" range="0 1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.2 0 0" mass="0.1"/>
    </body>
  </worldbody>
  <actuator><muscle joint="j"/></actuator>
</mujoco>"""
  mj = mujoco.MjModel.from_xml_string(muscle)
  with pytest.raises(NotImplementedError):
    io.put_model(mj)
