"""Equality constraint oracle tests: connect / weld / joint vs CPU MuJoCo
(mj_step, Newton solver, float64)."""

import dataclasses

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io
from mjlab_tpu.physics.pipeline import forward, step

CONNECT_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="A" pos="0 0 1">
      <joint type="free"/>
      <geom type="box" size=".1 .05 .05" mass="1"/>
    </body>
    <body name="B" pos="0.3 0.1 1.2" euler="10 5 0">
      <joint type="free"/>
      <geom type="box" size=".08 .04 .04" mass="0.5"/>
    </body>
  </worldbody>
  <equality>
    <connect body1="A" body2="B" anchor="0.1 0.02 0.03"/>
  </equality>
</mujoco>"""

WELD_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="A" pos="0 0 1">
      <joint type="free"/>
      <geom type="box" size=".1 .05 .05" mass="1"/>
    </body>
    <body name="B" pos="0.3 0.1 1.2" euler="10 5 0">
      <joint type="free"/>
      <geom type="box" size=".08 .04 .04" mass="0.5"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="A" body2="B" torquescale="0.7"/>
  </equality>
</mujoco>"""

JOINT_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="C" pos="-0.3 0 1">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size=".02" mass=".2" contype="0" conaffinity="0"/>
    </body>
    <body name="D" pos="-0.6 0 1">
      <joint name="h2" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size=".02" mass=".2" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <joint joint1="h1" joint2="h2" polycoef="0.05 1.5 0.3 0 0"/>
  </equality>
</mujoco>"""

# closed-chain four-bar built from a connect weld: the classic case the
# round-1 engine rejected outright
FOURBAR_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="crank" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size=".02" mass=".3" contype="0" conaffinity="0"/>
      <body name="coupler" pos="0.2 0 0">
        <joint name="j2" type="hinge" axis="0 1 0"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size=".02" mass=".3" contype="0" conaffinity="0"/>
      </body>
    </body>
    <body name="rocker" pos="0.4 0 1">
      <joint name="j3" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.12 0 -0.05" size=".02" mass=".3" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <connect body1="coupler" body2="rocker" anchor="0.3 0 0"/>
  </equality>
</mujoco>"""


def _make(xml, iters=30):
  mj = mujoco.MjModel.from_xml_string(xml)
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  mj.opt.iterations = iters
  mj.opt.ls_iterations = 50
  mj.opt.tolerance = 0.0
  model = io.put_model(mj, dtype=jnp.float64)
  model = model.replace(stat=dataclasses.replace(
      model.stat, iterations=iters, ls_iterations=50))
  return mj, model


@pytest.mark.parametrize('xml', [CONNECT_XML, WELD_XML, JOINT_XML,
                                 FOURBAR_XML],
                         ids=['connect', 'weld', 'joint', 'fourbar'])
def test_equality_forward_parity(xml):
  """Single-call qacc parity from a perturbed state."""
  mj, model = _make(xml)
  md = mujoco.MjData(mj)
  rng = np.random.default_rng(0)
  md.qpos[:] = md.qpos + rng.uniform(-0.05, 0.05, mj.nq)
  md.qvel[:] = rng.uniform(-0.3, 0.3, mj.nv)
  mujoco.mj_forward(mj, md)

  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()),
                qvel=jnp.asarray(md.qvel.copy()))
  d = jax.jit(forward)(model, d)
  np.testing.assert_allclose(np.asarray(d.qacc), md.qacc, atol=5e-7)


@pytest.mark.parametrize('xml', [CONNECT_XML, WELD_XML, JOINT_XML,
                                 FOURBAR_XML],
                         ids=['connect', 'weld', 'joint', 'fourbar'])
def test_equality_trajectory_parity(xml):
  """300-step rollout parity (no contacts -> no chaotic divergence)."""
  mj, model = _make(xml)
  md = mujoco.MjData(mj)
  rng = np.random.default_rng(1)
  md.qvel[:] = rng.uniform(-0.2, 0.2, mj.nv)
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()),
                qvel=jnp.asarray(md.qvel.copy()))
  jstep = jax.jit(step)
  for _ in range(300):
    mujoco.mj_step(mj, md)
    d = jstep(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), md.qvel, atol=1e-7)


def test_unsupported_equality_raises():
  xml = """
<mujoco>
  <worldbody>
    <body><joint name="s1" type="slide" axis="0 0 1"/>
      <geom type="sphere" size=".05" mass="1"/></body>
  </worldbody>
  <tendon><fixed name="t"><joint joint="s1" coef="1"/></fixed></tendon>
  <equality><tendon tendon1="t"/></equality>
</mujoco>"""
  mj = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError):
    io.put_model(mj)


MOCAP_WELD_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="target" mocap="true" pos="0.3 0.1 1.2">
      <geom type="sphere" size="0.03" contype="0" conaffinity="0"/>
    </body>
    <body name="box" pos="0.3 0.1 1.0">
      <joint type="free"/>
      <geom type="box" size=".06 .04 .04" mass="0.4"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="target" body2="box" torquescale="1.0"/>
  </equality>
</mujoco>"""


def test_mocap_weld_target_parity():
  """Mocap body driving a welded floating box (the interactive-target
  pattern): trajectory parity while the mocap pose is moved."""
  mj, model = _make(MOCAP_WELD_XML)
  md = mujoco.MjData(mj)
  d = io.make_data(model, dtype=jnp.float64)
  jstep = jax.jit(step)
  for t in range(200):
    target = np.asarray([0.3 + 0.2 * np.sin(0.02 * t),
                         0.1, 1.2 + 0.1 * np.cos(0.02 * t)])
    md.mocap_pos[0] = target
    mujoco.mj_step(mj, md)
    d = d.replace(mocap_pos=jnp.asarray(target)[None])
    d = jstep(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=1e-8)
  # the box actually tracked the moving target (soft weld lags a little)
  assert abs(float(d.qpos[0]) - (0.3 + 0.2 * np.sin(0.02 * 199))) < 0.12


def test_mocap_kinematics_parity():
  """Mocap body pose flows from data.mocap_pos/quat into FK."""
  xml = """
<mujoco>
  <worldbody>
    <body name="m" mocap="true" pos="0.5 0.2 1.0">
      <geom type="sphere" size="0.03" contype="0" conaffinity="0"/>
      <site name="tip" pos="0.1 0 0"/>
    </body>
    <body pos="0 0 1"><freejoint/><geom type="sphere" size="0.1" mass="1"/></body>
    <geom type="plane" size="5 5 .1"/>
  </worldbody>
</mujoco>"""
  mj, model = _make(xml)
  md = mujoco.MjData(mj)
  md.mocap_pos[0] = [1.0, -0.5, 2.0]
  md.mocap_quat[0] = [0.7071068, 0.7071068, 0, 0]
  mujoco.mj_forward(mj, md)
  from mjlab_tpu.physics import kinematics
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(mocap_pos=jnp.asarray(md.mocap_pos.copy()),
                mocap_quat=jnp.asarray(md.mocap_quat.copy()))
  d = kinematics.kinematics(model, d)
  bid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, 'm')
  np.testing.assert_allclose(np.asarray(d.xpos[bid]), md.xpos[bid],
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.xquat[bid]), md.xquat[bid],
                             atol=1e-9)
