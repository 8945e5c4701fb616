"""Oracle tests: kinematics + smooth dynamics vs CPU MuJoCo (mj_forward).

Mirrors the reference's strategy of validating the batched engine against
the trusted single-env implementation (reference tests use CPU Warp as the
fake backend; here CPU MuJoCo itself is the oracle)."""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io, kinematics, smooth

ARTICULATED_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom type="plane" size="10 10 0.1"/>
    <body name="base" pos="0 0 1">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="2"/>
      <site name="imu" pos="0.05 0 0.02"/>
      <body name="thigh" pos="0.2 0.05 -0.1" quat="0.96 0.1 0.2 0.1">
        <joint name="hip" type="hinge" axis="0.2 0.9 0.1" pos="0.01 0.02 0.03"
               range="-1 1" damping="0.1" armature="0.02" stiffness="4"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.04" mass="1.2"/>
        <body name="shin" pos="0 0 -0.35">
          <joint name="knee" type="hinge" axis="0 1 0" range="-2.2 -0.2"
                 ref="-0.5" damping="0.2"/>
          <geom type="capsule" fromto="0 0 0 0 0 -0.28" size="0.03" mass="0.7"/>
          <body name="foot" pos="0 0 -0.3">
            <joint name="ankle" type="slide" axis="0 0 1" range="-0.05 0.05"
                   stiffness="100"/>
            <geom type="sphere" size="0.045" mass="0.2"/>
          </body>
        </body>
      </body>
      <body name="arm" pos="-0.1 -0.05 0.1">
        <joint name="shoulder" type="ball"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.03" mass="0.5"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position joint="hip" kp="30" kv="1.5" ctrlrange="-1 1" forcerange="-20 20"/>
    <position joint="knee" kp="25" kv="1.0" ctrlrange="-2.2 -0.2" forcerange="-20 20"/>
    <motor joint="ankle" gear="2" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

PENDULUM_XML = """
<mujoco>
  <worldbody>
    <body pos="0 0 2">
      <joint name="pin" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.5 0 0" size="0.02" mass="0.3"/>
      <body pos="0.5 0 0">
        <joint name="pin2" type="hinge" axis="0 1 0"/>
        <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.02" mass="0.2"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _random_state(mj, seed):
  rng = np.random.default_rng(seed)
  qpos = mj.qpos0.copy()
  for j in range(mj.njnt):
    adr = mj.jnt_qposadr[j]
    t = mj.jnt_type[j]
    if t == mujoco.mjtJoint.mjJNT_FREE:
      qpos[adr:adr + 3] = rng.uniform(-0.5, 0.5, 3) + [0, 0, 1]
      q = rng.normal(size=4)
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
    elif t == mujoco.mjtJoint.mjJNT_BALL:
      q = rng.normal(size=4)
      qpos[adr:adr + 4] = q / np.linalg.norm(q)
    else:
      qpos[adr] = rng.uniform(-0.7, 0.7)
  qvel = rng.uniform(-1, 1, mj.nv)
  ctrl = rng.uniform(-1, 1, mj.nu)
  return qpos, qvel, ctrl


def _forward_ours(mj, qpos, qvel, ctrl):
  model = io.put_model(mj, dtype=jnp.float64)
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                ctrl=jnp.asarray(ctrl))
  d = kinematics.kinematics(model, d)
  d = kinematics.com_pos(model, d)
  d = kinematics.com_vel(model, d)
  d = smooth.crb(model, d)
  d = smooth.rne(model, d)
  d = smooth.passive(model, d)
  d = smooth.transmission(model, d)
  d = smooth.actuation(model, d)
  d = smooth.fwd_smooth(model, d)
  return model, d


@pytest.mark.parametrize('xml', [ARTICULATED_XML, PENDULUM_XML])
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_smooth_pipeline_matches_mujoco(xml, seed):
  mj = mujoco.MjModel.from_xml_string(xml)
  md = mujoco.MjData(mj)
  qpos, qvel, ctrl = _random_state(mj, seed)
  md.qpos[:] = qpos
  md.qvel[:] = qvel
  md.ctrl[:] = ctrl
  mujoco.mj_forward(mj, md)

  _, d = _forward_ours(mj, qpos, qvel, ctrl)

  np.testing.assert_allclose(d.xpos, md.xpos, atol=1e-12)
  np.testing.assert_allclose(d.xmat, md.xmat.reshape(-1, 3, 3), atol=1e-12)
  np.testing.assert_allclose(d.xipos, md.xipos, atol=1e-12)
  np.testing.assert_allclose(d.geom_xpos, md.geom_xpos, atol=1e-12)
  np.testing.assert_allclose(d.subtree_com, md.subtree_com, atol=1e-12)
  np.testing.assert_allclose(d.cdof, md.cdof, atol=1e-12)
  np.testing.assert_allclose(d.cvel, md.cvel, atol=1e-12)
  np.testing.assert_allclose(d.cdof_dot, md.cdof_dot, atol=1e-12)

  fullM = np.zeros((mj.nv, mj.nv))
  mujoco.mj_fullM(mj, md, fullM)
  np.testing.assert_allclose(d.qM, fullM, atol=1e-12)
  np.testing.assert_allclose(d.qfrc_bias, md.qfrc_bias, atol=1e-11)
  np.testing.assert_allclose(d.qfrc_passive, md.qfrc_passive, atol=1e-12)
  np.testing.assert_allclose(d.actuator_force, md.actuator_force, atol=1e-11)
  np.testing.assert_allclose(d.qfrc_actuator, md.qfrc_actuator, atol=1e-11)
  np.testing.assert_allclose(d.qacc_smooth, md.qacc_smooth, atol=1e-9)


def test_xfrc_applied_maps_to_qfrc():
  mj = mujoco.MjModel.from_xml_string(ARTICULATED_XML)
  md = mujoco.MjData(mj)
  qpos, qvel, _ = _random_state(mj, 3)
  md.qpos[:] = qpos
  md.qvel[:] = qvel
  rng = np.random.default_rng(4)
  xfrc = rng.uniform(-5, 5, (mj.nbody, 6))
  xfrc[0] = 0
  md.xfrc_applied[:] = xfrc
  mujoco.mj_forward(mj, md)

  model = io.put_model(mj, dtype=jnp.float64)
  d = io.make_data(model, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                xfrc_applied=jnp.asarray(xfrc))
  d = kinematics.kinematics(model, d)
  d = kinematics.com_pos(model, d)
  d = kinematics.com_vel(model, d)
  d = smooth.crb(model, d)
  d = smooth.rne(model, d)
  d = smooth.passive(model, d)
  d = smooth.transmission(model, d)
  d = smooth.actuation(model, d)
  d = smooth.fwd_smooth(model, d)
  np.testing.assert_allclose(d.qacc_smooth, md.qacc_smooth, atol=1e-9)
