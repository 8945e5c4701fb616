"""Asset regression tests (reference tests/test_g1_constants.py /
test_go1_constants.py analog): compile invariants, actuator gains,
keyframes, collision setup."""

import math

import mujoco
import numpy as np
import pytest

from mjlab_tpu.asset_zoo import unitree_g1, unitree_go1
from mjlab_tpu.entity.entity import Entity


@pytest.fixture(scope='module')
def go1():
  e = Entity(unitree_go1.GO1_ROBOT_CFG)
  return e, e.spec.compile()


@pytest.fixture(scope='module')
def g1():
  e = Entity(unitree_g1.G1_ROBOT_CFG)
  return e, e.spec.compile()


def test_go1_sizes(go1):
  e, m = go1
  assert m.nu == 12
  assert m.nv == 18
  assert len(e.joint_names) == 12
  assert 10.0 < m.body_subtreemass[1] < 14.0  # ~12 kg


def test_go1_actuator_gains(go1):
  _, m = go1
  omega = 2 * math.pi * 10
  arm_hip = unitree_go1.ROTOR_INERTIA * unitree_go1.HIP_GEAR_RATIO ** 2
  kp_hip = arm_hip * omega ** 2
  i = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, 'FL_hip_joint')
  np.testing.assert_allclose(m.actuator_gainprm[i, 0], kp_hip, rtol=1e-6)
  np.testing.assert_allclose(m.actuator_biasprm[i, 1], -kp_hip, rtol=1e-6)
  # armature applied on the joint
  j = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, 'FL_hip_joint')
  np.testing.assert_allclose(m.dof_armature[m.jnt_dofadr[j]], arm_hip,
                             rtol=1e-6)
  # force range
  np.testing.assert_allclose(m.actuator_forcerange[i], [-23.7, 23.7])


def test_go1_feet_only_collision(go1):
  _, m = go1
  for g in range(m.ngeom):
    name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g) or ''
    if name.endswith('_foot_collision'):
      assert m.geom_conaffinity[g] == 1
      assert m.geom_condim[g] == 3
      assert m.geom_priority[g] == 1
      np.testing.assert_allclose(m.geom_friction[g, 0], 0.6)
    else:
      assert m.geom_contype[g] == 0 and m.geom_conaffinity[g] == 0, name


def test_g1_sizes(g1):
  e, m = g1
  assert m.nu == 29
  assert len(e.joint_names) == 29
  assert 30.0 < m.body_subtreemass[1] < 40.0  # ~35 kg


def test_g1_actuator_groups(g1):
  _, m = g1
  kp_5020, _ = unitree_g1.ACTUATOR_5020.pd_gains()
  i = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR,
                        'left_elbow_joint')
  np.testing.assert_allclose(m.actuator_gainprm[i, 0], kp_5020, rtol=1e-6)
  # ankle = 2x 5020 (parallel linkage)
  i = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR,
                        'left_ankle_pitch_joint')
  np.testing.assert_allclose(m.actuator_gainprm[i, 0], 2 * kp_5020,
                             rtol=1e-6)
  # knee = 7520-22
  kp_k, _ = unitree_g1.ACTUATOR_7520_22.pd_gains()
  i = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, 'right_knee_joint')
  np.testing.assert_allclose(m.actuator_gainprm[i, 0], kp_k, rtol=1e-6)
  np.testing.assert_allclose(m.actuator_forcerange[i], [-139, 139])


def test_g1_action_scale_dict():
  scale = unitree_g1.G1_ACTION_SCALE
  kp, _ = unitree_g1.ACTUATOR_5020.pd_gains()
  np.testing.assert_allclose(scale['.*_elbow_joint'], 0.25 * 25.0 / kp)


def test_entity_find_api(go1):
  e, _ = go1
  ids, names = e.find_joints(['FL_.*'])
  assert names == ['FL_hip_joint', 'FL_thigh_joint', 'FL_calf_joint']
  ids, names = e.find_geoms(['.*_foot_collision'])
  assert len(names) == 4
  assert e.is_actuated and e.is_articulated and not e.is_fixed_base
