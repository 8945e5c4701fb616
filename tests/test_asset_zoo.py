"""Asset regression tests (reference tests/test_g1_constants.py /
test_go1_constants.py analog): compile invariants, actuator gains,
keyframes, collision setup, real-robot description fidelity."""

import math
import re

import mujoco
import numpy as np
import pytest

from mjlab_tpu.asset_zoo import unitree_g1, unitree_go1
from mjlab_tpu.entity.entity import Entity

_G1_FOOT = r'^(left|right)_foot[1-7]_collision$'
_GO1_FOOT = r'^[FR][LR]_foot_collision$'


@pytest.fixture(scope='module')
def go1():
  e = Entity(unitree_go1.GO1_ROBOT_CFG)
  return e, e.spec.compile()


@pytest.fixture(scope='module')
def g1():
  e = Entity(unitree_g1.G1_ROBOT_CFG)
  return e, e.spec.compile()


# ---------------------------------------------------------------------------
# Sizes and real-description fidelity.
# ---------------------------------------------------------------------------

def test_go1_sizes(go1):
  e, m = go1
  assert m.nu == 12
  assert m.nv == 18
  assert len(e.joint_names) == 12
  # Real Go1 description: total mass 12.743448 kg (trunk 5.204).
  np.testing.assert_allclose(m.body_subtreemass[1], 12.743448, rtol=1e-6)
  trunk = m.body('trunk')
  np.testing.assert_allclose(trunk.mass, 5.204, rtol=1e-6)


def test_g1_sizes(g1):
  e, m = g1
  assert m.nu == 29
  assert m.nv == 35
  assert len(e.joint_names) == 29
  # Real G1 description: total mass 33.341142 kg.
  np.testing.assert_allclose(m.body_subtreemass[1], 33.341142, rtol=1e-6)


def test_g1_real_inertials(g1):
  """Spot-check real link inertials vs the published G1 description."""
  _, m = g1
  pelvis = m.body('pelvis')
  np.testing.assert_allclose(pelvis.mass, 3.813, rtol=1e-6)
  np.testing.assert_allclose(pelvis.ipos, [0, 0, -0.07605], atol=1e-9)
  torso = m.body('torso_link')
  np.testing.assert_allclose(torso.mass, 7.818, rtol=1e-6)
  np.testing.assert_allclose(
      torso.inertia, [0.121847, 0.109825, 0.0273735], rtol=1e-6)
  knee = m.joint('left_knee_joint')
  np.testing.assert_allclose(knee.range, [-0.087267, 2.8798], rtol=1e-6)
  ankle = m.joint('left_ankle_roll_joint')
  np.testing.assert_allclose(ankle.range, [-0.2618, 0.2618], rtol=1e-6)


def test_g1_contact_excludes(g1):
  """Real G1 carries 4 contact excludes (elbow-wrist, pelvis-hip_roll)."""
  _, m = g1
  assert m.nexclude == 4
  pairs = set()
  for e in range(m.nexclude):
    sig = int(m.exclude_signature[e])
    b1 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, sig >> 16)
    b2 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, sig & 0xFFFF)
    pairs.add(frozenset((b1, b2)))
  assert frozenset(('pelvis', 'left_hip_roll_link')) in pairs
  assert frozenset(('left_elbow_link', 'left_wrist_pitch_link')) in pairs


def test_g1_sites(g1):
  _, m = g1
  for site in ('imu_in_pelvis', 'imu_in_torso', 'left_foot', 'right_foot',
               'left_palm', 'right_palm'):
    assert mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, site) >= 0
  np.testing.assert_allclose(
      m.site('imu_in_pelvis').pos, [0.04525, 0, -0.08339], atol=1e-9)


# ---------------------------------------------------------------------------
# Actuators.
# ---------------------------------------------------------------------------

def test_go1_actuator_gains(go1):
  _, m = go1
  arm_hip = unitree_go1.ROTOR_INERTIA * unitree_go1.HIP_GEAR_RATIO ** 2
  omega = 2 * math.pi * 10
  kp_hip = arm_hip * omega ** 2
  i = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, 'FL_hip_joint')
  np.testing.assert_allclose(m.actuator_gainprm[i, 0], kp_hip, rtol=1e-6)
  np.testing.assert_allclose(m.actuator_biasprm[i, 1], -kp_hip, rtol=1e-6)
  j = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, 'FL_hip_joint')
  np.testing.assert_allclose(m.dof_armature[m.jnt_dofadr[j]], arm_hip,
                             rtol=1e-6)
  np.testing.assert_allclose(m.actuator_forcerange[i], [-23.7, 23.7])


@pytest.mark.parametrize('joint,actuator,mult', [
    ('left_elbow_joint', unitree_g1.ACTUATOR_5020, 1.0),
    ('left_ankle_pitch_joint', unitree_g1.ACTUATOR_5020, 2.0),
    ('waist_roll_joint', unitree_g1.ACTUATOR_5020, 2.0),
    ('right_knee_joint', unitree_g1.ACTUATOR_7520_22, 1.0),
    ('left_hip_pitch_joint', unitree_g1.ACTUATOR_7520_14, 1.0),
    ('right_wrist_yaw_joint', unitree_g1.ACTUATOR_4010, 1.0),
])
def test_g1_actuator_groups(g1, joint, actuator, mult):
  _, m = g1
  kp, kd = actuator.pd_gains()
  i = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, joint)
  np.testing.assert_allclose(m.actuator_gainprm[i, 0], mult * kp, rtol=1e-6)
  np.testing.assert_allclose(m.actuator_biasprm[i, 1], -mult * kp, rtol=1e-6)
  np.testing.assert_allclose(m.actuator_biasprm[i, 2], -mult * kd, rtol=1e-6)
  lim = mult * actuator.effort_limit
  np.testing.assert_allclose(m.actuator_forcerange[i], [-lim, lim])


def test_g1_action_scale_dict():
  scale = unitree_g1.G1_ACTION_SCALE
  kp, _ = unitree_g1.ACTUATOR_5020.pd_gains()
  np.testing.assert_allclose(scale['.*_elbow_joint'], 0.25 * 25.0 / kp)


# ---------------------------------------------------------------------------
# Collision presets (defaults mirror reference: G1 FULL_COLLISION with
# self-collisions, Go1 FULL_COLLISION without self).
# ---------------------------------------------------------------------------

def test_g1_default_collision(g1):
  _, m = g1
  n_coll = n_feet = 0
  for g in range(m.ngeom):
    name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g) or ''
    if '_collision' not in name:
      continue
    n_coll += 1
    assert m.geom_contype[g] == 1 and m.geom_conaffinity[g] == 1, name
    if re.match(_G1_FOOT, name):
      n_feet += 1
      assert m.geom_condim[g] == 3
      assert m.geom_priority[g] == 1
      np.testing.assert_allclose(m.geom_friction[g, 0], 0.6)
    else:
      assert m.geom_condim[g] == 1, name
  assert n_feet == 14  # 7 capsules per foot
  assert n_coll == 33


def test_go1_default_collision(go1):
  _, m = go1
  n_coll = n_feet = 0
  for g in range(m.ngeom):
    name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g) or ''
    if '_collision' not in name:
      continue
    n_coll += 1
    # no self-collisions: contype=1, conaffinity=0
    assert m.geom_contype[g] == 1 and m.geom_conaffinity[g] == 0, name
    if re.match(_GO1_FOOT, name):
      n_feet += 1
      assert m.geom_condim[g] == 3
      assert m.geom_priority[g] == 1
      np.testing.assert_allclose(m.geom_friction[g, 0], 0.6)
      np.testing.assert_allclose(m.geom_solimp[g, :3], [0.9, 0.95, 0.023])
    else:
      assert m.geom_condim[g] == 1, name
  assert n_feet == 4
  assert n_coll == 30


def test_g1_feet_only_preset():
  cfg = Entity(unitree_g1.G1_ROBOT_CFG.__class__(
      spec_fn=unitree_g1.get_spec,
      init_state=unitree_g1.KNEES_BENT_KEYFRAME,
      actuators=unitree_g1.G1_ACTUATORS,
      spec_editors=(unitree_g1.FEET_ONLY_COLLISION,)))
  m = cfg.spec.compile()
  for g in range(m.ngeom):
    name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g) or ''
    if re.match(_G1_FOOT, name):
      assert m.geom_conaffinity[g] == 1 and m.geom_condim[g] == 3
    else:
      assert m.geom_contype[g] == 0 and m.geom_conaffinity[g] == 0, name


def test_entity_find_api(go1):
  e, _ = go1
  ids, names = e.find_joints(['FL_.*'])
  assert names == ['FL_hip_joint', 'FL_thigh_joint', 'FL_calf_joint']
  ids, names = e.find_geoms(['.*_foot_collision'])
  assert len(names) == 4
  assert e.is_actuated and e.is_articulated and not e.is_fixed_base


def test_visual_mesh_layer():
  """The shipped STL visual meshes attach as massless, non-colliding
  group-2 geoms (reference g1.xml visual class); physics sees none of
  them (no hulls built, no candidate pairs), and the viewer mesh
  extractor can triangulate every one."""
  from mjlab_tpu.asset_zoo.unitree_g1 import get_spec
  from mjlab_tpu.physics import io
  from mjlab_tpu.viewer.primitives import mujoco_mesh

  spec = get_spec()
  spec.worldbody.add_geom(
      name='floor', type=mujoco.mjtGeom.mjGEOM_PLANE, size=[5, 5, 0.1])
  m = spec.compile()
  assert m.nmesh == 35  # all reference G1 STL assets present
  mesh_geoms = [g for g in range(m.ngeom)
                if m.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH]
  assert len(mesh_geoms) == 35
  for g in mesh_geoms:
    assert m.geom_contype[g] == 0 and m.geom_conaffinity[g] == 0
  # identical physics: total mass matches the mesh-free build exactly
  m_bare = get_spec(visuals=False).compile()
  assert abs(m.body_mass.sum() - m_bare.body_mass.sum()) < 1e-12
  # no hulls for visual-only meshes; no extra collision pairs
  model = io.put_model(m)
  mh = model.stat.mesh_hulls
  assert mh is None or int((mh.vmask.sum(axis=1) > 0).sum()) == 0
  # renderable
  out = mujoco_mesh(m, mesh_geoms[0])
  assert out is not None
