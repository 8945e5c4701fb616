"""Unitree G1 humanoid (29 DoF), built procedurally from primitives.

Same approach as unitree_go1.py: primitive-geom MjSpec authoring with the
Unitree joint naming convention (left/right_hip_pitch_joint, ...,
waist_yaw/roll/pitch, shoulder/elbow/wrist chains) so task configs can use
the same regexes as for the real robot description. Masses and joint
ranges approximate the public G1 specifications (~35 kg total); actuator
parameters are derived from the Unitree motor specs (5020 / 7520-14 /
7520-22 / 4010 classes) via rotor inertia reflected through the two-stage
planetary gear train, with PD gains at 10 Hz natural frequency, damping
ratio 2 - the recipe of reference
src/mjlab/asset_zoo/robots/unitree_g1/g1_constants.py:42-190.
"""

from __future__ import annotations

import mujoco

from mjlab_tpu.entity.entity import EntityCfg, EntityInitStateCfg
from mjlab_tpu.entity.spec_config import (
    ActuatorCfg,
    CollisionCfg,
    ContactSensorCfg,
)
from mjlab_tpu.utils.actuator import (
    ElectricActuator,
    reflected_inertia_two_stage_planetary,
)

# ---------------------------------------------------------------------------
# Motors (public Unitree specs).
# ---------------------------------------------------------------------------
ARMATURE_5020 = reflected_inertia_two_stage_planetary(
    (0.139e-4, 0.017e-4, 0.169e-4), (1, 1 + 46 / 18, 1 + 56 / 16))
ARMATURE_7520_14 = reflected_inertia_two_stage_planetary(
    (0.489e-4, 0.098e-4, 0.533e-4), (1, 4.5, 1 + 48 / 22))
ARMATURE_7520_22 = reflected_inertia_two_stage_planetary(
    (0.489e-4, 0.109e-4, 0.738e-4), (1, 4.5, 5))
ARMATURE_4010 = reflected_inertia_two_stage_planetary(
    (0.068e-4, 0.0, 0.0), (1, 5, 5))

ACTUATOR_5020 = ElectricActuator(ARMATURE_5020, 37.0, 25.0)
ACTUATOR_7520_14 = ElectricActuator(ARMATURE_7520_14, 32.0, 88.0)
ACTUATOR_7520_22 = ElectricActuator(ARMATURE_7520_22, 20.0, 139.0)
ACTUATOR_4010 = ElectricActuator(ARMATURE_4010, 22.0, 5.0)


def _cfg(names, act: ElectricActuator, mult: float = 1.0) -> ActuatorCfg:
  kp, kd = act.pd_gains()
  return ActuatorCfg(
      joint_names_expr=names,
      effort_limit=act.effort_limit * mult,
      stiffness=kp * mult, damping=kd * mult,
      armature=act.reflected_inertia * mult)


G1_ACTUATOR_5020 = _cfg(
    ['.*_elbow_joint', '.*_shoulder_pitch_joint', '.*_shoulder_roll_joint',
     '.*_shoulder_yaw_joint', '.*_wrist_roll_joint'], ACTUATOR_5020)
G1_ACTUATOR_7520_14 = _cfg(
    ['.*_hip_pitch_joint', '.*_hip_yaw_joint', 'waist_yaw_joint'],
    ACTUATOR_7520_14)
G1_ACTUATOR_7520_22 = _cfg(
    ['.*_hip_roll_joint', '.*_knee_joint'], ACTUATOR_7520_22)
G1_ACTUATOR_4010 = _cfg(
    ['.*_wrist_pitch_joint', '.*_wrist_yaw_joint'], ACTUATOR_4010)
# waist pitch/roll and ankles: 4-bar linkage driven by two 5020s; nominal
# 1:1 -> sum the two actuators (reference g1_constants.py:168-185).
G1_ACTUATOR_WAIST = _cfg(
    ['waist_pitch_joint', 'waist_roll_joint'], ACTUATOR_5020, mult=2.0)
G1_ACTUATOR_ANKLE = _cfg(
    ['.*_ankle_pitch_joint', '.*_ankle_roll_joint'], ACTUATOR_5020, mult=2.0)

G1_ACTUATORS = (
    G1_ACTUATOR_5020, G1_ACTUATOR_7520_14, G1_ACTUATOR_7520_22,
    G1_ACTUATOR_4010, G1_ACTUATOR_WAIST, G1_ACTUATOR_ANKLE)


# ---------------------------------------------------------------------------
# Procedural spec.
# ---------------------------------------------------------------------------

def get_spec() -> mujoco.MjSpec:
  spec = mujoco.MjSpec()
  spec.modelname = 'g1'
  spec.compiler.degree = False
  H = mujoco.mjtGeom.mjGEOM_CAPSULE
  B = mujoco.mjtGeom.mjGEOM_BOX
  S = mujoco.mjtGeom.mjGEOM_SPHERE

  pelvis = spec.worldbody.add_body(name='pelvis', pos=[0, 0, 0.793])
  pelvis.add_joint(name='floating_base_joint', type=mujoco.mjtJoint.mjJNT_FREE)
  pelvis.add_geom(name='pelvis_collision', type=S, size=[0.07, 0, 0],
                  mass=3.8, rgba=[0.3, 0.3, 0.3, 1])
  pelvis.add_site(name='imu_in_pelvis', pos=[0.0, 0, 0])

  # ---- legs ----
  for side, sy in (('left', 1), ('right', -1)):
    hp = pelvis.add_body(name=f'{side}_hip_pitch_link',
                         pos=[0, sy * 0.064, -0.10])
    hp.add_joint(name=f'{side}_hip_pitch_joint', axis=[0, 1, 0],
                 type=mujoco.mjtJoint.mjJNT_HINGE, range=[-2.53, 2.88])
    hp.add_geom(name=f'{side}_hip_pitch_collision', type=S,
                size=[0.05, 0, 0], mass=1.3, rgba=[0.3, 0.3, 0.3, 1])

    hr = hp.add_body(name=f'{side}_hip_roll_link', pos=[0, sy * 0.052, 0])
    hr.add_joint(name=f'{side}_hip_roll_joint', axis=[1, 0, 0],
                 type=mujoco.mjtJoint.mjJNT_HINGE,
                 range=[-0.52, 2.97] if sy > 0 else [-2.97, 0.52])
    hr.add_geom(name=f'{side}_hip_roll_collision', type=S,
                size=[0.05, 0, 0], mass=1.4, rgba=[0.3, 0.3, 0.3, 1])

    hy = hr.add_body(name=f'{side}_hip_yaw_link', pos=[0, 0, -0.12])
    hy.add_joint(name=f'{side}_hip_yaw_joint', axis=[0, 0, 1],
                 type=mujoco.mjtJoint.mjJNT_HINGE, range=[-2.75, 2.75])
    hy.add_geom(name=f'{side}_thigh_collision', type=H,
                fromto=[0, 0, 0, 0, 0, -0.18], size=[0.05, 0, 0],
                mass=2.0, rgba=[0.35, 0.35, 0.35, 1])

    knee = hy.add_body(name=f'{side}_knee_link', pos=[0, 0, -0.18])
    knee.add_joint(name=f'{side}_knee_joint', axis=[0, 1, 0],
                   type=mujoco.mjtJoint.mjJNT_HINGE, range=[-0.09, 2.88])
    knee.add_geom(name=f'{side}_shin_collision', type=H,
                  fromto=[0, 0, 0, 0, 0, -0.30], size=[0.04, 0, 0],
                  mass=1.65, rgba=[0.35, 0.35, 0.35, 1])

    ap = knee.add_body(name=f'{side}_ankle_pitch_link', pos=[0, 0, -0.30])
    ap.add_joint(name=f'{side}_ankle_pitch_joint', axis=[0, 1, 0],
                 type=mujoco.mjtJoint.mjJNT_HINGE, range=[-0.87, 0.52])
    ap.add_geom(name=f'{side}_ankle_pitch_collision', type=S,
                size=[0.03, 0, 0], mass=0.1, rgba=[0.3, 0.3, 0.3, 1])

    ar = ap.add_body(name=f'{side}_ankle_roll_link', pos=[0, 0, -0.02])
    ar.add_joint(name=f'{side}_ankle_roll_joint', axis=[1, 0, 0],
                 type=mujoco.mjtJoint.mjJNT_HINGE, range=[-0.26, 0.26])
    # foot: visual box + 4 sole contact spheres + heel/toe
    ar.add_geom(name=f'{side}_foot_box', type=B,
                pos=[0.03, 0, -0.025], size=[0.10, 0.035, 0.015],
                mass=0.5, contype=0, conaffinity=0,
                rgba=[0.15, 0.15, 0.15, 1])
    sole_pts = [(0.12, 0.03), (0.12, -0.03), (-0.05, 0.03), (-0.05, -0.03),
                (0.035, 0.0), (0.13, 0.0), (-0.06, 0.0)]
    for i, (px, py) in enumerate(sole_pts):
      ar.add_geom(name=f'{side}_foot{i + 1}_collision', type=S,
                  pos=[px, py, -0.035], size=[0.012, 0, 0],
                  mass=0.01, rgba=[0.1, 0.1, 0.1, 1])

  # ---- torso ----
  wy = pelvis.add_body(name='waist_yaw_link', pos=[0, 0, 0.04])
  wy.add_joint(name='waist_yaw_joint', axis=[0, 0, 1],
               type=mujoco.mjtJoint.mjJNT_HINGE, range=[-2.618, 2.618])
  wy.add_geom(name='waist_yaw_collision', type=S, size=[0.045, 0, 0],
              mass=0.6, rgba=[0.3, 0.3, 0.3, 1])
  wr = wy.add_body(name='waist_roll_link', pos=[0, 0, 0.035])
  wr.add_joint(name='waist_roll_joint', axis=[1, 0, 0],
               type=mujoco.mjtJoint.mjJNT_HINGE, range=[-0.52, 0.52])
  wr.add_geom(name='waist_roll_collision', type=S, size=[0.045, 0, 0],
              mass=0.6, rgba=[0.3, 0.3, 0.3, 1])
  torso = wr.add_body(name='torso_link', pos=[0, 0, 0.035])
  torso.add_joint(name='waist_pitch_joint', axis=[0, 1, 0],
                  type=mujoco.mjtJoint.mjJNT_HINGE, range=[-0.52, 0.52])
  torso.add_geom(name='torso_collision', type=B,
                 pos=[0, 0, 0.15], size=[0.08, 0.10, 0.16], mass=8.0,
                 rgba=[0.4, 0.4, 0.4, 1])
  torso.add_site(name='imu_in_torso', pos=[0, 0, 0.1])
  head = torso.add_body(name='head_link', pos=[0, 0, 0.34])
  head.add_geom(name='head_collision', type=S, pos=[0, 0, 0.05],
                size=[0.06, 0, 0], mass=1.2, rgba=[0.25, 0.25, 0.25, 1])

  # ---- arms ----
  for side, sy in (('left', 1), ('right', -1)):
    sp = torso.add_body(name=f'{side}_shoulder_pitch_link',
                        pos=[0, sy * 0.14, 0.26])
    sp.add_joint(name=f'{side}_shoulder_pitch_joint', axis=[0, 1, 0],
                 type=mujoco.mjtJoint.mjJNT_HINGE, range=[-3.09, 2.67])
    sp.add_geom(name=f'{side}_shoulder_pitch_collision', type=S,
                size=[0.04, 0, 0], mass=0.72, rgba=[0.3, 0.3, 0.3, 1])
    sr = sp.add_body(name=f'{side}_shoulder_roll_link', pos=[0, sy * 0.045, 0])
    sr.add_joint(name=f'{side}_shoulder_roll_joint', axis=[1, 0, 0],
                 type=mujoco.mjtJoint.mjJNT_HINGE,
                 range=[-1.59, 2.25] if sy > 0 else [-2.25, 1.59])
    sr.add_geom(name=f'{side}_shoulder_roll_collision', type=S,
                size=[0.04, 0, 0], mass=0.64, rgba=[0.3, 0.3, 0.3, 1])
    sy_l = sr.add_body(name=f'{side}_shoulder_yaw_link', pos=[0, 0, -0.08])
    sy_l.add_joint(name=f'{side}_shoulder_yaw_joint', axis=[0, 0, 1],
                   type=mujoco.mjtJoint.mjJNT_HINGE, range=[-2.62, 2.62])
    sy_l.add_geom(name=f'{side}_upper_arm_collision', type=H,
                  fromto=[0, 0, 0, 0, 0, -0.12], size=[0.035, 0, 0],
                  mass=0.73, rgba=[0.35, 0.35, 0.35, 1])
    el = sy_l.add_body(name=f'{side}_elbow_link', pos=[0, 0, -0.13])
    el.add_joint(name=f'{side}_elbow_joint', axis=[0, 1, 0],
                 type=mujoco.mjtJoint.mjJNT_HINGE, range=[-1.05, 2.09])
    el.add_geom(name=f'{side}_forearm_collision', type=H,
                fromto=[0, 0, 0, 0.14, 0, 0], size=[0.03, 0, 0],
                mass=0.6, rgba=[0.35, 0.35, 0.35, 1])
    wrr = el.add_body(name=f'{side}_wrist_roll_link', pos=[0.15, 0, 0])
    wrr.add_joint(name=f'{side}_wrist_roll_joint', axis=[1, 0, 0],
                  type=mujoco.mjtJoint.mjJNT_HINGE, range=[-1.97, 1.97])
    wrr.add_geom(name=f'{side}_wrist_roll_collision', type=S,
                 size=[0.025, 0, 0], mass=0.2, rgba=[0.3, 0.3, 0.3, 1])
    wrp = wrr.add_body(name=f'{side}_wrist_pitch_link', pos=[0.035, 0, 0])
    wrp.add_joint(name=f'{side}_wrist_pitch_joint', axis=[0, 1, 0],
                  type=mujoco.mjtJoint.mjJNT_HINGE, range=[-1.61, 1.61])
    wrp.add_geom(name=f'{side}_wrist_pitch_collision', type=S,
                 size=[0.025, 0, 0], mass=0.15, rgba=[0.3, 0.3, 0.3, 1])
    wyw = wrp.add_body(name=f'{side}_wrist_yaw_link', pos=[0.035, 0, 0])
    wyw.add_joint(name=f'{side}_wrist_yaw_joint', axis=[0, 0, 1],
                  type=mujoco.mjtJoint.mjJNT_HINGE, range=[-1.61, 1.61])
    wyw.add_geom(name=f'{side}_hand_collision', type=B,
                 pos=[0.05, 0, 0], size=[0.06, 0.02, 0.035], mass=0.45,
                 rgba=[0.2, 0.2, 0.2, 1])

  # Near-adjacent permanent-overlap excludes: the primitive approximation
  # makes some 2-3-hop body pairs (e.g. pelvis <-> waist_roll spheres)
  # permanently interpenetrate. With self-collision enabled (tracking
  # task) those become constant multi-cm-deep contacts whose forces
  # destabilize f32 solves. Real G1 MJCFs carry manual <exclude> entries
  # for such pairs (reference asset_zoo g1.xml); derive ours from the
  # default pose: any geom pair on bodies <= 3 tree-hops apart that
  # starts > 2 mm interpenetrated was never a physically meaningful
  # contact.
  mtmp = spec.compile()
  dtmp = mujoco.MjData(mtmp)
  mujoco.mj_kinematics(mtmp, dtmp)
  parent = mtmp.body_parentid

  def _chain(b):
    out = [int(b)]
    while out[-1]:
      out.append(int(parent[out[-1]]))
    return out

  def _treedist(a, b):
    ca, cb = _chain(a), _chain(b)
    da = {x: i for i, x in enumerate(ca)}
    return min(j + da[x] for j, x in enumerate(cb) if x in da)

  seen = set()
  for g1 in range(mtmp.ngeom):
    for g2 in range(g1 + 1, mtmp.ngeom):
      b1, b2 = int(mtmp.geom_bodyid[g1]), int(mtmp.geom_bodyid[g2])
      if b1 == b2 or (b1, b2) in seen or _treedist(b1, b2) > 3:
        continue
      if mujoco.mj_geomDistance(mtmp, dtmp, g1, g2, 0.1, None) < -0.002:
        seen.add((b1, b2))
        exc = spec.add_exclude()
        exc.bodyname1 = mtmp.body(b1).name
        exc.bodyname2 = mtmp.body(b2).name
  return spec


_FOOT_REGEX = r'^(left|right)_foot[1-7]_collision$'

# feet-only collisions with per-foot condim/priority/friction overrides
# (reference g1_constants.py:225-252)
FEET_ONLY_COLLISION = CollisionCfg(
    geom_names_expr=[_FOOT_REGEX],
    contype=0, conaffinity=1, condim=3, priority=1,
    friction=(0.6,), solimp=(0.9, 0.95, 0.023))

FULL_COLLISION = CollisionCfg(
    geom_names_expr=['.*_collision'],
    condim={_FOOT_REGEX: 3, '.*_collision': 1},
    priority={_FOOT_REGEX: 1},
    friction={_FOOT_REGEX: (0.6,)},
    solimp={_FOOT_REGEX: (0.9, 0.95, 0.023)},
    contype=1, conaffinity=0)

# full collision variant with self-collisions enabled (tracking task)
FULL_COLLISION_WITH_SELF = CollisionCfg(
    geom_names_expr=['.*_collision'],
    condim={_FOOT_REGEX: 3, '.*_collision': 1},
    priority={_FOOT_REGEX: 1},
    friction={_FOOT_REGEX: (0.6,)},
    solimp={_FOOT_REGEX: (0.9, 0.95, 0.023)},
    contype=1, conaffinity=1)

HOME_KEYFRAME = EntityInitStateCfg(
    pos=(0.0, 0.0, 0.793),
    joint_pos={
        '.*_hip_pitch_joint': -0.1,
        '.*_knee_joint': 0.3,
        '.*_ankle_pitch_joint': -0.2,
        '.*_shoulder_pitch_joint': 0.2,
        '.*_elbow_joint': 1.28,
        'left_shoulder_roll_joint': 0.2,
        'right_shoulder_roll_joint': -0.2,
    },
    joint_vel={'.*': 0.0})

KNEES_BENT_KEYFRAME = EntityInitStateCfg(
    pos=(0.0, 0.0, 0.76),
    joint_pos={
        '.*_hip_pitch_joint': -0.312,
        '.*_knee_joint': 0.669,
        '.*_ankle_pitch_joint': -0.363,
        '.*_elbow_joint': 0.6,
        'left_shoulder_roll_joint': 0.2,
        'left_shoulder_pitch_joint': 0.2,
        'right_shoulder_roll_joint': -0.2,
        'right_shoulder_pitch_joint': 0.2,
    },
    joint_vel={'.*': 0.0})

G1_ROBOT_CFG = EntityCfg(
    spec_fn=get_spec,
    init_state=KNEES_BENT_KEYFRAME,
    actuators=G1_ACTUATORS,
    spec_editors=(FEET_ONLY_COLLISION,),
    soft_joint_pos_limit_factor=0.9)

# per-joint action scale 0.25 * effort / kp (reference g1_constants.py:277-290)
G1_ACTION_SCALE: dict[str, float] = {}
for _a in G1_ACTUATORS:
  for _n in _a.joint_names_expr:
    if _a.stiffness:
      G1_ACTION_SCALE[_n] = 0.25 * _a.effort_limit / _a.stiffness
