"""Unitree Go1 quadruped, built procedurally from primitives.

Unlike the reference (which loads mujoco_menagerie MJCF + STL meshes,
reference src/mjlab/asset_zoo/robots/unitree_go1/go1_constants.py), this
model is authored from primitive geoms via MjSpec: capsule limbs, box
trunk, sphere feet. Kinematic layout, masses, joint ranges and actuator
parameters follow the public Unitree Go1 specifications; PD gains are
derived from motor rotor inertia x gear ratio via a 10 Hz natural
frequency, damping ratio 2 (same first-principles recipe as the
reference).

Joint/geom naming follows the Unitree convention ({FL,FR,RL,RR}_hip_joint,
..., {P}_foot_collision) so task configs can use the same regexes.
"""

from __future__ import annotations

import mujoco

from mjlab_tpu.entity.entity import EntityCfg, EntityInitStateCfg
from mjlab_tpu.entity.spec_config import ActuatorCfg, CollisionCfg
from mjlab_tpu.utils.actuator import ElectricActuator, reflected_inertia

# ---------------------------------------------------------------------------
# Kinematics / mass parameters (public Go1 specs).
# ---------------------------------------------------------------------------
TRUNK_SIZE = (0.1881, 0.04675, 0.057)  # half sizes
TRUNK_MASS = 5.204
HIP_OFFSET_X = 0.1881
HIP_OFFSET_Y = 0.04675
HIP_MASS = 0.591
THIGH_OFFSET_Y = 0.08
THIGH_LENGTH = 0.213
THIGH_MASS = 0.92
CALF_LENGTH = 0.213
CALF_MASS = 0.136
FOOT_RADIUS = 0.022
FOOT_MASS = 0.06

HIP_RANGE = (-0.863, 0.863)
THIGH_RANGE = (-0.686, 4.501)
CALF_RANGE = (-2.818, -0.888)

# ---------------------------------------------------------------------------
# Actuators (GO-M8010-6 class motor).
# ---------------------------------------------------------------------------
ROTOR_INERTIA = 0.000111842
HIP_GEAR_RATIO = 6.0
KNEE_GEAR_RATIO = HIP_GEAR_RATIO * 1.5

HIP_ACTUATOR = ElectricActuator(
    reflected_inertia=reflected_inertia(ROTOR_INERTIA, HIP_GEAR_RATIO),
    velocity_limit=30.1, effort_limit=23.7)
KNEE_ACTUATOR = ElectricActuator(
    reflected_inertia=reflected_inertia(ROTOR_INERTIA, KNEE_GEAR_RATIO),
    velocity_limit=20.06, effort_limit=35.55)

_KP_HIP, _KD_HIP = HIP_ACTUATOR.pd_gains()
_KP_KNEE, _KD_KNEE = KNEE_ACTUATOR.pd_gains()

GO1_HIP_ACTUATOR_CFG = ActuatorCfg(
    joint_names_expr=['.*_hip_joint', '.*_thigh_joint'],
    effort_limit=HIP_ACTUATOR.effort_limit,
    stiffness=_KP_HIP, damping=_KD_HIP,
    armature=HIP_ACTUATOR.reflected_inertia)
GO1_KNEE_ACTUATOR_CFG = ActuatorCfg(
    joint_names_expr=['.*_calf_joint'],
    effort_limit=KNEE_ACTUATOR.effort_limit,
    stiffness=_KP_KNEE, damping=_KD_KNEE,
    armature=KNEE_ACTUATOR.reflected_inertia)


def get_spec() -> mujoco.MjSpec:
  spec = mujoco.MjSpec()
  spec.modelname = 'go1'
  spec.compiler.degree = False

  trunk = spec.worldbody.add_body(name='trunk', pos=[0, 0, 0.445])
  trunk.add_joint(name='floating_base_joint',
                  type=mujoco.mjtJoint.mjJNT_FREE)
  trunk.add_geom(name='trunk_collision', type=mujoco.mjtGeom.mjGEOM_BOX,
                 size=list(TRUNK_SIZE), mass=TRUNK_MASS,
                 rgba=[0.2, 0.2, 0.2, 1])
  trunk.add_site(name='imu', pos=[0, 0, 0])

  for prefix, sx, sy in (('FL', 1, 1), ('FR', 1, -1),
                         ('RL', -1, 1), ('RR', -1, -1)):
    hip = trunk.add_body(
        name=f'{prefix}_hip', pos=[sx * HIP_OFFSET_X, sy * HIP_OFFSET_Y, 0])
    hip.add_joint(name=f'{prefix}_hip_joint', axis=[1, 0, 0],
                  type=mujoco.mjtJoint.mjJNT_HINGE, range=list(HIP_RANGE))
    hip.add_geom(name=f'{prefix}_hip_collision',
                 type=mujoco.mjtGeom.mjGEOM_CYLINDER,
                 size=[0.046, 0.02, 0], mass=HIP_MASS,
                 quat=[0.7071068, 0, 0.7071068, 0],
                 rgba=[0.3, 0.3, 0.3, 1])

    thigh = hip.add_body(name=f'{prefix}_thigh',
                         pos=[0, sy * THIGH_OFFSET_Y, 0])
    thigh.add_joint(name=f'{prefix}_thigh_joint', axis=[0, 1, 0],
                    type=mujoco.mjtJoint.mjJNT_HINGE,
                    range=list(THIGH_RANGE))
    thigh.add_geom(name=f'{prefix}_thigh_collision',
                   type=mujoco.mjtGeom.mjGEOM_CAPSULE,
                   fromto=[0, 0, 0, 0, 0, -THIGH_LENGTH],
                   size=[0.0245, 0, 0], mass=THIGH_MASS,
                   rgba=[0.35, 0.35, 0.35, 1])

    calf = thigh.add_body(name=f'{prefix}_calf', pos=[0, 0, -THIGH_LENGTH])
    calf.add_joint(name=f'{prefix}_calf_joint', axis=[0, 1, 0],
                   type=mujoco.mjtJoint.mjJNT_HINGE, range=list(CALF_RANGE))
    calf.add_geom(name=f'{prefix}_calf_collision',
                  type=mujoco.mjtGeom.mjGEOM_CAPSULE,
                  fromto=[0, 0, 0, 0, 0, -CALF_LENGTH],
                  size=[0.016, 0, 0], mass=CALF_MASS,
                  rgba=[0.15, 0.15, 0.15, 1])
    calf.add_geom(name=f'{prefix}_foot_collision',
                  type=mujoco.mjtGeom.mjGEOM_SPHERE,
                  pos=[0, 0, -CALF_LENGTH], size=[FOOT_RADIUS, 0, 0],
                  mass=FOOT_MASS, rgba=[0.1, 0.1, 0.1, 1])
  return spec


_FOOT_REGEX = '^[FR][LR]_foot_collision$'

# Feet are the only colliders; priority + custom friction/solimp
# (reference go1_constants.py:105-117).
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

INIT_STATE = EntityInitStateCfg(
    pos=(0.0, 0.0, 0.278),
    joint_pos={
        '.*thigh_joint': 0.9,
        '.*calf_joint': -1.8,
        '.*R_hip_joint': 0.1,
        '.*L_hip_joint': -0.1,
    },
    joint_vel={'.*': 0.0})

GO1_ROBOT_CFG = EntityCfg(
    spec_fn=get_spec,
    init_state=INIT_STATE,
    actuators=(GO1_HIP_ACTUATOR_CFG, GO1_KNEE_ACTUATOR_CFG),
    spec_editors=(FEET_ONLY_COLLISION,),
    soft_joint_pos_limit_factor=0.9)

GO1_ACTION_SCALE = 0.25
