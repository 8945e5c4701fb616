"""Unitree G1 humanoid (29 DoF) — the real robot description.

The body tree, link inertials, joint axes/ranges, primitive collision
geoms, sites and contact excludes are the real G1 description extracted
to data tables (asset_zoo/data/g1_spec_data.py, verified to <1e-12
against the compiled reference model — reference
src/mjlab/asset_zoo/robots/unitree_g1/xmls/g1.xml). The 35 STL visual
meshes ship in asset_zoo/robots/unitree_g1/assets and attach as
massless, non-colliding group-2 geoms, so physics is identical with or
without them.

Actuator parameters are derived from the Unitree motor specs (5020 /
7520-14 / 7520-22 / 4010 classes) via rotor inertia reflected through the
two-stage planetary gear train, with PD gains at 10 Hz natural frequency,
damping ratio 2 — the recipe of reference
src/mjlab/asset_zoo/robots/unitree_g1/g1_constants.py:42-190.
"""

from __future__ import annotations

from pathlib import Path

import mujoco

from mjlab_tpu.asset_zoo.data.g1_spec_data import SPEC_DATA
from mjlab_tpu.asset_zoo.spec_builder import build_robot_spec
from mjlab_tpu.entity.entity import EntityCfg, EntityInitStateCfg
from mjlab_tpu.entity.spec_config import ActuatorCfg, CollisionCfg
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


ASSETS_DIR = Path(__file__).parent / 'robots' / 'unitree_g1' / 'assets'


def get_spec(visuals: bool = True) -> mujoco.MjSpec:
  """The real G1 spec; visuals=True attaches the 35 STL visual meshes
  (massless, non-colliding — physics identical either way)."""
  return build_robot_spec(SPEC_DATA, visuals=visuals, assets_dir=ASSETS_DIR)


_FOOT_REGEX = r'^(left|right)_foot[1-7]_collision$'

# Collision presets mirroring reference g1_constants.py:225-253.
# FULL_COLLISION: everything collides, including self-collisions;
# non-foot geoms condim=1, feet condim=3 + priority + friction override.
FULL_COLLISION = CollisionCfg(
    geom_names_expr=['.*_collision'],
    condim={_FOOT_REGEX: 3, '.*_collision': 1},
    priority={_FOOT_REGEX: 1},
    friction={_FOOT_REGEX: (0.6,)})

FULL_COLLISION_WITHOUT_SELF = CollisionCfg(
    geom_names_expr=['.*_collision'],
    contype=0, conaffinity=1,
    condim={_FOOT_REGEX: 3, '.*_collision': 1},
    priority={_FOOT_REGEX: 1},
    friction={_FOOT_REGEX: (0.6,)})

FEET_ONLY_COLLISION = CollisionCfg(
    geom_names_expr=[_FOOT_REGEX],
    contype=0, conaffinity=1, condim=3, priority=1,
    friction=(0.6,))

# Back-compat alias for existing task configs.
FULL_COLLISION_WITH_SELF = FULL_COLLISION

HOME_KEYFRAME = EntityInitStateCfg(
    pos=(0.0, 0.0, 0.783675),
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
    spec_editors=(FULL_COLLISION,),
    soft_joint_pos_limit_factor=0.9)

# per-joint action scale 0.25 * effort / kp (reference g1_constants.py:277-290)
G1_ACTION_SCALE: dict[str, float] = {}
for _a in G1_ACTUATORS:
  for _n in _a.joint_names_expr:
    if _a.stiffness:
      G1_ACTION_SCALE[_n] = 0.25 * _a.effort_limit / _a.stiffness
