"""Unitree Go1 quadruped — the real robot description.

Body tree, link inertials, joint ranges, primitive collision geoms (box
trunk, capsule limbs, sphere feet) and sites are the real Go1 description
extracted to data tables (asset_zoo/data/go1_spec_data.py, verified to
<1e-12 against the compiled reference model — reference
src/mjlab/asset_zoo/robots/unitree_go1/xmls/go1.xml). Visual meshes are
omitted: massless and non-colliding in the reference, physics identical.

Actuator parameters (GO-M8010-6 class motor) follow the reference recipe:
rotor inertia reflected through the gear ratio, PD gains from a 10 Hz
natural frequency at damping ratio 2 (reference
src/mjlab/asset_zoo/robots/unitree_go1/go1_constants.py:39-82).
"""

from __future__ import annotations

from pathlib import Path

import mujoco

from mjlab_tpu.asset_zoo.data.go1_spec_data import SPEC_DATA
from mjlab_tpu.asset_zoo.spec_builder import build_robot_spec
from mjlab_tpu.entity.entity import EntityCfg, EntityInitStateCfg
from mjlab_tpu.entity.spec_config import ActuatorCfg, CollisionCfg
from mjlab_tpu.utils.actuator import ElectricActuator, reflected_inertia

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


ASSETS_DIR = Path(__file__).parent / 'robots' / 'unitree_go1' / 'assets'


def get_spec(visuals: bool = True) -> mujoco.MjSpec:
  """The real Go1 spec; visuals=True attaches the STL visual meshes
  (massless, non-colliding — physics identical either way). trunk.stl is
  absent from the reference checkout, so the trunk renders its collision
  primitives only."""
  return build_robot_spec(SPEC_DATA, visuals=visuals, assets_dir=ASSETS_DIR)


_FOOT_REGEX = '^[FR][LR]_foot_collision$'

# Collision presets mirroring reference go1_constants.py:105-130.
FEET_ONLY_COLLISION = CollisionCfg(
    geom_names_expr=[_FOOT_REGEX],
    contype=0, conaffinity=1, condim=3, priority=1,
    friction=(0.6,), solimp=(0.9, 0.95, 0.023))

# Everything collides with the world (no self-collisions); feet get
# condim=3 + priority + friction/solimp overrides.
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
    spec_editors=(FULL_COLLISION,),
    soft_joint_pos_limit_factor=0.9)

# per-joint action scale 0.25 * effort / kp (reference go1_constants.py:148-161)
GO1_ACTION_SCALE: dict[str, float] = {}
for _a in (GO1_HIP_ACTUATOR_CFG, GO1_KNEE_ACTUATOR_CFG):
  for _n in _a.joint_names_expr:
    if _a.stiffness:
      GO1_ACTION_SCALE[_n] = 0.25 * _a.effort_limit / _a.stiffness
