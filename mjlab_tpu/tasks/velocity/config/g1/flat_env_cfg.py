"""Unitree G1 flat-terrain velocity task
(reference src/mjlab/tasks/velocity/config/g1/)."""

from __future__ import annotations

import dataclasses

from mjlab_tpu.asset_zoo.unitree_g1 import (
    G1_ACTION_SCALE,
    G1_ROBOT_CFG,
)
from mjlab_tpu.entity.spec_config import ContactSensorCfg
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.tasks.velocity.velocity_env_cfg import (
    LocomotionVelocityEnvCfg,
)
from mjlab_tpu.terrains.importer import TerrainImporterCfg

# posture-reward stds, verbatim from the reference G1 tuning
# (reference tasks/velocity/config/g1/rough_env_cfg.py:52-70)
G1_POSE_STD = {
    '.*hip_pitch.*': 0.3, '.*hip_roll.*': 0.15, '.*hip_yaw.*': 0.15,
    '.*knee.*': 0.35, '.*ankle_pitch.*': 0.25, '.*ankle_roll.*': 0.1,
    '.*waist_yaw.*': 0.15, '.*waist_roll.*': 0.08, '.*waist_pitch.*': 0.1,
    '.*shoulder_pitch.*': 0.35, '.*shoulder_roll.*': 0.15,
    '.*shoulder_yaw.*': 0.1, '.*elbow.*': 0.25, '.*wrist.*': 0.3,
}


def _g1_with_sensors():
  cfg = dataclasses.replace(G1_ROBOT_CFG)
  sensors = tuple(
      ContactSensorCfg(
          name=f'{side}_foot_ground_contact',
          subtree1=f'{side}_ankle_roll_link',
          geom2='terrain',  # ground contact ONLY — under FULL_COLLISION a
          # foot can also touch the other leg, which must not read as
          # touchdown (reference rough_env_cfg.py:19-27 body2='terrain')
          # found-only, matching the reference (rough_env_cfg.py:24
          # data=("found",)): the force channel is consumed by no MDP
          # term, and requesting it forces the full-width contact-force
          # decode into every physics substep — measured +36 GB HBM
          # traffic per env.step at 4096 envs (73% of the velocity-vs-
          # tracking throughput inversion, see BASELINE.md round 5).
          data=('found',), reduce='netforce')
      for side in ('left', 'right'))
  cfg.spec_editors = cfg.spec_editors + sensors
  return cfg


@dataclasses.dataclass
class UnitreeG1FlatEnvCfg(LocomotionVelocityEnvCfg):

  def __post_init__(self):
    self.scene = SceneCfg(
        num_envs=self.scene.num_envs if self.scene else 1024,
        terrain=TerrainImporterCfg(terrain_type='plane'),
        entities={'robot': _g1_with_sensors()})
    self.actions.joint_pos.scale = G1_ACTION_SCALE
    self.events.foot_friction.params['asset_cfg'] = SceneEntityCfg(
        'robot', geom_names=[r'^(left|right)_foot[1-7]_collision$'])
    self.rewards.pose.params['std'] = G1_POSE_STD
    # reference G1 disables the command-velocity curriculum
    # (reference rough_env_cfg.py:77 curriculum.command_vel = None) and
    # the flat variant softens pushes (reference flat_env_cfg.py:22-26)
    self.curriculum.command_vel = None
    self.events.push_robot.params['velocity_range'] = {
        'x': (-0.5, 0.5), 'y': (-0.5, 0.5)}


@dataclasses.dataclass
class UnitreeG1FlatEnvCfg_PLAY(UnitreeG1FlatEnvCfg):

  def __post_init__(self):
    super().__post_init__()
    self.scene.num_envs = 16
    self.episode_length_s = 1e9
    self.observations.policy.enable_corruption = False
    self.events.push_robot = None
