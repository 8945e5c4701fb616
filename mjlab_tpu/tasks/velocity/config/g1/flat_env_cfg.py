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


def _g1_with_sensors():
  cfg = dataclasses.replace(G1_ROBOT_CFG)
  sensors = tuple(
      ContactSensorCfg(
          name=f'{side}_foot_ground_contact',
          subtree1=f'{side}_ankle_roll_link',
          data=('found', 'force'), reduce='netforce')
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
    self.rewards.pose.params['std'] = {
        '.*_hip_pitch_joint': 0.35, '.*_hip_roll_joint': 0.2,
        '.*_hip_yaw_joint': 0.2, '.*_knee_joint': 0.45,
        '.*_ankle_.*_joint': 0.25, 'waist_.*_joint': 0.15,
        '.*_shoulder_.*_joint': 0.25, '.*_elbow_joint': 0.3,
        '.*_wrist_.*_joint': 0.25}
    self.rewards.flat_orientation_l2.weight = -2.0


@dataclasses.dataclass
class UnitreeG1FlatEnvCfg_PLAY(UnitreeG1FlatEnvCfg):

  def __post_init__(self):
    super().__post_init__()
    self.scene.num_envs = 16
    self.episode_length_s = 1e9
    self.observations.policy.enable_corruption = False
    self.events.push_robot = None
