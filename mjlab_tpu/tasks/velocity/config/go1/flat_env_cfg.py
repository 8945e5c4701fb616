"""Unitree Go1 flat-terrain velocity task
(reference src/mjlab/tasks/velocity/config/go1/)."""

from __future__ import annotations

import dataclasses

from mjlab_tpu.asset_zoo.unitree_go1 import (
    GO1_ACTION_SCALE,
    GO1_ROBOT_CFG,
)
from mjlab_tpu.entity.spec_config import ContactSensorCfg
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.tasks.velocity.velocity_env_cfg import (
    LocomotionVelocityEnvCfg,
)
from mjlab_tpu.terrains.importer import TerrainImporterCfg

_FEET = ['FL', 'FR', 'RL', 'RR']


def _go1_with_sensors():
  cfg = dataclasses.replace(GO1_ROBOT_CFG)
  sensors = tuple(
      ContactSensorCfg(
          name=f'{p}_foot_ground_contact',
          geom1=f'{p}_foot_collision',
          geom2='terrain',  # ground contact only (reference
          # rough_env_cfg.py body2='terrain')
          # found-only, matching the reference Go1 cfg (data=("found",));
          # see the G1 cfg note — the force channel was dead weight that
          # forced the contact-force decode into every substep.
          data=('found',), reduce='netforce')
      for p in _FEET)
  cfg.spec_editors = cfg.spec_editors + sensors
  return cfg


@dataclasses.dataclass
class UnitreeGo1FlatEnvCfg(LocomotionVelocityEnvCfg):

  def __post_init__(self):
    self.scene = SceneCfg(
        num_envs=self.scene.num_envs if self.scene else 1024,
        terrain=TerrainImporterCfg(terrain_type='plane'),
        entities={'robot': _go1_with_sensors()})
    self.actions.joint_pos.scale = GO1_ACTION_SCALE
    self.events.foot_friction.params['asset_cfg'] = SceneEntityCfg(
        'robot', geom_names=['^[FR][LR]_foot_collision$'])
    self.rewards.pose.params['std'] = {
        '.*_hip_joint': 0.3, '.*_thigh_joint': 0.5, '.*_calf_joint': 0.6}
    self.rewards.flat_orientation_l2.weight = -2.5


@dataclasses.dataclass
class UnitreeGo1FlatEnvCfg_PLAY(UnitreeGo1FlatEnvCfg):

  def __post_init__(self):
    super().__post_init__()
    self.scene.num_envs = 16
    self.episode_length_s = 1e9
    self.observations.policy.enable_corruption = False
    self.events.push_robot = None
