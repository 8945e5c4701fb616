"""Unitree Go1 rough-terrain velocity task
(reference src/mjlab/tasks/velocity/config/go1/rough_env_cfg.py)."""

from __future__ import annotations

import dataclasses

from mjlab_tpu.asset_zoo.unitree_go1 import GO1_ACTION_SCALE
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.tasks.velocity.config.go1.flat_env_cfg import (
    _go1_with_sensors,
)
from mjlab_tpu.tasks.velocity.velocity_env_cfg import (
    LocomotionVelocityRoughEnvCfg,
    make_rough_terrain_cfg,
)


@dataclasses.dataclass
class UnitreeGo1RoughEnvCfg(LocomotionVelocityRoughEnvCfg):

  def __post_init__(self):
    self.scene = SceneCfg(
        num_envs=self.scene.num_envs if self.scene else 1024,
        terrain=make_rough_terrain_cfg(),
        entities={'robot': _go1_with_sensors()})
    super().__post_init__()
    self.actions.joint_pos.scale = GO1_ACTION_SCALE
    self.events.foot_friction.params['asset_cfg'] = SceneEntityCfg(
        'robot', geom_names=['^[FR][LR]_foot_collision$'])
    self.rewards.pose.params['std'] = {
        '.*_hip_joint': 0.3, '.*_thigh_joint': 0.5, '.*_calf_joint': 0.6}
    self.rewards.flat_orientation_l2.weight = 0.0
    self.rewards.air_time.params['sensor_names'] = tuple(
        f'{p}_foot_ground_contact' for p in ('FL', 'FR', 'RL', 'RR'))


@dataclasses.dataclass
class UnitreeGo1RoughEnvCfg_PLAY(UnitreeGo1RoughEnvCfg):

  def __post_init__(self):
    super().__post_init__()
    self.scene.num_envs = 16
    gen = self.scene.terrain.terrain_generator
    gen.num_rows = 3
    gen.num_cols = 4
    gen.border_width = 6.0
    gen.curriculum = False
    self.episode_length_s = 1e9
    self.observations.policy.enable_corruption = False
    self.events.push_robot = None
