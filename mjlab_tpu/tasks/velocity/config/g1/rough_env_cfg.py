"""Unitree G1 rough-terrain velocity task
(reference src/mjlab/tasks/velocity/config/g1/rough_env_cfg.py)."""

from __future__ import annotations

import dataclasses

from mjlab_tpu.asset_zoo.unitree_g1 import G1_ACTION_SCALE
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.tasks.velocity.config.g1.flat_env_cfg import _g1_with_sensors
from mjlab_tpu.tasks.velocity.velocity_env_cfg import (
    LocomotionVelocityRoughEnvCfg,
    make_rough_terrain_cfg,
)


@dataclasses.dataclass
class UnitreeG1RoughEnvCfg(LocomotionVelocityRoughEnvCfg):

  def __post_init__(self):
    self.scene = SceneCfg(
        num_envs=self.scene.num_envs if self.scene else 1024,
        terrain=make_rough_terrain_cfg(),
        entities={'robot': _g1_with_sensors()})
    super().__post_init__()
    self.actions.joint_pos.scale = G1_ACTION_SCALE
    self.events.foot_friction.params['asset_cfg'] = SceneEntityCfg(
        'robot', geom_names=[r'^(left|right)_foot[1-7]_collision$'])
    from mjlab_tpu.tasks.velocity.config.g1.flat_env_cfg import G1_POSE_STD
    self.rewards.pose.params['std'] = G1_POSE_STD
    # reference G1 disables the command-velocity curriculum
    # (reference rough_env_cfg.py:77)
    self.curriculum.command_vel = None
    self.rewards.air_time.params['sensor_names'] = (
        'left_foot_ground_contact', 'right_foot_ground_contact')


@dataclasses.dataclass
class UnitreeG1RoughEnvCfg_PLAY(UnitreeG1RoughEnvCfg):

  def __post_init__(self):
    super().__post_init__()
    self.scene.num_envs = 16
    # smaller terrain for interactive playback
    gen = self.scene.terrain.terrain_generator
    gen.num_rows = 3
    gen.num_cols = 4
    gen.border_width = 6.0
    gen.curriculum = False
    self.episode_length_s = 1e9
    self.observations.policy.enable_corruption = False
    self.events.push_robot = None
