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
    self.rewards.pose.params['std'] = {
        '.*_hip_pitch_joint': 0.35, '.*_hip_roll_joint': 0.2,
        '.*_hip_yaw_joint': 0.2, '.*_knee_joint': 0.45,
        '.*_ankle_.*_joint': 0.25, 'waist_.*_joint': 0.15,
        '.*_shoulder_.*_joint': 0.25, '.*_elbow_joint': 0.3,
        '.*_wrist_.*_joint': 0.25}
    # on rough terrain the base follows the slope: no flat-orientation
    # penalty (reference rough cfg keeps it off)
    self.rewards.flat_orientation_l2.weight = 0.0
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
