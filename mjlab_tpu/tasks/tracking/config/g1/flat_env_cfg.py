"""Unitree G1 motion-tracking task
(reference src/mjlab/tasks/tracking/config/g1/flat_env_cfg.py).

The default motion file is a synthetic squat+arm-swing reference generated
on first use (no motion-capture downloads in this environment); real
motions come from the csv_to_npz pipeline (mjlab_tpu/scripts/motion.py).
"""

from __future__ import annotations

import dataclasses
import os

from mjlab_tpu.asset_zoo.unitree_g1 import (
    FULL_COLLISION_WITH_SELF,
    G1_ACTION_SCALE,
    G1_ROBOT_CFG,
)
from mjlab_tpu.entity.spec_config import ContactSensorCfg
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.tasks.tracking.tracking_env_cfg import TrackingEnvCfg
from mjlab_tpu.terrains.importer import TerrainImporterCfg

# 14 tracked bodies (reference tasks/tracking/config/g1/flat_env_cfg.py:24-39)
TRACKED_BODIES = (
    'pelvis',
    'left_hip_roll_link', 'left_knee_link', 'left_ankle_roll_link',
    'right_hip_roll_link', 'right_knee_link', 'right_ankle_roll_link',
    'torso_link',
    'left_shoulder_roll_link', 'left_elbow_link', 'left_wrist_yaw_link',
    'right_shoulder_roll_link', 'right_elbow_link', 'right_wrist_yaw_link',
)
EE_BODIES = ['left_ankle_roll_link', 'right_ankle_roll_link',
             'left_wrist_yaw_link', 'right_wrist_yaw_link']
ANCHOR_BODY = 'torso_link'


def default_motion_file() -> str:
  from mjlab_tpu.scripts.motion import G1_MOTION_VERSION
  cache = os.environ.get('MJLAB_TPU_CACHE',
                         os.path.expanduser('~/.cache/mjlab_tpu'))
  os.makedirs(cache, exist_ok=True)
  path = os.path.join(cache, f'g1_squat_50hz_v{G1_MOTION_VERSION}.npz')
  if not os.path.exists(path):
    from mjlab_tpu.scripts.motion import generate_g1_squat_motion
    generate_g1_squat_motion(path)
  return path


def _g1_tracking_robot():
  cfg = dataclasses.replace(G1_ROBOT_CFG)
  sensors = (
      ContactSensorCfg(name='self_collision', subtree1='pelvis',
                       subtree2='pelvis', num=10, data=('found',),
                       reduce='netforce'),
  )
  cfg.spec_editors = (FULL_COLLISION_WITH_SELF,) + sensors
  return cfg


@dataclasses.dataclass
class G1FlatEnvCfg(TrackingEnvCfg):

  def __post_init__(self):
    self.scene = SceneCfg(
        num_envs=self.scene.num_envs if self.scene else 1024,
        terrain=TerrainImporterCfg(terrain_type='plane'),
        entities={'robot': _g1_tracking_robot()})
    self.actions.joint_pos.scale = G1_ACTION_SCALE
    cmd = self.commands.motion
    cmd.motion_file = default_motion_file()
    cmd.anchor_body_name = ANCHOR_BODY
    cmd.body_names = TRACKED_BODIES
    self.terminations.ee_body_pos.params['body_names'] = EE_BODIES
    self.events.foot_friction.params['asset_cfg'] = SceneEntityCfg(
        'robot', geom_names=[r'^(left|right)_foot[1-7]_collision$'])
    self.events.com_randomize.params['asset_cfg'] = SceneEntityCfg(
        'robot', body_names=['torso_link'])
    self.events.qpos0_randomize.params['asset_cfg'] = SceneEntityCfg(
        'robot', joint_names=['.*'])


@dataclasses.dataclass
class G1FlatNoStateEstimationEnvCfg(G1FlatEnvCfg):
  """Variant without anchor position / base linear velocity observations
  (reference config/g1/flat_env_cfg.py:57-62)."""

  def __post_init__(self):
    super().__post_init__()
    self.observations.policy.motion_anchor_pos_b = None
    self.observations.policy.base_lin_vel = None


@dataclasses.dataclass
class G1FlatNoStateEstimationEnvCfg_PLAY(G1FlatNoStateEstimationEnvCfg):
  """Play variant of the no-state-estimation config (reference
  config/g1/__init__.py:34)."""

  def __post_init__(self):
    super().__post_init__()
    self.scene.num_envs = 4
    self.observations.policy.enable_corruption = False
    self.events.push_robot = None
    self.commands.motion.pose_range = {}
    self.commands.motion.velocity_range = {}
    self.commands.motion.joint_position_range = (0.0, 0.0)
    self.commands.motion.disable_adaptive_sampling = True
    self.episode_length_s = int(1e9)


@dataclasses.dataclass
class G1FlatEnvCfg_PLAY(G1FlatEnvCfg):

  def __post_init__(self):
    super().__post_init__()
    self.scene.num_envs = 4
    self.observations.policy.enable_corruption = False
    self.events.push_robot = None
    self.commands.motion.pose_range = {}
    self.commands.motion.velocity_range = {}
    self.commands.motion.joint_position_range = (0.0, 0.0)
    self.commands.motion.disable_adaptive_sampling = True
    self.episode_length_s = int(1e9)
