"""TinyBot tracking task — fast smoke/debug task, NOT part of the
reference task surface (mirror of tasks/velocity/config/tiny.py; opt in
by importing this module or via MJLAB_TASKS_MODULES).

Exercises the full tracking stack — MotionLoader, RSI resets, adaptive
sampling, anchor/body tracking rewards and terminations — on the 2-DoF
TinyBot, which compiles in seconds where the G1 tracking env (904
candidate contact pairs) takes ~5 minutes on the single-core CPU test
host. The motion comes through the SAME CSV retargeting pipeline as real
clips (scripts/motion.py csv_to_npz, reference
src/mjlab/scripts/csv_to_npz.py), so the pipeline contract is exercised
end-to-end too."""

from __future__ import annotations

import dataclasses

import numpy as np

from mjlab_tpu.asset_zoo.tiny_bot import TINY_ACTION_SCALE, TINY_ROBOT_CFG
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.tasks import registry
from mjlab_tpu.tasks.tracking.tracking_env_cfg import TrackingEnvCfg
from mjlab_tpu.terrains.importer import TerrainImporterCfg

TRACKED_BODIES = ('base', 'upper_arm', 'forearm')
ANCHOR_BODY = 'base'


def write_tiny_motion(npz_path: str, duration_s: float = 2.0,
                      csv_fps: float = 30.0, output_fps: float = 50.0,
                      tmp_csv: str | None = None) -> str:
  """Author a TinyBot 'arm wave' clip through the full CSV pipeline:
  fixed base pose, sinusoidal shoulder/elbow. Returns npz_path."""
  import os
  import tempfile

  from mjlab_tpu.scripts.motion import csv_to_npz

  t = np.arange(int(duration_s * csv_fps)) / csv_fps
  base = np.tile(np.asarray([0.0, 0.0, 0.075, 1.0, 0.0, 0.0, 0.0]),
                 (len(t), 1))
  joints = np.stack([0.4 * np.sin(2 * np.pi * t / duration_s),
                     0.3 * np.cos(2 * np.pi * t / duration_s) - 0.3], -1)
  rows = np.concatenate([base, joints], -1)
  csv = tmp_csv or os.path.join(tempfile.gettempdir(), 'tiny_motion.csv')
  np.savetxt(csv, rows, delimiter=',')
  csv_to_npz(csv, TINY_ROBOT_CFG, npz_path, input_fps=csv_fps,
             output_fps=output_fps)
  return npz_path


@dataclasses.dataclass
class TinyTrackingEnvCfg(TrackingEnvCfg):

  def __post_init__(self):
    self.scene = SceneCfg(
        num_envs=self.scene.num_envs if self.scene else 4,
        terrain=TerrainImporterCfg(terrain_type='plane'),
        entities={'robot': dataclasses.replace(TINY_ROBOT_CFG)})
    self.actions.joint_pos.scale = TINY_ACTION_SCALE
    cmd = self.commands.motion
    cmd.anchor_body_name = ANCHOR_BODY
    cmd.body_names = TRACKED_BODIES
    # motion_file is set by the caller (tests author a clip per run via
    # write_tiny_motion; there is no cached default for the debug task)
    self.terminations.ee_body_pos.params['body_names'] = ['forearm']
    self.events.foot_friction.params['asset_cfg'] = SceneEntityCfg(
        'robot', geom_names=[r'^foot[0-3]_collision$'])
    self.events.com_randomize.params['asset_cfg'] = SceneEntityCfg(
        'robot', body_names=['base'])
    self.events.qpos0_randomize.params['asset_cfg'] = SceneEntityCfg(
        'robot', joint_names=['shoulder', 'elbow'])
    # TinyBot has no self-collision pairs, hence no such sensor
    self.rewards.self_collisions = None
    self.episode_length_s = 4.0


def _rl_cfg():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='tiny_tracking',
                                save_interval=50, max_iterations=100)


registry.register('Mjlab-Tracking-Flat-Tiny',
                  env_cfg_entry_point=TinyTrackingEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)
