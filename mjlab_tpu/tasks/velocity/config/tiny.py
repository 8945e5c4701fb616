"""TinyBot velocity task — fast smoke/debug task, NOT part of the
reference task surface (so it is not imported by registry._import_all;
opt in with MJLAB_TASKS_MODULES=mjlab_tpu.tasks.velocity.config.tiny).

The test suite and the create-a-task tutorial use it: the full manager
stack on a 2-DoF robot with 5 floor-contact geoms compiles in seconds
where G1/Go1 take minutes on a single-core CPU host."""

from __future__ import annotations

import dataclasses

from mjlab_tpu.asset_zoo.tiny_bot import TINY_ACTION_SCALE, TINY_ROBOT_CFG
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.tasks import registry
from mjlab_tpu.tasks.velocity.velocity_env_cfg import (
    LocomotionVelocityEnvCfg,
)
from mjlab_tpu.terrains.importer import TerrainImporterCfg


@dataclasses.dataclass
class TinyVelocityEnvCfg(LocomotionVelocityEnvCfg):

  def __post_init__(self):
    self.scene = SceneCfg(
        num_envs=self.scene.num_envs if self.scene else 4,
        terrain=TerrainImporterCfg(terrain_type='plane'),
        entities={'robot': dataclasses.replace(TINY_ROBOT_CFG)})
    self.actions.joint_pos.scale = TINY_ACTION_SCALE
    self.events.foot_friction.params['asset_cfg'] = SceneEntityCfg(
        'robot', geom_names=[r'^foot[0-3]_collision$'])
    self.rewards.pose.params['std'] = {'.*': 0.5}
    self.curriculum.command_vel = None
    self.episode_length_s = 10.0


def _rl_cfg():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='tiny_velocity',
                                save_interval=50, max_iterations=100)


registry.register('Mjlab-Velocity-Flat-Tiny',
                  env_cfg_entry_point=TinyVelocityEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)


@dataclasses.dataclass
class TinyVelocityRoughEnvCfg(TinyVelocityEnvCfg):
  """Generator terrain + terrain-level curriculum on the TinyBot: the
  hfield collision and curriculum plumbing exercised without a full-robot
  build (tests/test_env.py rough integration)."""

  def __post_init__(self):
    super().__post_init__()
    from mjlab_tpu.managers.term_cfg import CurriculumTermCfg
    from mjlab_tpu.tasks.velocity import mdp
    from mjlab_tpu.tasks.velocity.velocity_env_cfg import (
        make_rough_terrain_cfg,
    )
    self.scene.terrain = make_rough_terrain_cfg()
    self.curriculum.terrain_levels = CurriculumTermCfg(
        func=mdp.terrain_levels_vel,
        params={'command_name': 'twist',
                'asset_cfg': SceneEntityCfg('robot')})


registry.register('Mjlab-Velocity-Rough-Tiny',
                  env_cfg_entry_point=TinyVelocityRoughEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)
