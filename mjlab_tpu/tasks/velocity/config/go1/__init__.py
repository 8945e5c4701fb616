"""Go1 velocity task registrations (reference tasks/velocity/config/go1)."""

from mjlab_tpu.tasks import registry
from mjlab_tpu.tasks.velocity.config.go1.flat_env_cfg import (
    UnitreeGo1FlatEnvCfg,
    UnitreeGo1FlatEnvCfg_PLAY,
)


def _rl_cfg():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='go1_flat')


def _rl_cfg_rough():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='go1_rough')


registry.register('Mjlab-Velocity-Flat-Unitree-Go1',
                  env_cfg_entry_point=UnitreeGo1FlatEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)
registry.register('Mjlab-Velocity-Flat-Unitree-Go1-Play',
                  env_cfg_entry_point=UnitreeGo1FlatEnvCfg_PLAY,
                  rl_cfg_entry_point=_rl_cfg)


def _rough_cfg():
  from mjlab_tpu.tasks.velocity.config.go1.rough_env_cfg import (
      UnitreeGo1RoughEnvCfg,
  )
  return UnitreeGo1RoughEnvCfg()


def _rough_cfg_play():
  from mjlab_tpu.tasks.velocity.config.go1.rough_env_cfg import (
      UnitreeGo1RoughEnvCfg_PLAY,
  )
  return UnitreeGo1RoughEnvCfg_PLAY()


registry.register('Mjlab-Velocity-Rough-Unitree-Go1',
                  env_cfg_entry_point=_rough_cfg,
                  rl_cfg_entry_point=_rl_cfg_rough)
registry.register('Mjlab-Velocity-Rough-Unitree-Go1-Play',
                  env_cfg_entry_point=_rough_cfg_play,
                  rl_cfg_entry_point=_rl_cfg_rough)
