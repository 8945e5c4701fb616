"""G1 velocity task registrations (reference tasks/velocity/config/g1)."""

from mjlab_tpu.tasks import registry
from mjlab_tpu.tasks.velocity.config.g1.flat_env_cfg import (
    UnitreeG1FlatEnvCfg,
    UnitreeG1FlatEnvCfg_PLAY,
)


def _rl_cfg():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='g1_flat')


def _rl_cfg_rough():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='g1_rough')


registry.register('Mjlab-Velocity-Flat-Unitree-G1',
                  env_cfg_entry_point=UnitreeG1FlatEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)
registry.register('Mjlab-Velocity-Flat-Unitree-G1-Play',
                  env_cfg_entry_point=UnitreeG1FlatEnvCfg_PLAY,
                  rl_cfg_entry_point=_rl_cfg)


def _rough_cfg():
  from mjlab_tpu.tasks.velocity.config.g1.rough_env_cfg import (
      UnitreeG1RoughEnvCfg,
  )
  return UnitreeG1RoughEnvCfg()


def _rough_cfg_play():
  from mjlab_tpu.tasks.velocity.config.g1.rough_env_cfg import (
      UnitreeG1RoughEnvCfg_PLAY,
  )
  return UnitreeG1RoughEnvCfg_PLAY()


registry.register('Mjlab-Velocity-Rough-Unitree-G1',
                  env_cfg_entry_point=_rough_cfg,
                  rl_cfg_entry_point=_rl_cfg_rough)
registry.register('Mjlab-Velocity-Rough-Unitree-G1-Play',
                  env_cfg_entry_point=_rough_cfg_play,
                  rl_cfg_entry_point=_rl_cfg_rough)
