"""G1 velocity task registrations (reference tasks/velocity/config/g1)."""

from mjlab_tpu.tasks import registry
from mjlab_tpu.tasks.velocity.config.g1.flat_env_cfg import (
    UnitreeG1FlatEnvCfg,
    UnitreeG1FlatEnvCfg_PLAY,
)


def _rl_cfg():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='g1_flat')


registry.register('Mjlab-Velocity-Flat-Unitree-G1',
                  env_cfg_entry_point=UnitreeG1FlatEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)
registry.register('Mjlab-Velocity-Flat-Unitree-G1-Play',
                  env_cfg_entry_point=UnitreeG1FlatEnvCfg_PLAY,
                  rl_cfg_entry_point=_rl_cfg)
