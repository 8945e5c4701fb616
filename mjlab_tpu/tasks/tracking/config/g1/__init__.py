"""G1 tracking task registrations (reference tasks/tracking/config/g1)."""

from mjlab_tpu.tasks import registry
from mjlab_tpu.tasks.tracking.config.g1.flat_env_cfg import (
    G1FlatEnvCfg,
    G1FlatEnvCfg_PLAY,
    G1FlatNoStateEstimationEnvCfg,
    G1FlatNoStateEstimationEnvCfg_PLAY,
)


def _rl_cfg():
  from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
  return RslRlOnPolicyRunnerCfg(experiment_name='g1_tracking')


registry.register('Mjlab-Tracking-Flat-Unitree-G1',
                  env_cfg_entry_point=G1FlatEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)
registry.register('Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation',
                  env_cfg_entry_point=G1FlatNoStateEstimationEnvCfg,
                  rl_cfg_entry_point=_rl_cfg)
registry.register('Mjlab-Tracking-Flat-Unitree-G1-Play',
                  env_cfg_entry_point=G1FlatEnvCfg_PLAY,
                  rl_cfg_entry_point=_rl_cfg)
registry.register('Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation-Play',
                  env_cfg_entry_point=G1FlatNoStateEstimationEnvCfg_PLAY,
                  rl_cfg_entry_point=_rl_cfg)
