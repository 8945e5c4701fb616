"""Training CLI (reference src/mjlab/scripts/train.py).

Usage:
  python -m mjlab_tpu.scripts.train Mjlab-Velocity-Flat-Unitree-Go1 \
      --env.scene.num-envs 4096 --agent.max_iterations 1000
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import os


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('task', help='registered task id (see list_envs)')
  parser.add_argument('--log-root', default='logs')
  parser.add_argument('--resume', action='store_true')
  parser.add_argument('--run-name', default=None)
  parser.add_argument('--enable-nan-guard', action='store_true',
                      help='dump replayable state snapshots when physics '
                           'goes non-finite (reference train.py:56-58)')
  parser.add_argument('--shard', action='store_true',
                      help='shard the env axis over all visible devices '
                           '(jax.sharding Mesh; multi-chip/multi-host)')
  args, overrides = parser.parse_known_args(argv)

  from mjlab_tpu.utils.cache import (apply_platform_env,
                                     setup_compilation_cache)
  apply_platform_env()
  setup_compilation_cache()

  from mjlab_tpu.tasks import registry
  from mjlab_tpu.utils.cli import apply_overrides

  env_cfg = registry.load_cfg(args.task, 'env_cfg_entry_point')
  agent_cfg = registry.load_cfg(args.task, 'rl_cfg_entry_point')

  # route --env.* to env cfg and --agent.* to agent cfg
  env_over, agent_over = [], []
  i = 0
  while i < len(overrides):
    tok = overrides[i]
    take = 1 if '=' in tok else 2
    group = overrides[i:i + take]
    if tok.startswith('--env.'):
      group[0] = '--' + tok[len('--env.'):].lstrip('=')
      env_over += group
    elif tok.startswith('--agent.'):
      group[0] = '--' + tok[len('--agent.'):]
      agent_over += group
    else:
      raise SystemExit(f'unknown flag {tok}; use --env.* or --agent.*')
    i += take
  apply_overrides(env_cfg, env_over)
  apply_overrides(agent_cfg, agent_over)

  stamp = datetime.datetime.now().strftime('%Y-%m-%d_%H-%M-%S')
  run_name = args.run_name or stamp
  log_dir = os.path.join(args.log_root, agent_cfg.experiment_name, run_name)
  os.makedirs(log_dir, exist_ok=True)
  # dump configs for reproducibility (reference train.py:106-107)
  with open(os.path.join(log_dir, 'env_cfg.json'), 'w') as f:
    json.dump(_cfg_to_dict(env_cfg), f, indent=2, default=repr)
  with open(os.path.join(log_dir, 'agent_cfg.json'), 'w') as f:
    json.dump(_cfg_to_dict(agent_cfg), f, indent=2, default=repr)

  env = registry.make(args.task, cfg=env_cfg)
  from mjlab_tpu.rl.runner import get_checkpoint_path, make_runner
  step_fn = None
  if args.enable_nan_guard:
    from mjlab_tpu.utils.nan_guard import NanGuard
    step_fn = NanGuard(
        env, out_dir=os.path.join(log_dir, 'nan_dumps')).wrap(env.step_fn)
  runner = make_runner(env, agent_cfg, log_dir=log_dir, step_fn=step_fn)
  if args.shard:
    from mjlab_tpu.parallel.sharding import enable_sharding
    mesh, runner.ts, _ = enable_sharding(runner.ts, env.num_envs)
    print(f'[train] sharding {env.num_envs} envs over '
          f'{mesh.shape["env"]} devices')
  if args.resume or agent_cfg.resume:
    ckpt = get_checkpoint_path(
        os.path.join(args.log_root, agent_cfg.experiment_name),
        agent_cfg.load_run, agent_cfg.load_checkpoint)
    print(f'[resume] loading {ckpt}')
    runner.load(ckpt)
  from mjlab_tpu.utils.tables import env_summary
  print(env_summary(env), flush=True)
  print(f'[train] task={args.task} envs={env.num_envs} '
        f'action_dim={env.action_dim} obs={env.observation_dims} '
        f'log_dir={log_dir}', flush=True)
  runner.learn(agent_cfg.max_iterations)


def _cfg_to_dict(cfg):
  if dataclasses.is_dataclass(cfg):
    return {f.name: _cfg_to_dict(getattr(cfg, f.name))
            for f in dataclasses.fields(cfg)}
  if isinstance(cfg, dict):
    return {k: _cfg_to_dict(v) for k, v in cfg.items()}
  if isinstance(cfg, (list, tuple)):
    return [_cfg_to_dict(v) for v in cfg]
  return cfg


if __name__ == '__main__':
  main()
