"""Policy evaluation / rollout CLI (reference src/mjlab/scripts/play.py).

Runs a zero / random / trained policy and reports tracking statistics; with
--render, writes an mp4 via the offscreen renderer (CPU MuJoCo visual
replay of the device trajectory); with --viewer, opens the interactive
viewer if a display is available.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('task')
  parser.add_argument('--agent', choices=['zero', 'random', 'trained'],
                      default='trained')
  parser.add_argument('--checkpoint', default=None)
  parser.add_argument('--log-root', default='logs')
  parser.add_argument('--steps', type=int, default=300)
  parser.add_argument('--render', default=None,
                      help='write an mp4 rollout video to this path')
  parser.add_argument('--viewer', action='store_true')
  args, overrides = parser.parse_known_args(argv)

  import jax
  import jax.numpy as jnp

  from mjlab_tpu.tasks import registry
  from mjlab_tpu.utils.cli import apply_overrides

  env_cfg = registry.load_cfg(args.task, 'env_cfg_entry_point')
  apply_overrides(env_cfg, [o.replace('--env.', '--') for o in overrides])
  env = registry.make(args.task, cfg=env_cfg)

  if args.agent == 'zero':
    policy = lambda obs: jnp.zeros((env.num_envs, env.action_dim))
  elif args.agent == 'random':
    key = jax.random.PRNGKey(0)

    def policy(obs, _k=[key]):
      _k[0], sub = jax.random.split(_k[0])
      return jax.random.normal(sub, (env.num_envs, env.action_dim))
  else:
    from mjlab_tpu.rl.runner import OnPolicyRunner, get_checkpoint_path
    agent_cfg = registry.load_cfg(args.task, 'rl_cfg_entry_point')
    runner = OnPolicyRunner(env, agent_cfg)
    ckpt = args.checkpoint or get_checkpoint_path(
        f'{args.log_root}/{agent_cfg.experiment_name}')
    print(f'[play] loading {ckpt}')
    runner.load(ckpt)
    policy = runner.get_inference_policy()

  obs, _ = env.reset()
  rews = []
  qpos_hist = []
  for t in range(args.steps):
    action = policy(obs)
    obs, rew, term, trunc, extras = env.step(action)
    rews.append(np.asarray(rew))
    if args.render:
      qpos_hist.append(np.asarray(env.state.data.qpos[0]))
  print(f'[play] {args.steps} steps, mean reward/step: '
        f'{np.mean(rews):.4f}, resets: n/a')

  if args.render:
    from mjlab_tpu.viewer.offscreen import render_trajectory
    render_trajectory(env, np.stack(qpos_hist), args.render)
    print(f'[play] wrote {args.render}')
  if args.viewer:
    # native GUI when a display exists, else viser web viewer
    # (reference play.py:46-54 auto-select)
    import os
    if os.environ.get('DISPLAY'):
      from mjlab_tpu.viewer.native import run_viewer
      run_viewer(env, policy)
    else:
      from mjlab_tpu.viewer.viser_viewer import ViserViewer
      ViserViewer(env, policy).run()


if __name__ == '__main__':
  main()
