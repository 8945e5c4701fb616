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
  parser.add_argument('--render-env', type=int, default=0,
                      help='env index to render (or first tile with --tile)')
  parser.add_argument('--tile', type=int, default=1,
                      help='render a side-by-side tiling of this many envs')
  parser.add_argument('--camera', default=None,
                      help='model camera name for --render (e.g. tracking)')
  parser.add_argument('--viewer', action='store_true')
  args, overrides = parser.parse_known_args(argv)

  from mjlab_tpu.utils.cache import (apply_platform_env,
                                     setup_compilation_cache)
  apply_platform_env()
  setup_compilation_cache()
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
  resets = 0
  ep_lengths = []
  qpos_hist = []
  render_ids = list(range(args.render_env,
                          args.render_env + args.tile))
  for t in range(args.steps):
    action = policy(obs)
    obs, rew, term, trunc, extras = env.step(action)
    rews.append(np.asarray(rew))
    done = np.asarray(term) | np.asarray(trunc)
    resets += int(done.sum())
    if 'episode_length_sum' in extras and done.any():
      ep_lengths.append(float(np.asarray(extras['episode_length_sum']))
                        / max(int(done.sum()), 1))
    if args.render:
      qpos_hist.append(np.asarray(env.state.data.qpos[render_ids]))
  ep_msg = (f', mean episode length: {np.mean(ep_lengths):.1f}'
            if ep_lengths else '')
  print(f'[play] {args.steps} steps, mean reward/step: '
        f'{np.mean(rews):.4f}, resets: {resets}{ep_msg}')

  if args.render:
    from mjlab_tpu.viewer.offscreen import render_trajectory
    traj = np.stack(qpos_hist)  # (T, tile, nq)
    render_trajectory(env, traj, args.render, camera=args.camera or -1)
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
