"""Demo: run a pretrained policy out of the box (capability mirror of
reference src/mjlab/scripts/demo.py, which downloads a pretrained
checkpoint + motion from GCS and launches play).

This environment has no egress, so instead of a GCS fetch the demo:
  1. uses a local checkpoint if one exists under --log-root (a policy
     the user trained themselves always wins), else
  2. uses the repo-shipped pretrained checkpoint
     (mjlab_tpu/asset_zoo/pretrained/<experiment>/ — the committed
     analog of the reference's sha256-cached GCS artifact), else
  3. trains a quick policy (a few hundred iterations on the chip — the
     Go1 flat task reaches walking in ~2-4 minutes at 4096 envs), then
  4. runs the play loop (viewer when a display exists, stats otherwise).

Usage: python -m mjlab_tpu.scripts.demo [--task Mjlab-Velocity-Flat-Unitree-Go1]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--task', default='Mjlab-Velocity-Flat-Unitree-Go1')
  p.add_argument('--log-root', default='logs')
  p.add_argument('--train-iterations', type=int, default=300)
  p.add_argument('--num-envs', type=int, default=2048)
  p.add_argument('--steps', type=int, default=300)
  # unknown --env.*/--agent.* flags pass through to play: the shipped
  # tracking policy e.g. needs its walk clip
  # (--env.commands.motion.motion_file artifacts/motions/...npz)
  args, extra = p.parse_known_args(argv)

  from mjlab_tpu.utils.cache import (apply_platform_env,
                                     setup_compilation_cache)
  apply_platform_env()
  setup_compilation_cache()

  from mjlab_tpu.rl.runner import get_checkpoint_path
  from mjlab_tpu.tasks import registry

  agent_cfg = registry.load_cfg(args.task, 'rl_cfg_entry_point')
  ckpt = None
  # A user-trained checkpoint under --log-root takes precedence over the
  # repo-shipped pretrained artifact: someone who trained a newer policy
  # for a shipped experiment must be able to demo it.
  try:
    ckpt = get_checkpoint_path(
        os.path.join(args.log_root, agent_cfg.experiment_name))
    print(f'[demo] found local checkpoint {ckpt}')
  except (FileNotFoundError, OSError):
    pass
  if ckpt is None:
    pretrained_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'asset_zoo', 'pretrained', agent_cfg.experiment_name)
    if os.path.isdir(pretrained_root):
      try:
        ckpt = get_checkpoint_path(os.path.dirname(pretrained_root),
                                   run_regex=agent_cfg.experiment_name)
        print(f'[demo] using shipped pretrained checkpoint {ckpt}')
      except (FileNotFoundError, OSError):
        pass
  if ckpt is None:
    print(f'[demo] no checkpoint under {args.log_root} and no shipped '
          f'pretrained artifact; training {args.train_iterations} '
          f'iterations first (the reference downloads a pretrained one '
          f'from GCS — no egress here)')
    from mjlab_tpu.scripts.train import main as train_main
    train_main([args.task, '--log-root', args.log_root,
                '--run-name', 'demo',
                '--agent.max_iterations', str(args.train_iterations),
                '--env.scene.num_envs', str(args.num_envs)])
    ckpt = get_checkpoint_path(
        os.path.join(args.log_root, agent_cfg.experiment_name))

  from mjlab_tpu.scripts.play import main as play_main
  play_args = [args.task, '--agent', 'trained', '--checkpoint', ckpt,
               '--log-root', args.log_root, '--steps', str(args.steps),
               '--env.scene.num-envs', str(min(args.num_envs, 16))]
  if os.environ.get('DISPLAY'):
    play_args.append('--viewer')
  play_main(play_args + list(extra))


if __name__ == '__main__':
  main()
