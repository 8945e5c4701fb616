"""CLI smoke tests: the console entry points must run end-to-end
(reference analog: smoke_test.py + the packaged-wheel smoke in the
reference Makefile)."""

import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(mod, *args, timeout=900):
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  # the axon plugin ignores JAX_PLATFORMS; the CLIs honor this instead
  env['MJLAB_PLATFORM'] = 'cpu'
  # register the fast TinyBot smoke task inside the CLI subprocess
  env['MJLAB_TASKS_MODULES'] = 'mjlab_tpu.tasks.velocity.config.tiny'
  out = subprocess.run(
      [sys.executable, '-m', mod, *args], capture_output=True, text=True,
      timeout=timeout, cwd=_REPO, env=env)
  assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
  return out.stdout


def test_list_envs_cli():
  out = _run('mjlab_tpu.scripts.list_envs')
  assert 'Mjlab-Velocity-Flat-Unitree-Go1' in out
  assert 'Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation-Play' in out


def test_play_cli_zero_agent():
  out = _run('mjlab_tpu.scripts.play', 'Mjlab-Velocity-Flat-Tiny',
             '--agent', 'zero', '--steps', '3',
             '--env.scene.num_envs', '2')
  assert 'steps' in out or 'reward' in out.lower()


def test_motion_cli_synthetic(tmp_path):
  npz = str(tmp_path / 'sq.npz')
  _run('mjlab_tpu.scripts.motion', '--output', npz, '--synthetic-squat')
  blob = np.load(npz)
  assert blob['joint_pos'].shape[0] == 400


def test_train_then_play_trained_roundtrip(tmp_path):
  """The full user path: train 2 iterations -> checkpoint on disk ->
  play --agent trained finds and loads it (reference train.py/play.py)."""
  import pytest
  pytest.importorskip('tensorboardX')  # --agent.logger tensorboard below
  log_root = str(tmp_path / 'logs')
  _run('mjlab_tpu.scripts.train', 'Mjlab-Velocity-Flat-Tiny',
       '--log-root', log_root, '--run-name', 'smoke',
       '--env.scene.num_envs', '4',
       '--agent.max_iterations', '2',
       '--agent.num_steps_per_env', '4',
       '--agent.save_interval', '2',
       '--agent.logger', 'tensorboard')
  import glob
  ckpts = glob.glob(f'{log_root}/**/model_*', recursive=True)
  assert ckpts, f'no checkpoint written under {log_root}'
  # tensorboard event files present (writer stack wired through runner)
  assert glob.glob(f'{log_root}/**/events.out.tfevents.*', recursive=True)
  out = _run('mjlab_tpu.scripts.play', 'Mjlab-Velocity-Flat-Tiny',
             '--agent', 'trained', '--log-root', log_root,
             '--steps', '3', '--env.scene.num_envs', '4')
  assert 'loading' in out
