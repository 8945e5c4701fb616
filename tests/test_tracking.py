"""Tracking-task tests: motion pipeline (qpos -> npz), MotionLoader,
full tracking env smoke with RSI + adaptive-sampling state (reference has
no direct analogs; the tracking stack mirrors reference
src/mjlab/tasks/tracking/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mjlab_tpu.scripts.motion import generate_g1_squat_motion
from mjlab_tpu.tasks import registry
from mjlab_tpu.tasks.tracking.mdp.commands import MotionLoader


@pytest.fixture(scope='module')
def motion_file(tmp_path_factory):
  path = str(tmp_path_factory.mktemp('motion') / 'squat.npz')
  generate_g1_squat_motion(path, duration_s=2.0, fps=50.0)
  return path


def test_motion_npz_schema(motion_file):
  blob = np.load(motion_file)
  T = blob['joint_pos'].shape[0]
  assert T == 100
  nj = blob['joint_pos'].shape[1]
  assert blob['joint_vel'].shape == (T, nj)
  for k in ('body_pos_w', 'body_quat_w', 'body_lin_vel_w',
            'body_ang_vel_w'):
    assert blob[k].shape[0] == T
    assert np.isfinite(blob[k]).all()
  # quaternions normalized
  qn = np.linalg.norm(blob['body_quat_w'], axis=-1)
  np.testing.assert_allclose(qn, 1.0, atol=1e-5)
  # squat: anchor height oscillates
  z = blob['body_pos_w'][:, 0, 2]
  assert z.max() - z.min() > 0.05


def test_walk_csv_pipeline(tmp_path):
  """Synthetic walk clip goes through the full CSV retargeting path
  (generate_g1_walk_csv -> csv_to_npz, reference csv_to_npz.py:98-151)."""
  from mjlab_tpu.asset_zoo.unitree_g1 import G1_ROBOT_CFG
  from mjlab_tpu.scripts.motion import csv_to_npz, generate_g1_walk_csv
  csv = str(tmp_path / 'walk.csv')
  generate_g1_walk_csv(csv, duration_s=2.5, fps=30.0)
  raw = np.loadtxt(csv, delimiter=',')
  assert raw.shape[1] == 3 + 4 + 29
  out = str(tmp_path / 'walk.npz')
  csv_to_npz(csv, G1_ROBOT_CFG, out, input_fps=30.0, output_fps=50.0)
  blob = np.load(out)
  assert all(np.isfinite(blob[k]).all() for k in blob.files)
  # the clip actually translates (it is a walk, not a hold)
  root = blob['body_pos_w'][:, 0]
  assert np.linalg.norm(root[-1, :2] - root[0, :2]) > 0.3
  # feet never dip below the plane (ground-clearance projection)
  assert blob['body_pos_w'][..., 2].min() > 0.0
  # resampling hit the requested rate
  assert blob['joint_pos'].shape[0] == pytest.approx(2.5 * 50, abs=2)


def test_motion_loader(motion_file):
  ml = MotionLoader(motion_file, body_indexes=np.array([0, 1, 2]))
  assert ml.time_step_total == 100
  assert ml.body_pos_w.shape[1] == 3


def test_tracking_env_smoke(tmp_path):
  """Full tracking-stack smoke (RSI, adaptive sampling, time stepping)
  on the TinyBot debug task: same manager/command/reward code paths as
  the G1 task at a compile cost of seconds instead of ~5 minutes (the
  G1 tracking env itself is exercised on-chip by training runs and its
  cfg by test_tracking_registry_ids)."""
  import mjlab_tpu.tasks.tracking.config.tiny as tiny  # noqa: F401
  motion_file = tiny.write_tiny_motion(str(tmp_path / 'wave.npz'))
  cfg = registry.load_cfg('Mjlab-Tracking-Flat-Tiny')
  cfg.scene.num_envs = 2
  cfg.commands.motion.motion_file = motion_file
  env = registry.make('Mjlab-Tracking-Flat-Tiny', cfg=cfg)
  state, obs = env.init_state(0)
  assert 'policy' in obs and 'critic' in obs
  # RSI: envs start at sampled motion time steps (copy out: the jitted
  # step donates the state buffers)
  ts = np.asarray(state.command['motion']['time_steps']).copy()
  assert ts.shape == (2,)
  a = jnp.zeros((2, env.action_dim))
  for _ in range(5):
    state, (obs, rew, term, trunc, extras) = env._step_jit(state, a)
  assert bool(jnp.isfinite(rew).all())
  assert bool(jnp.all(jnp.isfinite(state.data.qpos)))
  # time steps advance with the episode
  ts2 = np.asarray(state.command['motion']['time_steps'])
  assert (ts2 >= ts).any()
  # adaptive sampling state present
  assert any('fail' in k or 'bin' in k or 'ema' in k
             for k in state.command['motion'])


def test_tracking_registry_ids():
  ids = registry.registered_tasks()
  for tid in ('Mjlab-Tracking-Flat-Unitree-G1',
              'Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation',
              'Mjlab-Tracking-Flat-Unitree-G1-Play'):
    assert tid in ids