"""Integration tests: Go1 velocity env end-to-end (smoke-test analog of
reference tests/smoke_test.py + determinism and reset semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.tasks import registry


@pytest.fixture(scope='module')
def go1_env():
  cfg = registry.load_cfg('Mjlab-Velocity-Flat-Unitree-Go1')
  cfg.scene.num_envs = 4
  cfg.episode_length_s = 2.0  # short episodes so time_out resets happen
  return registry.make('Mjlab-Velocity-Flat-Unitree-Go1', cfg=cfg)


def test_env_builds_and_steps(go1_env):
  env = go1_env
  assert env.action_dim == 12
  assert env.observation_dims['policy'] == 48
  obs, _ = env.reset()
  assert obs['policy'].shape == (4, 48)
  a = jnp.zeros((4, 12))
  for _ in range(3):
    obs, rew, term, trunc, extras = env.step(a)
  assert obs['policy'].shape == (4, 48)
  assert rew.shape == (4,)
  assert bool(jnp.isfinite(obs['policy']).all())
  assert bool(jnp.isfinite(rew).all())
  assert 'Episode_Reward/track_lin_vel_exp' in extras


def test_determinism(go1_env):
  env = go1_env
  state0, obs0 = env.init_state(seed=7)
  a = jnp.full((4, 12), 0.1)
  s1, out1 = env._step_jit(jax.tree.map(jnp.copy, state0), a)
  s2, out2 = env._step_jit(jax.tree.map(jnp.copy, state0), a)
  np.testing.assert_array_equal(np.asarray(out1[0]['policy']),
                                np.asarray(out2[0]['policy']))
  np.testing.assert_array_equal(np.asarray(s1.data.qpos),
                                np.asarray(s2.data.qpos))


def test_time_out_reset():
  """Episodes truncate at max length and reset in place. Uses very short
  episodes so truncation fires before any physical termination. TinyBot:
  the truncation plumbing is robot-independent."""
  import mjlab_tpu.tasks.velocity.config.tiny  # noqa: F401
  cfg = registry.load_cfg('Mjlab-Velocity-Flat-Tiny')
  cfg.scene.num_envs = 2
  cfg.episode_length_s = 0.24  # 12 control steps
  env = registry.make('Mjlab-Velocity-Flat-Tiny', cfg=cfg)
  state, _ = env.init_state(seed=3)
  a = jnp.zeros((2, 2))
  saw_timeout = False
  for _ in range(env.max_episode_length + 2):
    state, (obs, rew, term, trunc, extras) = env._step_jit(state, a)
    if bool(jnp.any(trunc)):
      saw_timeout = True
      # after truncation the episode length buffer must be reset
      assert int(jnp.max(jnp.where(trunc, state.episode_length, 0))) == 0
  assert saw_timeout


def test_command_resample_on_reset(go1_env):
  env = go1_env
  state, _ = env.init_state(seed=5)
  cmd0 = np.asarray(state.command['twist']['command'])
  # commands are non-trivial
  assert np.abs(cmd0).max() > 0.0
  assert state.command['twist']['time_left'].shape == (4,)


def test_rough_env_with_terrain_curriculum():
  """Full rough-terrain env: hfield collision in the pipeline, spawn
  origins from the terrain-level curriculum state, level updates on
  reset (reference velocity_env_cfg.py:226-241 terrain curriculum).
  TinyBot rough task: hfield + curriculum plumbing is robot-independent
  (Go1 hfield collision itself is covered by tests/test_terrains.py)."""
  import mjlab_tpu.tasks.velocity.config.tiny  # noqa: F401
  cfg = registry.load_cfg('Mjlab-Velocity-Rough-Tiny')
  cfg.scene.num_envs = 4
  gen = cfg.scene.terrain.terrain_generator
  gen.num_rows, gen.num_cols, gen.border_width = 2, 2, 4.0
  env = registry.make('Mjlab-Velocity-Rough-Tiny', cfg=cfg)
  state, obs = env.init_state(seed=0)
  curr = state.curriculum['terrain_levels']
  assert curr['levels'].shape == (4,)
  assert curr['origins'].shape == (4, 3)
  # spawn positions track per-env origins (xy within the assigned cell)
  xy = np.asarray(state.data.qpos[:, :2])
  np.testing.assert_allclose(xy, np.asarray(curr['origins'][:, :2]),
                             atol=1.0)
  a = jnp.zeros((4, 2))
  for _ in range(5):
    state, (obs, rew, term, trunc, extras) = env._step_jit(state, a)
  assert bool(jnp.all(jnp.isfinite(state.data.qpos)))
  assert bool(jnp.all(jnp.isfinite(rew)))
  # robots stand on the terrain surface, not inside it
  surf = env.scene.terrain.generator.sample_height(
      np.asarray(state.data.qpos[:, 0]), np.asarray(state.data.qpos[:, 1]))
  z_rel = np.asarray(state.data.qpos[:, 2]) - surf
  assert (z_rel > 0.05).all() and (z_rel < 0.6).all()
