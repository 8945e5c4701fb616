"""NaN guard tests (reference tests/test_nan_guard.py: dump on injected
NaN, env-id attribution, one-shot behavior)."""

import glob
import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mjlab_tpu.utils.nan_guard import NanGuard


@struct.dataclass
class _FakeData:
  qpos: jax.Array
  qvel: jax.Array
  qacc: jax.Array
  time: jax.Array


@struct.dataclass
class _FakeState:
  data: _FakeData
  common_step: jax.Array


def _init_state(n=4, nq=3):
  z = jnp.zeros((n, nq))
  return _FakeState(_FakeData(z, z, z, jnp.zeros(n)), jnp.int32(0))


def _make_step(nan_step, nan_env):
  def step(state, action):
    d = state.data
    qpos = d.qpos + action
    inject = (state.common_step == nan_step)
    env_mask = (jnp.arange(qpos.shape[0]) == nan_env)[:, None]
    qpos = jnp.where(inject & env_mask, jnp.nan, qpos)
    return _FakeState(
        _FakeData(qpos, d.qvel, d.qacc, d.time + 0.02),
        state.common_step + 1), (qpos, 0.0)
  return step


def _run(guard, step_fn, n_steps, record_history=False):
  step = jax.jit(guard.wrap(step_fn, record_history=record_history))
  st = _init_state()
  for _ in range(n_steps):
    st, _ = step(st, jnp.full((4, 3), 0.1))
  jax.block_until_ready(st.data.qpos)
  jax.effects_barrier()
  return st


def test_dumps_on_nan_with_env_attribution(tmp_path):
  guard = NanGuard(SimpleNamespace(scene=None), out_dir=str(tmp_path))
  _run(guard, _make_step(nan_step=3, nan_env=2), 6)
  dumps = glob.glob(os.path.join(str(tmp_path), 'nan_dump_*.npz'))
  assert len(dumps) == 1
  blob = np.load(dumps[0])
  assert blob['bad_env_ids'].tolist() == [2]
  assert np.isnan(blob['qpos']).any()


def test_one_shot(tmp_path):
  guard = NanGuard(SimpleNamespace(scene=None), out_dir=str(tmp_path))
  # NaN persists for many steps; only one dump
  def step(state, action):
    d = state.data
    qpos = jnp.where(state.common_step >= 2, jnp.nan, d.qpos + action)
    return _FakeState(
        _FakeData(qpos, d.qvel, d.qacc, d.time), state.common_step + 1), None
  _run(guard, step, 8)
  assert len(glob.glob(os.path.join(str(tmp_path), '*.npz'))) == 1


def test_no_dump_when_finite(tmp_path):
  guard = NanGuard(SimpleNamespace(scene=None), out_dir=str(tmp_path))
  _run(guard, _make_step(nan_step=10 ** 9, nan_env=0), 5)
  assert not glob.glob(os.path.join(str(tmp_path), '*.npz'))


def test_history_mode_records_prior_steps(tmp_path):
  guard = NanGuard(SimpleNamespace(scene=None), out_dir=str(tmp_path),
                   history=10)
  _run(guard, _make_step(nan_step=4, nan_env=1), 6, record_history=True)
  dumps = glob.glob(os.path.join(str(tmp_path), '*.npz'))
  assert len(dumps) == 1
  blob = np.load(dumps[0])
  # history includes steps before the NaN
  assert blob['qpos'].shape[0] > 1
  assert np.isfinite(blob['qpos'][0]).all()
  assert np.isnan(blob['qpos'][-1]).any()


def test_env_step_self_heals_nonfinite_state():
  """An env whose physics state goes non-finite must be force-terminated,
  reset, and produce finite obs/reward (the batched-trainer self-heal the
  reference's dump-only NanGuard lacks)."""
  import jax
  import jax.numpy as jnp
  import numpy as np
  from mjlab_tpu.tasks import registry

  import mjlab_tpu.tasks.velocity.config.tiny  # noqa: F401
  cfg = registry.load_cfg('Mjlab-Velocity-Flat-Tiny')
  cfg.scene.num_envs = 4
  env = registry.make('Mjlab-Velocity-Flat-Tiny', cfg=cfg)
  state, obs = env.init_state(0)
  # poison env 1's velocity state
  qvel = state.data.qvel.at[1, 0].set(jnp.nan)
  state = state.replace(data=state.data.replace(qvel=qvel))
  action = jnp.zeros((4, env.action_dim))
  step = jax.jit(env.step_fn)
  state, (obs, rew, term, trunc, extras) = step(state, action)
  assert bool(term[1]), 'poisoned env must be terminated'
  assert int(extras['Episode_Termination/physics_nan']) >= 1
  for v in obs.values():
    assert bool(jnp.isfinite(v).all()), 'obs must be sanitized'
  assert bool(jnp.isfinite(rew).all()), 'reward must be sanitized'
  # the reset must leave the env steppable with finite state
  state, (obs, rew, term, trunc, extras) = step(state, action)
  assert bool(jnp.isfinite(state.data.qpos).all())
  assert bool(jnp.isfinite(rew).all())
