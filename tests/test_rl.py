"""RL learner tests: GAE vs a slow reference, PPO actually learns on a
contextual-bandit env, running-norm statistics, checkpoint round-trip.

The reference delegates learning to the external rsl_rl package and ships
no learner tests; here the from-scratch JAX PPO (mjlab_tpu/rl/ppo.py) is
validated directly against closed-form references and a learnable toy
task."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
from mjlab_tpu.rl.networks import RunningNorm
from mjlab_tpu.rl.ppo import PPO, Transition
from mjlab_tpu.rl.runner import OnPolicyRunner


class FakeEnv:
  """Contextual regression task: obs in R^4, optimal action = first 2 obs
  components; reward = -|a - target|^2. Episodes truncate every 8 steps."""

  num_envs = 16
  action_dim = 2
  observation_dims = {'policy': 4, 'critic': 4}
  max_episode_length = 8
  step_dt = 0.02
  max_episode_length_s = 0.16

  def _obs(self, key):
    # explicit f32: the test suite enables x64, the learner runs f32.
    # policy/critic must be distinct buffers (donation-safe).
    x = jax.random.normal(key, (self.num_envs, 4), dtype=jnp.float32)
    return {'policy': x, 'critic': jnp.copy(x)}

  def init_state(self, seed=0):
    key = jax.random.PRNGKey(seed)
    k_obs, key = jax.random.split(key)
    obs = self._obs(k_obs)
    state = {'key': key, 'obs': obs,
             't': jnp.zeros(self.num_envs, jnp.int32)}
    # distinct buffers: TrainState donates both env_state and obs
    return state, jax.tree.map(jnp.copy, obs)

  @property
  def step_fn(self):
    def step(state, action):
      target = state['obs']['policy'][:, :2]
      reward = -jnp.sum(jnp.square(action - target),
                        axis=-1).astype(jnp.float32)
      t = state['t'] + 1
      truncated = t >= self.max_episode_length
      terminated = jnp.zeros_like(truncated)
      t = jnp.where(truncated, 0, t)
      key, k_obs = jax.random.split(state['key'])
      obs = self._obs(k_obs)
      new_state = {'key': key, 'obs': obs, 't': t}
      extras = {'time_outs': truncated,
                'reset_count': jnp.sum(truncated).astype(jnp.float32)}
      return new_state, (obs, reward, terminated, truncated, extras)
    return step


def _cfg(**kw):
  cfg = RslRlOnPolicyRunnerCfg(num_steps_per_env=8, **kw)
  cfg.policy.actor_hidden_dims = [32, 32]
  cfg.policy.critic_hidden_dims = [32, 32]
  cfg.algorithm.num_learning_epochs = 4
  cfg.algorithm.num_mini_batches = 2
  cfg.algorithm.learning_rate = 3e-3
  return cfg


def test_gae_matches_reference_loop():
  env = FakeEnv()
  ppo = PPO(env, _cfg())
  alg = ppo.cfg.algorithm
  T, N = 6, 4
  rng = np.random.default_rng(0)
  reward = rng.normal(size=(T, N)).astype(np.float32)
  value = rng.normal(size=(T, N)).astype(np.float32)
  done = rng.uniform(size=(T, N)) < 0.2
  time_out = done & (rng.uniform(size=(T, N)) < 0.5)
  last_value = rng.normal(size=N).astype(np.float32)

  z = jnp.zeros((T, N))
  traj = Transition(actor_obs=z, critic_obs=z, action=z, logprob=z, mean=z,
                    value=jnp.asarray(value), reward=jnp.asarray(reward),
                    done=jnp.asarray(done), time_out=jnp.asarray(time_out))
  adv, returns = ppo._gae(traj, jnp.asarray(last_value))

  # slow reference (rsl_rl semantics: bootstrap value added to reward on
  # time_out; recursion cut by done)
  r = reward + alg.gamma * value * time_out
  ref_adv = np.zeros((T, N), np.float32)
  next_adv = np.zeros(N, np.float32)
  next_val = last_value
  for t in reversed(range(T)):
    nd = 1.0 - done[t]
    delta = r[t] + alg.gamma * next_val * nd - value[t]
    next_adv = delta + alg.gamma * alg.lam * nd * next_adv
    ref_adv[t] = next_adv
    next_val = value[t]
  np.testing.assert_allclose(np.asarray(adv), ref_adv, atol=1e-5)
  np.testing.assert_allclose(np.asarray(returns), ref_adv + value,
                             atol=1e-5)


def test_ppo_learns_contextual_task():
  env = FakeEnv()
  ppo = PPO(env, _cfg())
  ts = ppo.init_state(0)
  rewards = []
  for _ in range(40):
    ts, logs = ppo.learn_iteration(ts)
    rewards.append(float(logs['mean_reward']))
  early = np.mean(rewards[:5])
  late = np.mean(rewards[-5:])
  # optimum is 0; the return must improve by >2x and reach a sane band
  assert late > early * 0.5, (early, late)
  assert late > -60.0, late


def test_running_norm_statistics():
  rng = np.random.default_rng(0)
  data = (rng.normal(size=(1000, 5)) * np.array([1, 2, 3, 4, 5])
          + np.array([0, 1, -1, 10, -10])).astype(np.float32)
  norm = RunningNorm.create(5)
  for chunk in np.split(data, 10):
    norm = norm.update(jnp.asarray(chunk))
  np.testing.assert_allclose(np.asarray(norm.mean), data.mean(0), atol=1e-2)
  np.testing.assert_allclose(np.asarray(norm.var), data.var(0), rtol=0.05)
  x = norm.normalize(jnp.asarray(data))
  assert abs(float(jnp.mean(x))) < 0.05


@pytest.mark.parametrize('full_state', [True, False])
def test_runner_checkpoint_roundtrip(tmp_path, full_state):
  env = FakeEnv()
  runner = OnPolicyRunner(env, _cfg())
  runner.ts, _ = runner.alg.learn_iteration(runner.ts)
  path = str(tmp_path / 'model_1.ckpt')
  runner.save(path, full_state=full_state)

  runner2 = OnPolicyRunner(env, _cfg())
  before = jax.tree.leaves(runner2.ts.params)[0]
  runner2.load(path)
  after = jax.tree.leaves(runner2.ts.params)[0]
  ref = jax.tree.leaves(runner.ts.params)[0]
  assert not np.allclose(np.asarray(before), np.asarray(ref))
  np.testing.assert_array_equal(np.asarray(after), np.asarray(ref))
  # optimizer state restored too
  o1 = jax.tree.leaves(runner.ts.opt_state)
  o2 = jax.tree.leaves(runner2.ts.opt_state)
  for a, b in zip(o1, o2):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inference_policy_deterministic():
  env = FakeEnv()
  ppo = PPO(env, _cfg())
  ts = ppo.init_state(0)
  policy = ppo.policy_fn(ts)
  _, obs = env.init_state(3)
  a1 = np.asarray(policy(obs))
  a2 = np.asarray(policy(obs))
  np.testing.assert_array_equal(a1, a2)
  assert a1.shape == (env.num_envs, env.action_dim)