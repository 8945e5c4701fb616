"""From-scratch JAX PPO learner with fully on-device rollouts.

Replaces the reference's external rsl_rl OnPolicyRunner (reference
src/mjlab/rl/: rollout storage, GAE, adaptive-KL clipped PPO, checkpoint /
logging). TPU-first design: the entire learning iteration - a
`lax.scan` rollout of num_steps env steps, GAE, and
epochs x minibatches of PPO updates - is ONE jitted function, so a
training iteration is a single XLA program with zero host sync except
metric readout. Hyperparameter semantics follow the reference contract
(reference src/mjlab/rl/config.py:29-66): adaptive KL learning-rate
schedule, clipped value loss, truncation bootstrapping via
extras['time_outs'].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
from mjlab_tpu.rl.networks import (
    ActorCritic,
    RunningNorm,
    gaussian_entropy,
    gaussian_logprob,
)


@struct.dataclass
class TrainState:
  params: Any
  opt_state: Any
  actor_norm: RunningNorm
  critic_norm: RunningNorm
  lr: jax.Array
  env_state: Any
  obs: dict
  rng: jax.Array
  iteration: jax.Array


@struct.dataclass
class Transition:
  actor_obs: jax.Array
  critic_obs: jax.Array
  action: jax.Array
  logprob: jax.Array
  mean: jax.Array
  value: jax.Array
  reward: jax.Array
  done: jax.Array
  time_out: jax.Array


class PPO:
  """Functional PPO bound to a ManagerBasedRlEnv.

  `step_fn` may be wrapped (e.g. by NanGuard) via the `step_fn` kwarg."""

  def __init__(self, env, cfg: RslRlOnPolicyRunnerCfg, step_fn=None):
    self.env = env
    self.cfg = cfg
    self._step_fn = step_fn or env.step_fn
    # when cfg.video is set, the rollout also emits env-0 qpos per step
    # (tiny: (T, nq)) so the runner can buffer training-video frames
    # without any extra rollouts or host syncs
    self._record_qpos = bool(getattr(cfg, 'video', False))
    pol = cfg.policy
    alg = cfg.algorithm

    self.actor_groups = cfg.obs_groups['policy']
    self.critic_groups = cfg.obs_groups['critic']
    dims = env.observation_dims
    self.actor_dim = sum(dims[g] for g in self.actor_groups)
    self.critic_dim = sum(dims[g] for g in self.critic_groups)
    self.action_dim = env.action_dim

    self.net = ActorCritic(
        action_dim=self.action_dim,
        actor_hidden_dims=tuple(pol.actor_hidden_dims),
        critic_hidden_dims=tuple(pol.critic_hidden_dims),
        activation=pol.activation,
        init_noise_std=pol.init_noise_std,
        noise_std_type=pol.noise_std_type)

    self.tx = optax.chain(
        optax.clip_by_global_norm(alg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=alg.learning_rate))

    self._learn_jit = jax.jit(self._learn_iteration, donate_argnums=(0,))

  # ------------------------------------------------------------------
  def _cat_obs(self, obs: dict, groups) -> jax.Array:
    return jnp.concatenate([obs[g] for g in groups], axis=-1)

  def init_state(self, seed: int | None = None) -> TrainState:
    seed = self.cfg.seed if seed is None else seed
    env_state, obs = self.env.init_state(seed)
    rng = jax.random.PRNGKey(seed + 1)
    rng, k = jax.random.split(rng)
    params = self.net.init(
        k, jnp.zeros((1, self.actor_dim)), jnp.zeros((1, self.critic_dim)))
    return TrainState(
        params=params,
        opt_state=self.tx.init(params),
        actor_norm=RunningNorm.create(self.actor_dim),
        critic_norm=RunningNorm.create(self.critic_dim),
        lr=jnp.float32(self.cfg.algorithm.learning_rate),
        env_state=env_state,
        obs=obs,
        rng=rng,
        iteration=jnp.zeros((), jnp.int32))

  # ------------------------------------------------------------------
  def _policy(self, params, actor_norm, critic_norm, obs):
    a_obs = self._cat_obs(obs, self.actor_groups)
    c_obs = self._cat_obs(obs, self.critic_groups)
    if self.cfg.policy.actor_obs_normalization:
      a_obs_n = actor_norm.normalize(a_obs)
    else:
      a_obs_n = a_obs
    if self.cfg.policy.critic_obs_normalization:
      c_obs_n = critic_norm.normalize(c_obs)
    else:
      c_obs_n = c_obs
    mean, std, value = self.net.apply(params, a_obs_n, c_obs_n)
    return a_obs, c_obs, a_obs_n, c_obs_n, mean, std, value

  def _rollout(self, ts: TrainState):
    alg = self.cfg.algorithm

    def step(carry, _):
      (env_state, obs, rng, a_norm, c_norm, reward_acc, len_acc, ep_rew,
       ep_len, nresets) = carry
      rng, k_act = jax.random.split(rng)
      a_obs, c_obs, a_n, c_n, mean, std, value = self._policy(
          ts.params, a_norm, c_norm, obs)
      a_norm = a_norm.update(a_obs)
      c_norm = c_norm.update(c_obs)
      action = mean + std * jax.random.normal(k_act, mean.shape)
      if self.cfg.clip_actions is not None:
        action = jnp.clip(action, -self.cfg.clip_actions,
                          self.cfg.clip_actions)
      logprob = gaussian_logprob(mean, std, action)
      env_state, (next_obs, reward, terminated, truncated, extras) = \
          self._step_fn(env_state, action)
      # pin learner-visible dtypes: under x64 configs parts of the env
      # output widen to f64, which would break the scan carry contract
      f32c = lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a
      next_obs = jax.tree.map(f32c, next_obs)
      reward = f32c(reward)
      done = terminated | truncated
      # episode stats
      reward_acc = reward_acc + reward
      len_acc = len_acc + 1
      ep_rew = ep_rew + jnp.sum(jnp.where(done, reward_acc, 0.0))
      ep_len = ep_len + jnp.sum(jnp.where(done, len_acc.astype(reward.dtype),
                                          0.0))
      nresets = nresets + jnp.sum(done.astype(reward.dtype))
      reward_acc = jnp.where(done, 0.0, reward_acc)
      len_acc = jnp.where(done, 0, len_acc)
      tr = Transition(actor_obs=a_n, critic_obs=c_n, action=action,
                      logprob=logprob, mean=mean, value=value, reward=reward,
                      done=done, time_out=extras['time_outs'])
      log_extras = {k: v for k, v in extras.items() if k != 'time_outs'}
      ys = (tr, log_extras)
      if self._record_qpos:
        ys = ys + (env_state.data.qpos[0],)
      return ((env_state, next_obs, rng, a_norm, c_norm, reward_acc,
               len_acc, ep_rew, ep_len, nresets), ys)

    n = self.env.num_envs
    f32 = jnp.float32
    obs0 = jax.tree.map(
        lambda a: a.astype(f32) if a.dtype == jnp.float64 else a, ts.obs)
    carry0 = (ts.env_state, obs0, ts.rng, ts.actor_norm, ts.critic_norm,
              jnp.zeros(n, f32), jnp.zeros(n, jnp.int32),
              jnp.zeros((), f32), jnp.zeros((), f32), jnp.zeros((), f32))
    carry, ys = jax.lax.scan(
        step, carry0, None, length=self.cfg.num_steps_per_env)
    if self._record_qpos:
      traj, extras, qpos_traj0 = ys
    else:
      (traj, extras), qpos_traj0 = ys, None
    (env_state, last_obs, rng, a_norm, c_norm, _, _, ep_rew, ep_len,
     nresets) = carry

    # bootstrap value for last obs
    _, _, _, _, _, _, last_value = self._policy(
        ts.params, a_norm, c_norm, last_obs)

    stats = {'ep_rew': ep_rew, 'ep_len': ep_len, 'nresets': nresets}
    del alg
    return (env_state, last_obs, rng, traj, last_value, extras, stats,
            a_norm, c_norm, qpos_traj0)

  def _gae(self, traj: Transition, last_value):
    alg = self.cfg.algorithm
    # truncation bootstrapping (rsl_rl: r += gamma * V(s) on time_out)
    reward = traj.reward + (alg.gamma * traj.value
                            * traj.time_out.astype(traj.reward.dtype))
    not_done = 1.0 - traj.done.astype(traj.reward.dtype)

    def back(carry, inp):
      adv_next, v_next = carry
      r, v, nd = inp
      delta = r + alg.gamma * v_next * nd - v
      adv = delta + alg.gamma * alg.lam * nd * adv_next
      return (adv, v), adv

    (_, _), adv = jax.lax.scan(
        back, (jnp.zeros_like(last_value), last_value),
        (reward, traj.value, not_done), reverse=True)
    returns = adv + traj.value
    return adv, returns

  def _update(self, ts: TrainState, traj: Transition, adv, returns, rng):
    alg = self.cfg.algorithm
    T, N = traj.reward.shape
    batch = T * N
    mb = batch // alg.num_mini_batches

    flat = jax.tree.map(lambda x: x.reshape((batch,) + x.shape[2:]), traj)
    adv_f = adv.reshape(batch)
    ret_f = returns.reshape(batch)
    if not alg.normalize_advantage_per_mini_batch:
      adv_f = (adv_f - adv_f.mean()) / (adv_f.std() + 1e-8)

    old_std = self.net.apply(ts.params, method=ActorCritic.std)

    def loss_fn(params, mb_data, lr):
      o_a, o_c, act, old_lp, old_mean, old_v, a, ret = mb_data
      mean = self.net.apply(params, o_a, method=ActorCritic.act_mean)
      std = self.net.apply(params, method=ActorCritic.std)
      value = self.net.apply(params, o_c, method=ActorCritic.value)
      lp = gaussian_logprob(mean, std, act)
      ratio = jnp.exp(lp - old_lp)
      if alg.normalize_advantage_per_mini_batch:
        a = (a - a.mean()) / (a.std() + 1e-8)
      surr1 = -a * ratio
      surr2 = -a * jnp.clip(ratio, 1 - alg.clip_param, 1 + alg.clip_param)
      pg_loss = jnp.mean(jnp.maximum(surr1, surr2))
      if alg.use_clipped_value_loss:
        v_clipped = old_v + jnp.clip(value - old_v, -alg.clip_param,
                                     alg.clip_param)
        v_loss = jnp.mean(jnp.maximum(jnp.square(value - ret),
                                      jnp.square(v_clipped - ret)))
      else:
        v_loss = jnp.mean(jnp.square(value - ret))
      ent = jnp.mean(gaussian_entropy(std))
      loss = pg_loss + alg.value_loss_coef * v_loss - alg.entropy_coef * ent
      # analytic Gaussian KL for the adaptive schedule (rsl_rl formula)
      kl = jnp.sum(
          jnp.log(std / old_std + 1e-10)
          + (jnp.square(old_std) + jnp.square(old_mean - mean))
          / (2.0 * jnp.square(std)) - 0.5, axis=-1)
      kl = jnp.mean(kl)
      return loss, (pg_loss, v_loss, ent, kl)

    def epoch(carry, _):
      params, opt_state, lr, rng, logs = carry
      rng, k = jax.random.split(rng)
      perm = jax.random.permutation(k, batch)

      def minibatch(carry, i):
        params, opt_state, lr, logs = carry
        idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
        mb_data = (flat.actor_obs[idx], flat.critic_obs[idx],
                   flat.action[idx], flat.logprob[idx], flat.mean[idx],
                   flat.value[idx], adv_f[idx], ret_f[idx])
        (loss, (pg, vl, ent, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb_data, lr)
        # adaptive KL lr schedule (rsl_rl)
        if alg.schedule == 'adaptive':
          lr = jnp.where(kl > alg.desired_kl * 2.0,
                         jnp.maximum(lr / 1.5, 1e-5), lr)
          lr = jnp.where((kl < alg.desired_kl / 2.0) & (kl > 0.0),
                         jnp.minimum(lr * 1.5, 1e-2), lr)
        opt_state[1].hyperparams['learning_rate'] = lr  # type: ignore
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        logs = jax.tree.map(jnp.add, logs,
                            {'loss': loss, 'pg': pg, 'v': vl, 'ent': ent,
                             'kl': kl})
        return (params, opt_state, lr, logs), None

      (params, opt_state, lr, logs), _ = jax.lax.scan(
          minibatch, (params, opt_state, lr, logs),
          jnp.arange(alg.num_mini_batches))
      return (params, opt_state, lr, rng, logs), None

    logs0 = {k: jnp.zeros(()) for k in ('loss', 'pg', 'v', 'ent', 'kl')}
    (params, opt_state, lr, rng, logs), _ = jax.lax.scan(
        epoch, (ts.params, ts.opt_state, ts.lr, rng, logs0), None,
        length=alg.num_learning_epochs)
    denom = alg.num_learning_epochs * alg.num_mini_batches
    logs = jax.tree.map(lambda x: x / denom, logs)
    return params, opt_state, lr, rng, logs

  def _learn_iteration(self, ts: TrainState):
    (env_state, last_obs, rng, traj, last_value, extras, stats, a_norm,
     c_norm, qpos_traj0) = self._rollout(ts)
    adv, returns = self._gae(traj, last_value)

    params, opt_state, lr, rng, logs = self._update(ts, traj, adv, returns,
                                                    rng)

    # aggregate episode logs
    nresets = jnp.maximum(stats['nresets'], 1.0)
    logs['mean_reward'] = jnp.mean(traj.reward) / self.env.step_dt
    logs['mean_episode_reward'] = stats['ep_rew'] / nresets
    logs['resets'] = stats['nresets']
    logs['lr'] = lr
    logs['std'] = jnp.mean(self.net.apply(params, method=ActorCritic.std))
    # env extras: weighted mean over steps by reset counts
    w = jnp.maximum(extras['reset_count'], 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    for k, v in extras.items():
      if k in ('reset_count', 'episode_length_sum'):
        continue
      if k.startswith('Episode_Termination'):
        logs[k] = jnp.sum(v)
      else:
        logs[k] = jnp.sum(v * w) / wsum
    # true episode length from the env (the rollout-local counter would
    # cap at num_steps_per_env)
    if 'episode_length_sum' in extras:
      logs['mean_episode_length'] = jnp.sum(
          extras['episode_length_sum']) / wsum
    else:
      logs['mean_episode_length'] = stats['ep_len'] / nresets

    if qpos_traj0 is not None:
      logs['_qpos_env0'] = qpos_traj0  # (T, nq), popped by the runner

    ts = ts.replace(params=params, opt_state=opt_state, lr=lr,
                    env_state=env_state, obs=last_obs, rng=rng,
                    actor_norm=a_norm, critic_norm=c_norm,
                    iteration=ts.iteration + 1)
    return ts, logs

  def learn_iteration(self, ts: TrainState):
    return self._learn_jit(ts)

  # inference
  def policy_fn(self, ts: TrainState):
    def act(obs):
      a_obs = self._cat_obs(obs, self.actor_groups)
      if self.cfg.policy.actor_obs_normalization:
        a_obs = ts.actor_norm.normalize(a_obs)
      return self.net.apply(ts.params, a_obs, method=ActorCritic.act_mean)
    return jax.jit(act)
