"""Actor-critic networks and empirical observation normalization.

Replaces the reference's external rsl_rl ActorCritic (torch) with flax
modules; see reference src/mjlab/rl/config.py for the config contract
(hidden dims (512, 256, 128), elu, learnable scalar noise std).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

_ACT = {
    'elu': nn.elu, 'relu': nn.relu, 'tanh': nn.tanh, 'gelu': nn.gelu,
    'silu': nn.silu,
}


class MLP(nn.Module):
  hidden_dims: Sequence[int]
  out_dim: int
  activation: str = 'elu'

  @nn.compact
  def __call__(self, x):
    act = _ACT[self.activation]
    for h in self.hidden_dims:
      x = act(nn.Dense(h)(x))
    return nn.Dense(self.out_dim)(x)


class ActorCritic(nn.Module):
  action_dim: int
  actor_hidden_dims: Sequence[int] = (512, 256, 128)
  critic_hidden_dims: Sequence[int] = (512, 256, 128)
  activation: str = 'elu'
  init_noise_std: float = 1.0
  noise_std_type: str = 'scalar'

  def setup(self):
    self.actor = MLP(self.actor_hidden_dims, self.action_dim,
                     self.activation, name='actor')
    self.critic = MLP(self.critic_hidden_dims, 1, self.activation,
                      name='critic')
    if self.noise_std_type == 'scalar':
      self.std_param = self.param(
          'std', lambda k: jnp.full((self.action_dim,),
                                    self.init_noise_std, jnp.float32))
    else:
      self.std_param = self.param(
          'log_std', lambda k: jnp.full((self.action_dim,),
                                        jnp.log(self.init_noise_std),
                                        jnp.float32))

  def __call__(self, actor_obs, critic_obs):
    return (self.actor(actor_obs), self.std(), self.value(critic_obs))

  def std(self):
    if self.noise_std_type == 'scalar':
      return jnp.maximum(self.std_param, 1e-4)
    return jnp.exp(self.std_param)

  def act_mean(self, actor_obs):
    return self.actor(actor_obs)

  def value(self, critic_obs):
    return self.critic(critic_obs)[..., 0]


def gaussian_logprob(mean, std, action):
  var = std * std
  lp = -0.5 * jnp.sum(jnp.square(action - mean) / var
                      + 2 * jnp.log(std) + jnp.log(2 * jnp.pi), axis=-1)
  return lp


def gaussian_entropy(std):
  return jnp.sum(0.5 * (1.0 + jnp.log(2 * jnp.pi)) + jnp.log(std), axis=-1)


@struct.dataclass
class RunningNorm:
  """Empirical normalization (rsl_rl EmpiricalNormalization analog)."""
  mean: jax.Array
  var: jax.Array
  count: jax.Array

  @classmethod
  def create(cls, dim: int):
    return cls(mean=jnp.zeros(dim, jnp.float32),
               var=jnp.ones(dim, jnp.float32),
               count=jnp.float32(1e-4))

  def update(self, batch: jax.Array) -> 'RunningNorm':
    """batch: (..., dim), flattened over leading axes."""
    # keep the normalizer's dtype regardless of input promotion (x64
    # test configs would otherwise widen the train-state pytree)
    x = batch.reshape(-1, batch.shape[-1]).astype(self.mean.dtype)
    bmean = jnp.mean(x, axis=0)
    bvar = jnp.var(x, axis=0)
    bcount = x.shape[0]
    delta = bmean - self.mean
    tot = self.count + jnp.float32(bcount)
    new_mean = self.mean + delta * (bcount / tot)
    m_a = self.var * self.count
    m_b = bvar * bcount
    m2 = m_a + m_b + jnp.square(delta) * self.count * bcount / tot
    return RunningNorm(mean=new_mean, var=m2 / tot, count=tot)

  def normalize(self, x: jax.Array) -> jax.Array:
    # epsilon on std (not var): near-constant dims must not explode
    # (matches rsl_rl EmpiricalNormalization eps semantics)
    return (x - self.mean) / (jnp.sqrt(self.var) + 1e-2)
