"""Noise configurations and functional noise models.

Port of the reference noise surface (reference
src/mjlab/utils/noise/noise_cfg.py and noise_model.py) to explicit-PRNG
JAX: configs are dataclasses; application is a pure function of
(cfg, key, x); the stateful NoiseModelWithAdditiveBias becomes
(init_state, reset, apply) pure functions over a bias array.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class NoiseCfg:
  operation: Literal['add', 'scale', 'abs'] = 'add'


@dataclasses.dataclass
class ConstantNoiseCfg(NoiseCfg):
  bias: float = 0.0


@dataclasses.dataclass
class UniformNoiseCfg(NoiseCfg):
  n_min: float = -1.0
  n_max: float = 1.0


@dataclasses.dataclass
class GaussianNoiseCfg(NoiseCfg):
  mean: float = 0.0
  std: float = 1.0


def apply_noise(cfg: NoiseCfg | None, key: jax.Array, x: jax.Array) -> jax.Array:
  if cfg is None:
    return x
  if isinstance(cfg, ConstantNoiseCfg):
    n = jnp.asarray(cfg.bias, x.dtype)
  elif isinstance(cfg, UniformNoiseCfg):
    n = jax.random.uniform(key, x.shape, x.dtype, cfg.n_min, cfg.n_max)
  elif isinstance(cfg, GaussianNoiseCfg):
    n = cfg.mean + cfg.std * jax.random.normal(key, x.shape, x.dtype)
  else:
    raise TypeError(f'unknown noise cfg {type(cfg)}')
  if cfg.operation == 'add':
    return x + n
  if cfg.operation == 'scale':
    return x * n
  if cfg.operation == 'abs':
    return jnp.broadcast_to(n, x.shape)
  raise ValueError(cfg.operation)


@dataclasses.dataclass
class NoiseModelCfg:
  noise_cfg: NoiseCfg | None = None


@dataclasses.dataclass
class NoiseModelWithAdditiveBiasCfg(NoiseModelCfg):
  """Per-env episode-constant additive bias, resampled on reset
  (reference src/mjlab/utils/noise/noise_model.py:36-83)."""
  bias_noise_cfg: NoiseCfg | None = None


def bias_init(cfg: NoiseModelWithAdditiveBiasCfg, num_envs: int,
              dim: int, dtype=jnp.float32) -> jax.Array:
  del cfg
  return jnp.zeros((num_envs, dim), dtype)


def bias_reset(cfg: NoiseModelWithAdditiveBiasCfg, key: jax.Array,
               bias: jax.Array, reset_mask: jax.Array) -> jax.Array:
  """Resample bias rows where reset_mask is True."""
  new_bias = apply_noise(cfg.bias_noise_cfg, key, jnp.zeros_like(bias))
  return jnp.where(reset_mask[:, None], new_bias, bias)


def bias_apply(cfg: NoiseModelWithAdditiveBiasCfg, key: jax.Array,
               x: jax.Array, bias: jax.Array) -> jax.Array:
  return apply_noise(cfg.noise_cfg, key, x) + bias
