"""Command manager: stateful command generators as pure state machines.

Mirror of reference src/mjlab/managers/command_manager.py: each term keeps
a per-env countdown clock, resamples on expiry, and exposes a command
array plus logging metrics. State is a pytree dict threaded through the
jitted step.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from mjlab_tpu.managers.term_cfg import CommandTermCfg
from mjlab_tpu.utils.dataclasses import get_terms


class CommandTerm:
  """Base command term. Subclasses implement _resample/_update/_metrics."""

  def __init__(self, cfg: CommandTermCfg, scene, num_envs: int):
    self.cfg = cfg
    self.scene = scene
    self.num_envs = num_envs

  @property
  def dim(self) -> int:
    raise NotImplementedError

  def init_state(self, key: jax.Array) -> dict:
    raise NotImplementedError

  def value(self, state: dict) -> jax.Array:
    return state['command']

  def reset(self, state: dict, ctx, mask: jax.Array, key: jax.Array) -> dict:
    k1, k2 = jax.random.split(key)
    lo, hi = self.cfg.resampling_time_range
    tl = jax.random.uniform(k1, (self.num_envs,), minval=lo, maxval=hi)
    state = dict(state)
    state['time_left'] = jnp.where(mask, tl, state['time_left'])
    state = self._resample(state, ctx, mask, k2)
    # zero metrics on reset
    for k in list(state):
      if k.startswith('metric/'):
        state[k] = jnp.where(mask, 0.0, state[k])
    return state

  def compute(self, state: dict, ctx, key: jax.Array, dt: float) -> dict:
    state = dict(state)
    state = self._update_metrics(state, ctx, dt)
    tl = state['time_left'] - dt
    expired = tl <= 0.0
    k1, k2 = jax.random.split(key)
    lo, hi = self.cfg.resampling_time_range
    tl = jnp.where(expired,
                   jax.random.uniform(k1, tl.shape, minval=lo, maxval=hi),
                   tl)
    state['time_left'] = tl
    state = self._resample(state, ctx, expired, k2)
    state = self._update(state, ctx)
    return state

  def metrics(self, state: dict) -> dict:
    return {k[len('metric/'):]: v for k, v in state.items()
            if k.startswith('metric/')}

  # subclass hooks
  def _resample(self, state, ctx, mask, key):
    return state

  def _update(self, state, ctx):
    return state

  def _update_metrics(self, state, ctx, dt):
    return state

  def debug_vis(self, state, ctx):  # viewer hook
    return ()


class CommandManager:
  def __init__(self, cfg, scene, num_envs: int):
    self.terms: dict[str, CommandTerm] = {}
    for name, tcfg in get_terms(cfg, CommandTermCfg).items():
      self.terms[name] = tcfg.class_type(tcfg, scene, num_envs)

  @property
  def active_terms(self):
    return list(self.terms)

  def init_state(self, key: jax.Array) -> dict:
    st = {}
    for name, term in self.terms.items():
      key, sub = jax.random.split(key)
      st[name] = term.init_state(sub)
    return st

  def values(self, state: dict) -> dict:
    return {name: term.value(state[name])
            for name, term in self.terms.items()}

  def reset(self, state: dict, ctx, mask: jax.Array, key: jax.Array):
    new = {}
    metrics = {}
    for name, term in self.terms.items():
      key, sub = jax.random.split(key)
      # collect metrics of resetting envs before zeroing
      for mk, mv in term.metrics(state[name]).items():
        metrics[f'Metrics/{name}/{mk}'] = mv
      new[name] = term.reset(state[name], ctx, mask, sub)
    return new, metrics

  def compute(self, state: dict, ctx, key: jax.Array, dt: float) -> dict:
    new = {}
    for name, term in self.terms.items():
      key, sub = jax.random.split(key)
      new[name] = term.compute(state[name], ctx, sub, dt)
    return new
