"""Functional manager stack: action / observation / reward / termination /
event / curriculum managers.

Capability mirror of reference src/mjlab/managers/ with a pure-functional
core: each manager is constructed once at env-build time (resolving
regexes, probing term dimensions, allocating state templates) and then
exposes pure `compute`/`reset` functions over (EnvCtx, state pytree, PRNG
key). Term discovery scans config dataclass fields by type
(reference src/mjlab/managers/manager_base.py:47-93).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.term_cfg import (
    ActionTermCfg,
    CommandTermCfg,
    CurriculumTermCfg,
    EventTermCfg,
    ObservationGroupCfg,
    ObservationTermCfg,
    RewardTermCfg,
    SceneEntityCfg,
    TerminationTermCfg,
)
from mjlab_tpu.utils import buffers, noise as noise_utils
from mjlab_tpu.utils.dataclasses import get_terms


def _resolve_params(params: dict, scene, func=None) -> dict:
  import copy
  import inspect
  out = {}
  for k, v in params.items():
    if isinstance(v, SceneEntityCfg):
      out[k] = copy.deepcopy(v).resolve(scene)
    else:
      out[k] = v
  if func is not None:
    # resolve SceneEntityCfg defaults not overridden by params (terms use a
    # shared default instance; it must never be resolved in place)
    try:
      sig = inspect.signature(func)
    except (TypeError, ValueError):
      return out
    for pname, p in sig.parameters.items():
      if pname not in out and isinstance(p.default, SceneEntityCfg):
        out[pname] = copy.deepcopy(p.default).resolve(scene)
  return out


# ---------------------------------------------------------------------------
# Action manager
# ---------------------------------------------------------------------------


class ActionTerm:
  """Base action term: built from cfg + scene; pure process/apply."""

  def __init__(self, cfg: ActionTermCfg, scene, num_envs: int):
    self.cfg = cfg
    self.scene = scene
    self.num_envs = num_envs

  @property
  def action_dim(self) -> int:
    raise NotImplementedError

  def process(self, action: jax.Array) -> jax.Array:
    return action

  def apply(self, ctx, data, processed: jax.Array):
    raise NotImplementedError

  def reset(self, processed, mask):
    return processed


class ActionManager:
  def __init__(self, cfg, scene, num_envs: int):
    self.terms: dict[str, ActionTerm] = {}
    for name, tcfg in get_terms(cfg, ActionTermCfg).items():
      self.terms[name] = tcfg.class_type(tcfg, scene, num_envs)
    self.dims = [t.action_dim for t in self.terms.values()]
    self.total_dim = sum(self.dims)

  @property
  def active_terms(self):
    return list(self.terms)

  def process(self, action: jax.Array) -> jax.Array:
    """Split + per-term process; returns concatenated processed actions."""
    out = []
    ofs = 0
    for t, d in zip(self.terms.values(), self.dims):
      out.append(t.process(action[:, ofs:ofs + d]))
      ofs += d
    return jnp.concatenate(out, axis=-1) if out else action

  def apply(self, ctx, data, processed: jax.Array):
    ofs = 0
    for t, d in zip(self.terms.values(), self.dims):
      data = t.apply(ctx, data, processed[:, ofs:ofs + d])
      ofs += d
    return data


# ---------------------------------------------------------------------------
# Observation manager
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _ObsTermInfo:
  name: str
  cfg: ObservationTermCfg
  params: dict
  dim: int
  history: int  # effective history length (0 = none)
  flatten: bool
  has_bias_model: bool


class ObservationManager:
  """Groups of observation terms with noise/clip/scale/history pipeline
  (reference src/mjlab/managers/observation_manager.py:144-188)."""

  def __init__(self, cfg, scene, num_envs: int, probe_ctx_fn: Callable):
    self.scene = scene
    self.num_envs = num_envs
    self.groups: dict[str, list[_ObsTermInfo]] = {}
    self.group_cfgs: dict[str, ObservationGroupCfg] = {}
    for gname, gcfg in get_terms(cfg, ObservationGroupCfg).items():
      terms = []
      for tname, tcfg in get_terms(gcfg, ObservationTermCfg).items():
        params = _resolve_params(tcfg.params, scene, tcfg.func)
        # probe dimension by abstract evaluation on a template context
        shape = probe_ctx_fn(tcfg.func, params)
        dim = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        hist = (gcfg.history_length if gcfg.history_length is not None
                else tcfg.history_length)
        flatten = (gcfg.flatten_history_dim if gcfg.history_length is not None
                   else tcfg.flatten_history_dim)
        has_bias = isinstance(tcfg.noise,
                              noise_utils.NoiseModelWithAdditiveBiasCfg)
        terms.append(_ObsTermInfo(tname, tcfg, params, dim, hist or 0,
                                  flatten, has_bias))
      self.groups[gname] = terms
      self.group_cfgs[gname] = gcfg

  def group_dim(self, gname: str) -> int:
    total = 0
    for t in self.groups[gname]:
      d = t.dim
      if t.history:
        d = d * t.history if t.flatten else d
      total += d
    return total

  def init_state(self, dtype=jnp.float32) -> dict:
    st: dict = {}
    for gname, terms in self.groups.items():
      for t in terms:
        key = f'{gname}/{t.name}'
        if t.history:
          st[f'{key}/hist'] = buffers.create(self.num_envs, t.history, t.dim,
                                             dtype)
        if t.has_bias_model:
          st[f'{key}/bias'] = noise_utils.bias_init(
              t.cfg.noise, self.num_envs, t.dim, dtype)
    return st

  def reset(self, state: dict, mask: jax.Array, key: jax.Array) -> dict:
    out = dict(state)
    for gname, terms in self.groups.items():
      for t in terms:
        k = f'{gname}/{t.name}'
        if f'{k}/hist' in out:
          out[f'{k}/hist'] = buffers.reset(out[f'{k}/hist'], mask)
        if f'{k}/bias' in out:
          key, sub = jax.random.split(key)
          out[f'{k}/bias'] = noise_utils.bias_reset(
              t.cfg.noise, sub, out[f'{k}/bias'], mask)
    return out

  def compute(self, ctx, state: dict, key: jax.Array,
              update_history: bool = True) -> tuple[dict, dict]:
    obs: dict = {}
    new_state = dict(state)
    for gname, terms in self.groups.items():
      gcfg = self.group_cfgs[gname]
      pieces = []
      for t in terms:
        val = t.cfg.func(ctx, **t.params)
        val = val.reshape(ctx.num_envs, -1)
        if gcfg.enable_corruption and t.cfg.noise is not None:
          key, sub = jax.random.split(key)
          if t.has_bias_model:
            val = noise_utils.bias_apply(
                t.cfg.noise, sub, val, new_state[f'{gname}/{t.name}/bias'])
          else:
            val = noise_utils.apply_noise(t.cfg.noise, sub, val)
        if t.cfg.clip is not None:
          val = jnp.clip(val, t.cfg.clip[0], t.cfg.clip[1])
        if t.cfg.scale is not None:
          val = val * jnp.asarray(t.cfg.scale, val.dtype)
        if t.history:
          hk = f'{gname}/{t.name}/hist'
          cb = new_state[hk]
          if update_history:
            cb = buffers.append(cb, val)
            new_state[hk] = cb
          frames = buffers.all_frames(cb)  # (N, H, d) oldest->newest
          val = frames.reshape(ctx.num_envs, -1) if t.flatten else frames
        pieces.append(val)
      if gcfg.concatenate_terms:
        obs[gname] = jnp.concatenate(pieces, axis=-1) if pieces else \
            jnp.zeros((ctx.num_envs, 0))
      else:
        obs[gname] = {t.name: p for t, p in zip(terms, pieces)}
    return obs, new_state


# ---------------------------------------------------------------------------
# Reward manager
# ---------------------------------------------------------------------------


class RewardManager:
  """Stateless terms are plain functions `f(ctx, **params) -> (N,)`;
  stateful terms (e.g. feet_air_time per-foot clocks, reference
  tasks/velocity/mdp/rewards.py:52-153 class terms) declare
  `func.init_state(num_envs=..., **params)` and have signature
  `f(ctx, state, **params) -> (value, new_state)`. Their state lives in
  EnvState.reward and is masked to the init value on env reset."""

  def __init__(self, cfg, scene):
    self.terms: dict[str, RewardTermCfg] = {}
    self.params: dict[str, dict] = {}
    for name, tcfg in get_terms(cfg, RewardTermCfg).items():
      self.terms[name] = tcfg
      self.params[name] = _resolve_params(tcfg.params, scene, tcfg.func)

  @property
  def active_terms(self):
    return list(self.terms)

  def init_state(self, num_envs: int) -> dict:
    st = {}
    for name, tcfg in self.terms.items():
      init_fn = getattr(tcfg.func, 'init_state', None)
      # weight-0 terms are skipped entirely (reference
      # reward_manager.py:82-83), so they carry no state either
      if init_fn is not None and tcfg.weight != 0.0:
        st[name] = init_fn(num_envs=num_envs, **self.params[name])
    return st

  def reset_state(self, state: dict, mask: jax.Array) -> dict:
    new = dict(state)
    for name in state:
      reset_fn = getattr(self.terms[name].func, 'reset_state', None)
      if reset_fn is not None:
        new[name] = reset_fn(state[name], mask)
      else:
        new[name] = jax.tree.map(
            lambda x: jnp.where(
                mask.reshape((-1,) + (1,) * (x.ndim - 1)),
                jnp.zeros_like(x), x), state[name])
    return new

  def compute(self, ctx, episode_sums: jax.Array, dt: float,
              state: dict | None = None):
    """Returns (reward (N,), new episode_sums, per-term dict, new state)."""
    n = ctx.num_envs
    total = jnp.zeros(n, ctx.data.qpos.dtype)
    values = {}
    sums = episode_sums
    new_state = dict(state or {})
    for i, (name, tcfg) in enumerate(self.terms.items()):
      if tcfg.weight == 0.0:
        values[name] = jnp.zeros(n, total.dtype)
        continue
      if state is not None and name in state:
        raw, new_state[name] = tcfg.func(ctx, state[name],
                                         **self.params[name])
      else:
        raw = tcfg.func(ctx, **self.params[name])
      v = raw * tcfg.weight * dt
      values[name] = v
      total = total + v
      sums = sums.at[:, i].add(v)
    return total, sums, values, new_state


# ---------------------------------------------------------------------------
# Termination manager
# ---------------------------------------------------------------------------


class TerminationManager:
  def __init__(self, cfg, scene):
    self.terms: dict[str, TerminationTermCfg] = {}
    self.params: dict[str, dict] = {}
    for name, tcfg in get_terms(cfg, TerminationTermCfg).items():
      self.terms[name] = tcfg
      self.params[name] = _resolve_params(tcfg.params, scene, tcfg.func)

  @property
  def active_terms(self):
    return list(self.terms)

  def compute(self, ctx):
    n = ctx.num_envs
    terminated = jnp.zeros(n, bool)
    truncated = jnp.zeros(n, bool)
    per_term = {}
    for name, tcfg in self.terms.items():
      v = tcfg.func(ctx, **self.params[name]).astype(bool)
      per_term[name] = v
      if tcfg.time_out:
        truncated = truncated | v
      else:
        terminated = terminated | v
    return terminated, truncated, per_term


# ---------------------------------------------------------------------------
# Event manager
# ---------------------------------------------------------------------------


class EventManager:
  """Modes: startup (model/data transform at build), reset (masked data
  transform), interval (per-env or global clocks)
  (reference src/mjlab/managers/event_manager.py)."""

  def __init__(self, cfg, scene, num_envs: int, step_dt: float):
    self.scene = scene
    self.num_envs = num_envs
    self.step_dt = step_dt
    self.startup_terms: dict[str, tuple[EventTermCfg, dict]] = {}
    self.reset_terms: dict[str, tuple[EventTermCfg, dict]] = {}
    self.interval_terms: dict[str, tuple[EventTermCfg, dict]] = {}
    for name, tcfg in get_terms(cfg, EventTermCfg).items():
      params = _resolve_params(tcfg.params, scene, tcfg.func)
      if tcfg.mode == 'startup':
        self.startup_terms[name] = (tcfg, params)
      elif tcfg.mode == 'reset':
        self.reset_terms[name] = (tcfg, params)
      elif tcfg.mode == 'interval':
        if tcfg.interval_range_s is None:
          raise ValueError(f'interval event {name} needs interval_range_s')
        self.interval_terms[name] = (tcfg, params)
      else:
        raise ValueError(f'unknown event mode {tcfg.mode}')

  def domain_randomization_fields(self) -> list[str]:
    """Model fields touched by randomize_field terms -> need per-env
    expansion (reference event_manager.py:210-213)."""
    fields = []
    for tcfg, params in list(self.startup_terms.values()) + \
        list(self.reset_terms.values()):
      f = getattr(tcfg.func, 'randomized_field', None)
      if f is None and 'field' in params:
        f = params['field']
      if f is not None and getattr(tcfg.func, 'is_model_event', False):
        fields.append(f)
    return fields

  def init_state(self, key: jax.Array) -> dict:
    st = {}
    for name, (tcfg, _) in self.interval_terms.items():
      lo, hi = tcfg.interval_range_s
      key, sub = jax.random.split(key)
      shape = () if tcfg.is_global_time else (self.num_envs,)
      st[f'{name}/time_left'] = jax.random.uniform(
          sub, shape, minval=lo, maxval=hi)
    for name, (tcfg, _) in self.reset_terms.items():
      if tcfg.min_step_count_between_reset > 0:
        # per-env step of the last trigger; -1 = never triggered
        # (reference event_manager.py:139-165 per-env trigger counts)
        st[f'{name}/last_trigger'] = jnp.full(
            (self.num_envs,), -1, jnp.int32)
    return st

  def apply_startup(self, model, data, key: jax.Array):
    for name, (tcfg, params) in self.startup_terms.items():
      key, sub = jax.random.split(key)
      if getattr(tcfg.func, 'is_model_event', False):
        model = tcfg.func(model, self.scene, sub,
                          jnp.ones(self.num_envs, bool), **params)
      else:
        data = tcfg.func(None, data, jnp.ones(self.num_envs, bool), sub,
                         **params)
    return model, data

  def apply_reset(self, ctx, data, model, state: dict, mask: jax.Array,
                  key: jax.Array, common_step: jax.Array):
    state = dict(state)
    for name, (tcfg, params) in self.reset_terms.items():
      key, sub = jax.random.split(key)
      m = mask
      if tcfg.min_step_count_between_reset > 0:
        # per-env trigger gating (reference event_manager.py:139-165):
        # fire on the first reset, then only after min_step_count more
        # global steps have elapsed for THAT env
        last = state[f'{name}/last_trigger']
        ok = (last < 0) | (common_step - last
                           >= tcfg.min_step_count_between_reset)
        m = mask & ok
        state[f'{name}/last_trigger'] = jnp.where(
            m, common_step.astype(jnp.int32), last)
      if getattr(tcfg.func, 'is_model_event', False):
        model = tcfg.func(model, self.scene, sub, m, **params)
      else:
        data = tcfg.func(ctx, data, m, sub, **params)
    return data, model, state

  def apply_interval(self, ctx, data, state: dict, key: jax.Array):
    new_state = dict(state)
    for name, (tcfg, params) in self.interval_terms.items():
      tl = state[f'{name}/time_left'] - self.step_dt
      key, k1, k2 = jax.random.split(key, 3)
      lo, hi = tcfg.interval_range_s
      expired = tl <= 0.0
      resampled = jax.random.uniform(k1, tl.shape, minval=lo, maxval=hi)
      new_state[f'{name}/time_left'] = jnp.where(expired, resampled, tl)
      mask = (jnp.broadcast_to(expired, (ctx.num_envs,))
              if tcfg.is_global_time else expired)
      data = tcfg.func(ctx, data, mask, k2, **params)
    return data, new_state


# ---------------------------------------------------------------------------
# Curriculum manager
# ---------------------------------------------------------------------------


class CurriculumManager:
  def __init__(self, cfg, scene):
    self.scene = scene
    self.terms: dict[str, CurriculumTermCfg] = {}
    self.params: dict[str, dict] = {}
    for name, tcfg in get_terms(cfg, CurriculumTermCfg).items():
      self.terms[name] = tcfg
      self.params[name] = _resolve_params(tcfg.params, scene, tcfg.func)

  def origin_term(self) -> 'str | None':
    """Name of the curriculum term (if any) whose state carries per-env
    spawn origins (terrain-level curriculum)."""
    for name, tcfg in self.terms.items():
      if getattr(tcfg.func, 'provides_env_origins', False):
        return name
    return None

  @property
  def active_terms(self):
    return list(self.terms)

  def init_state(self) -> dict:
    st = {}
    for name, tcfg in self.terms.items():
      init_fn = getattr(tcfg.func, 'init_state', None)
      if init_fn is not None:
        st[name] = init_fn(scene=self.scene, **self.params[name])
    return st

  def compute(self, ctx, state: dict, mask: jax.Array):
    """Run curriculum terms on reset envs; returns (new state, metrics)."""
    new_state = dict(state)
    metrics = {}
    for name, tcfg in self.terms.items():
      st = state.get(name)
      res = tcfg.func(ctx, st, mask, **self.params[name])
      if isinstance(res, tuple):
        new_state[name], metric = res
      else:
        new_state[name], metric = st if st is not None else res, res
      if metric is not None:
        metrics[f'Curriculum/{name}'] = metric
    return new_state, metrics
