"""Event terms: resets, pushes, external wrenches, and the unified
domain-randomization engine (reference src/mjlab/envs/mdp/events.py).

Data events have signature fn(ctx, data, mask, key, **params) -> Data and
apply masked updates over the full batch (branchless resets). Model events
(domain randomization of model fields) have fn(model, scene, key, mask,
**params) -> Model, are tagged `is_model_event = True`, and require their
field to be expanded to a per-env leading axis (the env does this
automatically by scanning event configs - the TPU analog of reference
src/mjlab/sim/randomization.py + event_manager.py:210-213)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Literal, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.utils import math as tmath

_DEFAULT = SceneEntityCfg('robot')


def _masked_rows(arr, new, mask):
  return jnp.where(mask.reshape((-1,) + (1,) * (arr.ndim - 1)), new, arr)


def _sample_range(key, rng: tuple[float, float] | None, shape, dtype):
  if rng is None:
    return jnp.zeros(shape, dtype)
  return jax.random.uniform(key, shape, dtype, rng[0], rng[1])


# ---------------------------------------------------------------------------
# Reset events
# ---------------------------------------------------------------------------


def reset_scene_to_default(ctx, data, mask, key):
  """Reset every entity to its default (init_state) + env origin
  (reference events.py:27-40)."""
  del key
  for name in ctx.scene.entities:
    view = ctx.scene[name]
    if not view.is_fixed_base:
      root = jnp.tile(view.default_root_state, (ctx.num_envs, 1))
      root = root.at[:, :3].add(ctx.env_origins)
      data = view.write_root_state(data, root, mask)
    if view.is_articulated:
      pos = jnp.tile(view.default_joint_pos, (ctx.num_envs, 1))
      vel = jnp.tile(view.default_joint_vel, (ctx.num_envs, 1))
      data = view.write_joint_state(data, pos, vel, mask=mask)
  return data


def reset_root_state_uniform(
    ctx, data, mask, key,
    pose_range: Dict[str, Tuple[float, float]],
    velocity_range: Dict[str, Tuple[float, float]],
    asset_cfg: SceneEntityCfg = _DEFAULT):
  """Default root state + uniform pose/velocity offsets
  (reference events.py:43-88)."""
  view = ctx.scene[asset_cfg.name]
  n = ctx.num_envs
  dtype = data.qpos.dtype
  keys = jax.random.split(key, 12)
  base = jnp.tile(view.default_root_state, (n, 1))
  base = base.at[:, :3].add(ctx.env_origins)

  dx = _sample_range(keys[0], pose_range.get('x'), (n,), dtype)
  dy = _sample_range(keys[1], pose_range.get('y'), (n,), dtype)
  dz = _sample_range(keys[2], pose_range.get('z'), (n,), dtype)
  droll = _sample_range(keys[3], pose_range.get('roll'), (n,), dtype)
  dpitch = _sample_range(keys[4], pose_range.get('pitch'), (n,), dtype)
  dyaw = _sample_range(keys[5], pose_range.get('yaw'), (n,), dtype)

  pos = base[:, :3] + jnp.stack([dx, dy, dz], -1)
  dq = tmath.quat_from_euler_xyz(droll, dpitch, dyaw)
  quat = tmath.quat_mul(base[:, 3:7], dq)

  dv = jnp.stack(
      [_sample_range(keys[6 + i], velocity_range.get(k), (n,), dtype)
       for i, k in enumerate(('x', 'y', 'z', 'roll', 'pitch', 'yaw'))], -1)
  vel = base[:, 7:13] + dv

  state = jnp.concatenate([pos, quat, vel], -1)
  return view.write_root_state(data, state, mask)


def reset_joints_by_scale(
    ctx, data, mask, key,
    position_range: Tuple[float, float],
    velocity_range: Tuple[float, float],
    asset_cfg: SceneEntityCfg = _DEFAULT):
  """Default joint state scaled by uniform factors (reference
  events.py:91-124), clamped to soft limits."""
  view = ctx.scene[asset_cfg.name]
  n = ctx.num_envs
  dtype = data.qpos.dtype
  k1, k2 = jax.random.split(key)
  nj = len(view.idx.joint_names)
  pos = view.default_joint_pos[None] * jax.random.uniform(
      k1, (n, nj), dtype, position_range[0], position_range[1])
  vel = view.default_joint_vel[None] * jax.random.uniform(
      k2, (n, nj), dtype, velocity_range[0], velocity_range[1])
  lim = view.soft_joint_pos_limits
  pos = jnp.clip(pos, lim[:, 0], lim[:, 1])
  return view.write_joint_state(data, pos, vel, mask=mask)


# ---------------------------------------------------------------------------
# Interval events
# ---------------------------------------------------------------------------


def push_by_setting_velocity(
    ctx, data, mask, key,
    velocity_range: Dict[str, Tuple[float, float]],
    asset_cfg: SceneEntityCfg = _DEFAULT):
  """Add a random velocity impulse to the root (reference events.py:127-143)."""
  view = ctx.scene[asset_cfg.name]
  n = ctx.num_envs
  dtype = data.qpos.dtype
  keys = jax.random.split(key, 6)
  dv = jnp.stack(
      [_sample_range(keys[i], velocity_range.get(k), (n,), dtype)
       for i, k in enumerate(('x', 'y', 'z', 'roll', 'pitch', 'yaw'))], -1)
  vel = data.qvel[:, view.idx.free_v_adr] + dv
  return view.write_root_velocity(data, vel, mask)


def apply_external_force_torque(
    ctx, data, mask, key,
    force_range: Tuple[float, float],
    torque_range: Tuple[float, float],
    asset_cfg: SceneEntityCfg = _DEFAULT):
  """Random persistent wrench on selected bodies (reference events.py:146-164)."""
  view = ctx.scene[asset_cfg.name]
  ids = asset_cfg.body_ids
  nb = len(view.idx.body_ids) if isinstance(ids, slice) else len(ids)
  n = ctx.num_envs
  dtype = data.qpos.dtype
  k1, k2 = jax.random.split(key)
  force = jax.random.uniform(k1, (n, nb, 3), dtype, *force_range)
  torque = jax.random.uniform(k2, (n, nb, 3), dtype, *torque_range)
  return view.write_external_wrench(data, force, torque, body_ids=ids,
                                    mask=mask)


# ---------------------------------------------------------------------------
# Domain randomization over model fields
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FieldSpec:
  entity_type: Literal['dof', 'joint', 'body', 'geom', 'site']
  use_address: bool = False
  default_axes: Optional[tuple] = None


FIELD_SPECS = {
    'dof_armature': FieldSpec('dof', use_address=True),
    'dof_frictionloss': FieldSpec('dof', use_address=True),
    'dof_damping': FieldSpec('dof', use_address=True),
    'jnt_range': FieldSpec('joint'),
    'jnt_stiffness': FieldSpec('joint'),
    'body_mass': FieldSpec('body'),
    'body_ipos': FieldSpec('body', default_axes=(0, 1, 2)),
    'body_iquat': FieldSpec('body', default_axes=(0, 1, 2, 3)),
    'body_inertia': FieldSpec('body'),
    'body_pos': FieldSpec('body', default_axes=(0, 1, 2)),
    'body_quat': FieldSpec('body', default_axes=(0, 1, 2, 3)),
    'geom_friction': FieldSpec('geom', default_axes=(0,)),
    'geom_pos': FieldSpec('geom', default_axes=(0, 1, 2)),
    'geom_quat': FieldSpec('geom', default_axes=(0, 1, 2, 3)),
    'geom_rgba': FieldSpec('geom', default_axes=(0, 1, 2, 3)),
    'site_pos': FieldSpec('site', default_axes=(0, 1, 2)),
    'site_quat': FieldSpec('site', default_axes=(0, 1, 2, 3)),
    'qpos0': FieldSpec('joint', use_address=True),
}


def _entity_indices(view, asset_cfg: SceneEntityCfg, spec: FieldSpec):
  idx = view.idx
  if spec.entity_type == 'dof':
    sel = asset_cfg.joint_ids
    return idx.v_adr if isinstance(sel, slice) else idx.v_adr[sel]
  if spec.entity_type == 'joint':
    if spec.use_address:  # qpos0
      sel = asset_cfg.joint_ids
      return idx.q_adr if isinstance(sel, slice) else idx.q_adr[sel]
    sel = asset_cfg.joint_ids
    return idx.jnt_ids if isinstance(sel, slice) else idx.jnt_ids[sel]
  if spec.entity_type == 'body':
    sel = asset_cfg.body_ids
    return idx.body_ids if isinstance(sel, slice) else idx.body_ids[sel]
  if spec.entity_type == 'geom':
    sel = asset_cfg.geom_ids
    return idx.geom_ids if isinstance(sel, slice) else idx.geom_ids[sel]
  if spec.entity_type == 'site':
    sel = asset_cfg.site_ids
    return idx.site_ids if isinstance(sel, slice) else idx.site_ids[sel]
  raise ValueError(spec.entity_type)


def randomize_field(
    model, scene, key, mask,
    field: str,
    ranges: Union[Tuple[float, float], Dict[int, Tuple[float, float]]],
    distribution: Literal['uniform', 'log_uniform', 'gaussian'] = 'uniform',
    operation: Literal['add', 'scale', 'abs'] = 'abs',
    asset_cfg: SceneEntityCfg = _DEFAULT,
    axes: Optional[List[int]] = None):
  """Unified model-field randomization (reference events.py:184-415).

  The model leaf `field` must carry a leading env axis (the env expands it
  automatically). Writes masked rows only."""
  if field not in FIELD_SPECS:
    raise ValueError(f'unknown field {field!r}; supported: '
                     f'{list(FIELD_SPECS)}')
  spec = FIELD_SPECS[field]
  view = scene[asset_cfg.name]
  ids = np.asarray(_entity_indices(view, asset_cfg, spec))

  arr = getattr(model, field)  # (N, n_entity_total, [naxes])
  if arr.ndim < 2 or arr.shape[0] != mask.shape[0]:
    raise ValueError(
        f'model field {field} is not env-expanded; got shape {arr.shape}')
  dtype = arr.dtype
  n = mask.shape[0]

  sub = arr[:, ids]  # (N, k) or (N, k, naxes)
  scalar_field = sub.ndim == 2
  if scalar_field:
    target_axes = (0,)
    sub3 = sub[..., None]
  else:
    target_axes = tuple(axes) if axes is not None else (
        spec.default_axes if spec.default_axes is not None
        else tuple(range(sub.shape[-1])))
    sub3 = sub

  new = sub3
  for ax in target_axes:
    if isinstance(ranges, dict):
      if ax not in ranges:
        continue
      lo, hi = ranges[ax]
    else:
      lo, hi = ranges
    key, sk = jax.random.split(key)
    shape = sub3.shape[:-1]
    if distribution == 'uniform':
      vals = jax.random.uniform(sk, shape, dtype, lo, hi)
    elif distribution == 'log_uniform':
      vals = jnp.exp(jax.random.uniform(sk, shape, dtype,
                                        np.log(lo), np.log(hi)))
    elif distribution == 'gaussian':
      vals = lo + hi * jax.random.normal(sk, shape, dtype)
    else:
      raise ValueError(distribution)
    cur = new[..., ax]
    if operation == 'abs':
      upd = vals
    elif operation == 'add':
      upd = cur + vals
    elif operation == 'scale':
      upd = cur * vals
    else:
      raise ValueError(operation)
    new = new.at[..., ax].set(upd)

  if scalar_field:
    new = new[..., 0]
  updated = arr.at[:, ids].set(
      jnp.where(mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, sub))
  return model.replace(**{field: updated})


randomize_field.is_model_event = True
