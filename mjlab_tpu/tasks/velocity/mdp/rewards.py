"""Velocity-task reward terms
(reference src/mjlab/tasks/velocity/mdp/rewards.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.term_cfg import SceneEntityCfg

_DEFAULT = SceneEntityCfg('robot')


def track_lin_vel_exp(ctx, std: float, command_name: str = 'base_velocity',
                      asset_cfg: SceneEntityCfg = _DEFAULT):
  view = ctx.scene[asset_cfg.name]
  cmd = ctx.commands[command_name]
  v = view.root_lin_vel_b(ctx.data)
  err = jnp.sum(jnp.square(cmd[:, :2] - v[:, :2]), axis=-1)
  return jnp.exp(-err / std ** 2)


def track_ang_vel_exp(ctx, std: float, command_name: str = 'base_velocity',
                      asset_cfg: SceneEntityCfg = _DEFAULT):
  view = ctx.scene[asset_cfg.name]
  cmd = ctx.commands[command_name]
  w = view.root_ang_vel_b(ctx.data)
  err = jnp.square(cmd[:, 2] - w[:, 2])
  return jnp.exp(-err / std ** 2)


def feet_slide(ctx, sensor_names: tuple, asset_cfg: SceneEntityCfg,
               threshold: float = 1.0):
  """Penalize foot sliding while in contact
  (reference tasks/velocity/mdp/rewards.py:174-187). Contact state comes
  from per-foot contact sensors (data=('found',...))."""
  view = ctx.scene[asset_cfg.name]
  contacts = jnp.stack(
      [view.sensor_data(ctx.data, s)[:, 0] > 0.5 for s in sensor_names], -1)
  body_vel = view.body_lin_vel_w(ctx.data, asset_cfg.body_ids)  # (N, F, 3)
  speed = jnp.linalg.norm(body_vel[..., :2], axis=-1)
  return jnp.sum(speed * contacts.astype(speed.dtype), axis=-1)


def foot_clearance_reward(ctx, asset_cfg: SceneEntityCfg,
                          target_height: float, std: float,
                          tanh_mult: float = 2.0):
  """Reward swing-foot clearance (reference rewards.py:156-171)."""
  view = ctx.scene[asset_cfg.name]
  pos = view.body_pos_w(ctx.data, asset_cfg.body_ids)
  vel = view.body_lin_vel_w(ctx.data, asset_cfg.body_ids)
  z_err = jnp.square(pos[..., 2] - target_height)
  vel_tanh = jnp.tanh(tanh_mult * jnp.linalg.norm(vel[..., :2], axis=-1))
  return jnp.exp(-jnp.sum(z_err * vel_tanh, axis=-1) / std)


def air_time_reward(ctx, sensor_names: tuple, asset_cfg: SceneEntityCfg,
                    command_name: str = 'base_velocity',
                    mode_time: float = 0.3):
  """Simplified air-time shaping: reward alternating contact (half the
  feet on the ground) scaled by command magnitude. A stateful
  feet_air_time term (reference rewards.py:52-153) requires per-foot
  clocks; this stateless surrogate rewards gait-like contact patterns."""
  view = ctx.scene[asset_cfg.name]
  contacts = jnp.stack(
      [view.sensor_data(ctx.data, s)[:, 0] > 0.5 for s in sensor_names], -1)
  nf = contacts.shape[-1]
  in_contact = jnp.sum(contacts, axis=-1)
  cmd = ctx.commands[command_name]
  moving = jnp.linalg.norm(cmd[:, :2], axis=-1) > 0.1
  score = 1.0 - jnp.abs(in_contact / nf - 0.5) * 2.0
  return jnp.where(moving, score, 0.0)
