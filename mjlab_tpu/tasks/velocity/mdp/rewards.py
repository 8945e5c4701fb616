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


def feet_air_time(ctx, state, sensor_names: tuple = (),
                  asset_name: str = 'robot',
                  command_name: str = 'twist',
                  threshold_min: float = 0.05,
                  threshold_max: float = 0.15,
                  command_threshold: float = 0.05,
                  reward_mode: str = 'continuous',
                  command_scale_type: str = 'smooth',
                  command_scale_width: float = 0.2):
  """Reward long steps (stateful: per-foot air/contact clocks threaded
  through the reward-manager state; reference
  tasks/velocity/mdp/rewards.py:52-153).

  continuous: 1.0 per foot while in air with threshold_min < air_time <=
  threshold_max. on_landing: clamp(last_air_time - threshold_min) / dt on
  first contact. Scaled by a smooth (tanh) or hard command-magnitude
  gate."""
  view = ctx.scene[asset_name]
  in_contact = jnp.stack(
      [view.sensor_data(ctx.data, s)[:, 0] > 0.5 for s in sensor_names], -1)
  in_air = ~in_contact

  air = state['current_air_time']
  contact_t = state['current_contact_time']
  last_air = state['last_air_time']

  first_contact = (air > 0) & in_contact
  last_air = jnp.where(first_contact, air, last_air)
  air = jnp.where(in_contact, 0.0, air + ctx.step_dt)
  contact_t = jnp.where(in_contact, contact_t + ctx.step_dt, 0.0)

  if reward_mode == 'continuous':
    per_foot = (in_air & (air > threshold_min) &
                (air <= threshold_max)).astype(air.dtype)
    reward = jnp.sum(per_foot, axis=-1)
  else:  # on_landing
    over = jnp.clip(last_air - threshold_min, 0.0,
                    threshold_max - threshold_min)
    reward = jnp.sum(over * first_contact, axis=-1) / ctx.step_dt

  cmd_norm = jnp.linalg.norm(ctx.commands[command_name][:, :2], axis=-1)
  if command_scale_type == 'smooth':
    scale = 0.5 * (1.0 + jnp.tanh(
        (cmd_norm - command_threshold) / command_scale_width))
  else:
    scale = (cmd_norm > command_threshold).astype(reward.dtype)
  new_state = {'current_air_time': air, 'current_contact_time': contact_t,
               'last_air_time': last_air}
  return reward * scale, new_state


def _feet_air_time_init(num_envs: int = 1, sensor_names: tuple = (), **kw):
  del kw
  z = jnp.zeros((num_envs, max(len(sensor_names), 1)))
  return {'current_air_time': z, 'current_contact_time': z,
          'last_air_time': z}


feet_air_time.init_state = _feet_air_time_init
