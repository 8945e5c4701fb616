"""Base reward terms (reference src/mjlab/envs/mdp/rewards.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.utils.string import resolve_matching_names_values

_DEFAULT = SceneEntityCfg('robot')


def is_alive(ctx):
  return (~ctx.terminated).astype(ctx.data.qpos.dtype)


def is_terminated(ctx):
  return ctx.terminated.astype(ctx.data.qpos.dtype)


def joint_torques_l2(ctx, asset_cfg: SceneEntityCfg = _DEFAULT):
  view = ctx.scene[asset_cfg.name]
  return jnp.sum(jnp.square(view.actuator_force(ctx.data)), axis=-1)


def joint_acc_l2(ctx, asset_cfg: SceneEntityCfg = _DEFAULT):
  view = ctx.scene[asset_cfg.name]
  return jnp.sum(
      jnp.square(view.joint_acc(ctx.data)[:, asset_cfg.joint_ids]), axis=-1)


def joint_vel_l2(ctx, asset_cfg: SceneEntityCfg = _DEFAULT):
  view = ctx.scene[asset_cfg.name]
  return jnp.sum(
      jnp.square(view.joint_vel(ctx.data)[:, asset_cfg.joint_ids]), axis=-1)


def action_rate_l2(ctx):
  return jnp.sum(jnp.square(ctx.actions - ctx.prev_actions), axis=-1)


def action_l2(ctx):
  return jnp.sum(jnp.square(ctx.actions), axis=-1)


def joint_pos_limits(ctx, asset_cfg: SceneEntityCfg = _DEFAULT):
  """Soft joint limit violation penalty
  (reference src/mjlab/envs/mdp/rewards.py joint_pos_limits)."""
  view = ctx.scene[asset_cfg.name]
  ids = asset_cfg.joint_ids
  q = view.joint_pos(ctx.data)[:, ids]
  lim = view.soft_joint_pos_limits[ids]
  lower = -jnp.clip(q - lim[:, 0], None, 0.0)
  upper = jnp.clip(q - lim[:, 1], 0.0, None)
  return jnp.sum(lower + upper, axis=-1)


def flat_orientation_l2(ctx, asset_cfg: SceneEntityCfg = _DEFAULT):
  g = ctx.scene[asset_cfg.name].projected_gravity_b(ctx.data)
  return jnp.sum(jnp.square(g[:, :2]), axis=-1)


def electrical_power_cost(ctx, asset_cfg: SceneEntityCfg = _DEFAULT):
  """|tau . qdot| electrical power proxy."""
  view = ctx.scene[asset_cfg.name]
  tau = view.actuator_force(ctx.data)
  # actuator velocities = joint velocities for scalar joint transmissions
  vel = ctx.data.actuator_velocity[:, view.idx.ctrl_ids]
  return jnp.sum(jnp.clip(tau * vel, 0.0, None), axis=-1)


def posture(ctx, std: dict, asset_cfg: SceneEntityCfg = _DEFAULT):
  """Exp-kernel posture reward with per-joint stds resolved by regex
  (reference src/mjlab/envs/mdp/rewards.py:73-104, class-based there)."""
  view = ctx.scene[asset_cfg.name]
  ids, _, stds = resolve_matching_names_values(std, view.idx.joint_names)
  import numpy as np
  ids = np.asarray(ids, np.int32)
  stds = jnp.asarray(stds, ctx.data.qpos.dtype)
  q = view.joint_pos(ctx.data)[:, ids]
  q0 = view.default_joint_pos[ids]
  err = jnp.square((q - q0) / stds)
  return jnp.exp(-jnp.mean(err, axis=-1))


def upright(ctx, asset_cfg: SceneEntityCfg = _DEFAULT):
  g = ctx.scene[asset_cfg.name].projected_gravity_b(ctx.data)
  return 0.5 * (1.0 - g[:, 2])
