"""Uniform velocity command generator
(reference src/mjlab/tasks/velocity/mdp/velocity_command.py)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.term_cfg import CommandTermCfg
from mjlab_tpu.utils import math as tmath


@dataclasses.dataclass
class Ranges:
  lin_vel_x: tuple[float, float] = (-1.0, 1.0)
  lin_vel_y: tuple[float, float] = (-1.0, 1.0)
  ang_vel_z: tuple[float, float] = (-1.0, 1.0)
  heading: tuple[float, float] | None = None


@dataclasses.dataclass
class UniformVelocityCommandCfg(CommandTermCfg):
  asset_name: str = 'robot'
  heading_command: bool = False
  heading_control_stiffness: float = 1.0
  rel_standing_envs: float = 0.0
  rel_heading_envs: float = 1.0
  ranges: Ranges = dataclasses.field(default_factory=Ranges)

  def __post_init__(self):
    if self.class_type is None:
      self.class_type = UniformVelocityCommand


class UniformVelocityCommand(CommandTerm):
  """(vx, vy, wz) twist command with optional heading-servo mode, standing
  envs, and velocity-error metrics (reference velocity_command.py:50-102)."""

  @property
  def dim(self):
    return 3

  def init_state(self, key):
    n = self.num_envs
    lo, hi = self.cfg.resampling_time_range
    return {
        'command': jnp.zeros((n, 3)),
        'heading_target': jnp.zeros(n),
        'is_heading': jnp.zeros(n, bool),
        'is_standing': jnp.zeros(n, bool),
        'time_left': jax.random.uniform(key, (n,), minval=lo, maxval=hi),
        'metric/error_vel_xy': jnp.zeros(n),
        'metric/error_vel_yaw': jnp.zeros(n),
    }

  def _resample(self, state, ctx, mask, key):
    n = self.num_envs
    cfg: UniformVelocityCommandCfg = self.cfg
    r = cfg.ranges
    # the commands_vel curriculum (if present) carries the CURRENT
    # x-velocity and yaw-rate ranges in its state (staged widening by
    # global step; reference curriculums.py:71-73 widens both)
    rx_lo, rx_hi = r.lin_vel_x
    rz_lo, rz_hi = r.ang_vel_z
    curriculum = getattr(ctx.state, 'curriculum', None) or {}
    for cst in curriculum.values():
      if isinstance(cst, dict) and 'range_lin_vel_x' in cst:
        rx = cst['range_lin_vel_x']
        rx_lo, rx_hi = rx[0], rx[1]
      if isinstance(cst, dict) and 'range_ang_vel_z' in cst:
        rz = cst['range_ang_vel_z']
        rz_lo, rz_hi = rz[0], rz[1]
    k = jax.random.split(key, 6)
    cmd = jnp.stack([
        jax.random.uniform(k[0], (n,), minval=rx_lo, maxval=rx_hi),
        jax.random.uniform(k[1], (n,), minval=r.lin_vel_y[0],
                           maxval=r.lin_vel_y[1]),
        jax.random.uniform(k[2], (n,), minval=rz_lo, maxval=rz_hi),
    ], -1)
    state = dict(state)
    state['command'] = jnp.where(mask[:, None], cmd, state['command'])
    if cfg.heading_command and r.heading is not None:
      ht = jax.random.uniform(k[3], (n,), minval=r.heading[0],
                              maxval=r.heading[1])
      state['heading_target'] = jnp.where(mask, ht, state['heading_target'])
      ish = jax.random.uniform(k[4], (n,)) < cfg.rel_heading_envs
      state['is_heading'] = jnp.where(mask, ish, state['is_heading'])
    iss = jax.random.uniform(k[5], (n,)) < cfg.rel_standing_envs
    state['is_standing'] = jnp.where(mask, iss, state['is_standing'])
    return state

  def _update(self, state, ctx):
    cfg: UniformVelocityCommandCfg = self.cfg
    state = dict(state)
    cmd = state['command']
    if cfg.heading_command and cfg.ranges.heading is not None:
      view = ctx.scene[cfg.asset_name]
      heading = view.heading_w(ctx.data)
      err = tmath.wrap_to_pi(state['heading_target'] - heading)
      wz = jnp.clip(cfg.heading_control_stiffness * err,
                    cfg.ranges.ang_vel_z[0], cfg.ranges.ang_vel_z[1])
      cmd = cmd.at[:, 2].set(
          jnp.where(state['is_heading'], wz, cmd[:, 2]))
    cmd = jnp.where(state['is_standing'][:, None], 0.0, cmd)
    state['command'] = cmd
    return state

  def _update_metrics(self, state, ctx, dt):
    view = ctx.scene[self.cfg.asset_name]
    cmd = state['command']
    v = view.root_lin_vel_b(ctx.data)
    w = view.root_ang_vel_b(ctx.data)
    max_t = ctx.max_episode_length
    state = dict(state)
    state['metric/error_vel_xy'] = state['metric/error_vel_xy'] + \
        jnp.linalg.norm(cmd[:, :2] - v[:, :2], axis=-1) / max_t
    state['metric/error_vel_yaw'] = state['metric/error_vel_yaw'] + \
        jnp.abs(cmd[:, 2] - w[:, 2]) / max_t
    return state

  def debug_vis(self, state, env, env_index: int, vis) -> None:
    """Goal (green) vs current (blue) velocity arrows above the robot
    (host-side; reference velocity_command.py:106-176)."""
    import numpy as np
    e = env_index
    data = env.state.data
    view = env.scene[self.cfg.asset_name]
    base = np.asarray(view.root_pos_w(data)[e])
    quat = np.asarray(view.root_quat_w(data)[e])
    cmd = np.asarray(state['command'][e])
    vel_b = np.asarray(view.root_lin_vel_b(data)[e])
    # yaw-only rotation of the base-frame xy command into world
    yaw = np.arctan2(2 * (quat[0] * quat[3] + quat[1] * quat[2]),
                     1 - 2 * (quat[2] ** 2 + quat[3] ** 2))
    c, s = np.cos(yaw), np.sin(yaw)

    def to_world(vb):
      return np.asarray([c * vb[0] - s * vb[1], s * vb[0] + c * vb[1], 0.0])

    top = base + np.asarray([0.0, 0.0, 0.6])
    vis.add_arrow(top, top + 0.5 * to_world(cmd),
                  color=(0.2, 0.8, 0.2, 0.9), radius=0.015)
    vis.add_arrow(top, top + 0.5 * to_world(vel_b),
                  color=(0.2, 0.4, 0.9, 0.9), radius=0.015)
    # yaw-rate indicator: short arc arrow along +y proportional to wz
    vis.add_arrow(top, top + np.asarray([0.0, 0.25 * float(cmd[2]), 0.0]),
                  color=(0.9, 0.7, 0.1, 0.7), radius=0.01)
