"""Tracking-task termination terms
(reference src/mjlab/tasks/tracking/mdp/terminations.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.tasks.tracking.mdp.rewards import _subset, _term_state
from mjlab_tpu.utils import math as tmath

_GRAVITY = jnp.asarray([0.0, 0.0, -1.0])


def bad_anchor_pos(ctx, threshold: float, command_name: str = 'motion'):
  term, st = _term_state(ctx, command_name)
  return jnp.linalg.norm(
      term.anchor_pos_w(st, ctx) - term.robot_anchor_pos_w(ctx),
      axis=-1) > threshold


def bad_anchor_pos_z_only(ctx, threshold: float,
                          command_name: str = 'motion'):
  term, st = _term_state(ctx, command_name)
  return jnp.abs(term.anchor_pos_w(st, ctx)[:, 2]
                 - term.robot_anchor_pos_w(ctx)[:, 2]) > threshold


def bad_anchor_ori(ctx, threshold: float, command_name: str = 'motion',
                   asset_cfg: SceneEntityCfg = SceneEntityCfg('robot')):
  term, st = _term_state(ctx, command_name)
  g = _GRAVITY.astype(ctx.data.qpos.dtype)
  motion_g = tmath.quat_apply_inverse(term.anchor_quat_w(st), g)
  robot_g = tmath.quat_apply_inverse(term.robot_anchor_quat_w(ctx), g)
  return jnp.abs(motion_g[:, 2] - robot_g[:, 2]) > threshold


def bad_motion_body_pos(ctx, threshold: float,
                        command_name: str = 'motion', body_names=None):
  term, st = _term_state(ctx, command_name)
  ids = _subset(term, body_names)
  err = jnp.linalg.norm(
      st['body_pos_relative_w'][:, ids]
      - term.robot_body_pos_w(ctx)[:, ids], axis=-1)
  return jnp.any(err > threshold, axis=-1)


def bad_motion_body_pos_z_only(ctx, threshold: float,
                               command_name: str = 'motion',
                               body_names=None):
  term, st = _term_state(ctx, command_name)
  ids = _subset(term, body_names)
  err = jnp.abs(st['body_pos_relative_w'][:, ids, 2]
                - term.robot_body_pos_w(ctx)[:, ids, 2])
  return jnp.any(err > threshold, axis=-1)
