"""Tracking-task observation terms
(reference src/mjlab/tasks/tracking/mdp/observations.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.utils import math as tmath


def _term_state(ctx, command_name):
  return ctx.command_terms[command_name], ctx.state.command[command_name]


def motion_anchor_pos_b(ctx, command_name: str = 'motion'):
  term, st = _term_state(ctx, command_name)
  pos, _ = tmath.subtract_frame_transforms(
      term.robot_anchor_pos_w(ctx), term.robot_anchor_quat_w(ctx),
      term.anchor_pos_w(st, ctx), term.anchor_quat_w(st))
  return pos.reshape(ctx.num_envs, -1)


def motion_anchor_ori_b(ctx, command_name: str = 'motion'):
  term, st = _term_state(ctx, command_name)
  _, ori = tmath.subtract_frame_transforms(
      term.robot_anchor_pos_w(ctx), term.robot_anchor_quat_w(ctx),
      term.anchor_pos_w(st, ctx), term.anchor_quat_w(st))
  mat = tmath.matrix_from_quat(ori)
  return mat[..., :2].reshape(ctx.num_envs, -1)


def robot_body_pos_b(ctx, command_name: str = 'motion'):
  term, st = _term_state(ctx, command_name)
  del st
  ap = term.robot_anchor_pos_w(ctx)[:, None, :]
  aq = term.robot_anchor_quat_w(ctx)[:, None, :]
  pos_b, _ = tmath.subtract_frame_transforms(
      ap, aq, term.robot_body_pos_w(ctx), term.robot_body_quat_w(ctx))
  return pos_b.reshape(ctx.num_envs, -1)


def robot_body_ori_b(ctx, command_name: str = 'motion'):
  term, st = _term_state(ctx, command_name)
  del st
  ap = term.robot_anchor_pos_w(ctx)[:, None, :]
  aq = term.robot_anchor_quat_w(ctx)[:, None, :]
  _, ori_b = tmath.subtract_frame_transforms(
      ap, aq, term.robot_body_pos_w(ctx), term.robot_body_quat_w(ctx))
  mat = tmath.matrix_from_quat(ori_b)
  return mat[..., :2].reshape(ctx.num_envs, -1)
