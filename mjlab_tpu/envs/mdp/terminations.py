"""Termination terms (reference src/mjlab/envs/mdp/terminations.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.term_cfg import SceneEntityCfg

_DEFAULT = SceneEntityCfg('robot')


def time_out(ctx):
  return ctx.episode_length >= ctx.max_episode_length


def bad_orientation(ctx, limit_angle: float,
                    asset_cfg: SceneEntityCfg = _DEFAULT):
  g = ctx.scene[asset_cfg.name].projected_gravity_b(ctx.data)
  angle = jnp.arccos(jnp.clip(-g[:, 2], -1.0, 1.0))
  return angle > limit_angle


def root_height_below_minimum(ctx, minimum_height: float,
                              asset_cfg: SceneEntityCfg = _DEFAULT):
  return ctx.scene[asset_cfg.name].root_pos_w(ctx.data)[:, 2] < minimum_height
