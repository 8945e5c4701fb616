"""Velocity-task curriculum terms
(reference src/mjlab/tasks/velocity/mdp/curriculums.py)."""

from __future__ import annotations

import jax.numpy as jnp


def commands_vel(ctx, state, mask, command_name: str = 'twist',
                 velocity_stages: list = ()):
  """Staged command-range widening by global step
  (reference curriculums.py:60-74). State: () float32 current stage index.
  The widened range is applied as a scale on the sampled command inside the
  command term via the 'range_scale' state entry."""
  del mask
  if state is None:
    state = jnp.zeros(())
  stage = state
  for i, s in enumerate(velocity_stages):
    stage = jnp.where(ctx.state.common_step >= s['step'],
                      jnp.asarray(float(i + 1)), stage)
  return stage, stage


commands_vel.init_state = lambda **kw: jnp.zeros(())


def terrain_levels_vel(ctx, state, mask, command_name: str = 'twist',
                       asset_cfg=None):
  """Walked-distance-based terrain level promotion/demotion
  (reference curriculums.py:18-52). State: (N,) int32 terrain levels.

  Promotion: walked >= half the commanded distance; demotion: walked less
  than half of that. Requires a generator terrain (env origins per level).
  For plane terrains this is a no-op that logs level 0."""
  if state is None:
    return jnp.zeros(()), jnp.zeros(())
  view = ctx.scene[asset_cfg.name if asset_cfg else 'robot']
  dist = jnp.linalg.norm(
      view.root_pos_w(ctx.data)[:, :2] - ctx.env_origins[:, :2], axis=-1)
  cmd = ctx.commands[command_name]
  required = jnp.linalg.norm(cmd[:, :2], axis=-1) * ctx.max_episode_length_s
  move_up = dist > required * 0.5
  move_down = dist < required * 0.25
  delta = jnp.where(move_up, 1, jnp.where(move_down, -1, 0))
  new = jnp.where(mask, jnp.clip(state + delta, 0, 64), state)
  return new, jnp.mean(new.astype(jnp.float32))
