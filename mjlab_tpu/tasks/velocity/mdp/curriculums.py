"""Velocity-task curriculum terms
(reference src/mjlab/tasks/velocity/mdp/curriculums.py)."""

from __future__ import annotations

import jax
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
  (reference curriculums.py:18-52 + terrain_importer.py:186-201).

  State: {'levels': (N,) int32, 'origins': (N, 3)}. Promotion: the env
  walked at least half the commanded distance this episode; demotion:
  less than half of that. Envs promoted past the top level are sent to a
  (pseudo-)random level, as the reference does. The 'origins' entry is
  what EnvCtx.env_origins reads when this term is active, so spawn
  positions move with the levels while everything stays inside one jitted
  step (no host-side origin rewrites)."""
  if state is None:  # plane terrain: nothing to promote over
    return None, jnp.zeros(())
  view = ctx.scene[asset_cfg.name if asset_cfg else 'robot']
  levels = state['levels']
  table = jnp.asarray(ctx.scene.terrain.origins_table)
  types = jnp.asarray(ctx.scene.terrain.terrain_types)
  max_level = ctx.scene.terrain.max_level

  dist = jnp.linalg.norm(
      view.root_pos_w(ctx.data)[:, :2] - state['origins'][:, :2], axis=-1)
  cmd = ctx.commands[command_name]
  required = jnp.linalg.norm(cmd[:, :2], axis=-1) * ctx.max_episode_length_s
  move_up = dist > required * 0.5
  move_down = (dist < required * 0.25) & ~move_up
  new = levels + jnp.where(move_up, 1, 0) - jnp.where(move_down, 1, 0)
  # past the top: random reassignment (deterministic in common_step)
  key = jax.random.fold_in(jax.random.PRNGKey(17), ctx.state.common_step)
  rand_lvl = jax.random.randint(key, levels.shape, 0, max_level)
  new = jnp.where(new >= max_level, rand_lvl, jnp.maximum(new, 0))
  new = jnp.where(mask, new, levels)
  origins = table[new, types]
  metric = jnp.mean(new.astype(jnp.float32))
  return {'levels': new, 'origins': origins}, metric


def _terrain_levels_init(scene=None, **kw):
  del kw
  terrain = scene.terrain if scene is not None else None
  if terrain is None or terrain.origins_table is None:
    return None
  levels = jnp.asarray(terrain.terrain_levels, jnp.int32)
  types = jnp.asarray(terrain.terrain_types)
  origins = jnp.asarray(terrain.origins_table)[levels, types]
  return {'levels': levels, 'origins': origins}


terrain_levels_vel.init_state = _terrain_levels_init
terrain_levels_vel.provides_env_origins = True
