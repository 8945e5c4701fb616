"""Velocity-task curriculum terms
(reference src/mjlab/tasks/velocity/mdp/curriculums.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def commands_vel(ctx, state, mask, command_name: str = 'twist',
                 velocity_stages: list = (),
                 base_range: tuple = (-1.0, 1.0)):
  """Staged widening of the commanded x-velocity range by global step
  (reference curriculums.py:60-74, which mutates the command cfg on the
  host; here the current range is curriculum STATE that
  UniformVelocityCommand reads at resample time inside the jitted step).

  State: {'range_lin_vel_x': (2,), 'range_ang_vel_z': (2,)} — the
  reference widens BOTH lin_vel_x and ang_vel_z at each stage
  (reference curriculums.py:71-73). Metric: current range magnitude."""
  del mask, state
  rng = jnp.asarray(base_range, jnp.float32)
  for s in velocity_stages:
    rng = jnp.where(ctx.state.common_step >= s['step'],
                    jnp.asarray(s['range'], jnp.float32), rng)
  return ({'range_lin_vel_x': rng, 'range_ang_vel_z': rng},
          jnp.max(jnp.abs(rng)))


def _commands_vel_init(base_range=(-1.0, 1.0), **kw):
  del kw
  rng = jnp.asarray(base_range, jnp.float32)
  return {'range_lin_vel_x': rng, 'range_ang_vel_z': rng}


commands_vel.init_state = _commands_vel_init


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
  # cast: the table is host float64; origins feed .at[].add on the f32
  # qpos (future JAX errors on unsafe scatter dtype mixes)
  table = jnp.asarray(ctx.scene.terrain.origins_table,
                      ctx.data.qpos.dtype)
  types = jnp.asarray(ctx.scene.terrain.terrain_types)
  max_level = ctx.scene.terrain.max_level

  dist = jnp.linalg.norm(
      view.root_pos_w(ctx.data)[:, :2] - state['origins'][:, :2], axis=-1)
  cmd = ctx.commands[command_name]
  required = jnp.linalg.norm(cmd[:, :2], axis=-1) * ctx.max_episode_length_s
  # Reference semantics (curriculums.py:40-47): promote on absolute
  # progress past half a terrain cell; demote when covering less than
  # half the commanded distance.
  cell_half = 0.5 * float(ctx.scene.terrain.generator.cfg.size[0])
  move_up = dist > cell_half
  move_down = (dist < required * 0.5) & ~move_up
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
  origins = jnp.asarray(terrain.origins_table, jnp.float32)[levels, types]
  return {'levels': levels, 'origins': origins}


terrain_levels_vel.init_state = _terrain_levels_init
terrain_levels_vel.provides_env_origins = True
