"""Terrain importer: plane or generated sub-terrain grid.

Capability mirror of reference src/mjlab/terrains/terrain_importer.py.
Round 1 implements the plane terrain and grid env-origin layout; the
procedural generator (stairs/pyramids grid with curriculum rows) lands in
mjlab_tpu/terrains/generator.py and plugs in through the same cfg.
"""

from __future__ import annotations

import dataclasses

import mujoco
import numpy as np


@dataclasses.dataclass
class TerrainImporterCfg:
  terrain_type: str = 'plane'  # 'plane' | 'generator'
  terrain_generator: 'object | None' = None
  env_spacing: float = 2.0
  color: tuple = (0.2, 0.3, 0.4)


class TerrainImporter:
  def __init__(self, cfg: TerrainImporterCfg, num_envs: int,
               spec: 'mujoco.MjSpec | None' = None):
    """Builds terrain into `spec` (the scene spec) when given, else into
    a fresh standalone spec. Building in place keeps terrain names global
    ('terrain' geom/hfield) so entity contact sensors can reference
    geom2='terrain' across the entity-attach boundary — MuJoCo silently
    drops contact sensors whose refname never resolves, and MjSpec.attach
    in mujoco>=3.10 prefixes ALL attached names (even prefix-less attach
    prepends '/'). Reference keeps terrain names global the same way
    (ref scene.py:140-147, terrain_importer.py:157-158)."""
    self.cfg = cfg
    self.num_envs = num_envs
    self.spec = mujoco.MjSpec() if spec is None else spec
    if cfg.terrain_type == 'plane':
      # named 'terrain' like the generator path (and the reference's
      # terrain body) so ground-contact sensors can filter on it
      self.spec.worldbody.add_geom(
          name='terrain', type=mujoco.mjtGeom.mjGEOM_PLANE,
          size=[0.0, 0.0, 0.05], rgba=list(cfg.color) + [1.0])
      # grid origins at z = 0
      side = int(np.ceil(np.sqrt(num_envs)))
      idx = np.arange(num_envs)
      xy = np.stack([idx % side, idx // side], -1).astype(np.float64)
      xy = (xy - xy.mean(axis=0)) * cfg.env_spacing
      self.env_origins = np.concatenate([xy, np.zeros((num_envs, 1))], -1)
      self.terrain_levels = np.zeros(num_envs, np.int32)
      self.terrain_types = np.zeros(num_envs, np.int32)
    elif cfg.terrain_type == 'generator':
      if cfg.terrain_generator is None:
        raise ValueError('terrain_generator cfg required')
      from mjlab_tpu.terrains.generator import TerrainGenerator
      gen = TerrainGenerator(cfg.terrain_generator)
      gen.build(self.spec)
      self.generator = gen
      # curriculum origins: env e starts at a random level row, type striped
      # over columns (reference terrain_importer.py:203-223)
      rng = np.random.default_rng(0)
      num_rows, num_cols = gen.origins.shape[:2]
      max_init = max(0, int(np.ceil(num_rows * getattr(
          cfg.terrain_generator, 'max_init_terrain_level_ratio', 0.5))))
      self.terrain_levels = rng.integers(0, max(max_init, 1), num_envs)
      self.terrain_types = (np.arange(num_envs) % num_cols).astype(np.int32)
      self.env_origins = gen.origins[self.terrain_levels, self.terrain_types]
    else:
      raise ValueError(f'unknown terrain_type {cfg.terrain_type!r}')

  @property
  def origins_table(self) -> 'np.ndarray | None':
    """(num_levels, num_types, 3) spawn-origin table for generator
    terrains (None for plane). Consumed by the terrain-levels curriculum
    term (reference terrain_importer.py:186-223), which keeps per-env
    levels + origins in functional curriculum state."""
    gen = getattr(self, 'generator', None)
    return None if gen is None else gen.origins

  @property
  def max_level(self) -> int:
    gen = getattr(self, 'generator', None)
    return 1 if gen is None else gen.num_levels
