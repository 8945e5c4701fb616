"""Terrain generator + heightfield physics tests.

Mirrors the reference's terrain coverage (reference tests exercise terrain
compile via env smoke tests) and adds oracle-style drop tests for the
hfield narrowphase, which has no reference analog (the reference's box
terrains used mjwarp's collision)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io as pio
from mjlab_tpu.physics import pipeline
from mjlab_tpu.terrains import (
    BoxFlatTerrainCfg,
    BoxInvertedPyramidStairsTerrainCfg,
    BoxPyramidStairsTerrainCfg,
    BoxRandomGridTerrainCfg,
    HfPyramidSlopedTerrainCfg,
    HfRandomUniformTerrainCfg,
    HfWaveTerrainCfg,
    TerrainGenerator,
    TerrainGeneratorCfg,
    TerrainImporter,
    TerrainImporterCfg,
)


def _gen(sub_terrains, rows=2, cols=3, size=(4.0, 4.0), border=2.0,
         **kw) -> TerrainGenerator:
  return TerrainGenerator(TerrainGeneratorCfg(
      size=size, border_width=border, num_rows=rows, num_cols=cols,
      sub_terrains=sub_terrains, **kw))


def test_generator_raster_and_origins():
  gen = _gen({
      'flat': BoxFlatTerrainCfg(proportion=0.4),
      'stairs': BoxPyramidStairsTerrainCfg(
          proportion=0.3, step_height_range=(0.0, 0.1), step_width=0.3,
          platform_width=1.5, border_width=0.5),
      'stairs_inv': BoxInvertedPyramidStairsTerrainCfg(
          proportion=0.3, step_height_range=(0.0, 0.1), step_width=0.3,
          platform_width=1.5, border_width=0.5),
  })
  hs = gen.cfg.horizontal_scale
  assert gen.raster.shape == (2 * 40 + 2 * 20, 3 * 40 + 2 * 20)
  assert gen.origins.shape == (2, 3, 3)
  # every origin's z matches the sampled surface there
  for r in range(2):
    for c in range(3):
      ox, oy, oz = gen.origins[r, c]
      np.testing.assert_allclose(
          gen.sample_height(np.array([ox]), np.array([oy]))[0], oz,
          atol=2 * hs)
  # curriculum: difficulty (stair height span) grows along rows
  assert np.abs(gen.raster).max() > 0


@pytest.mark.parametrize('sub', [
    BoxRandomGridTerrainCfg(grid_width=0.5, grid_height_range=(0.05, 0.1)),
    HfRandomUniformTerrainCfg(noise_range=(0.02, 0.1)),
    HfPyramidSlopedTerrainCfg(slope_range=(0.1, 0.4)),
    HfWaveTerrainCfg(amplitude_range=(0.05, 0.2)),
])
def test_sub_terrain_functions(sub):
  sub.size = (4.0, 4.0)
  h, origin = sub.function(0.7, np.random.default_rng(0), 40, 40, 0.1)
  assert h.shape == (40, 40)
  assert np.all(np.isfinite(h))
  assert origin.shape == (3,)


def test_hfield_compiles_and_converts():
  gen = _gen({'flat': BoxFlatTerrainCfg()})
  spec = mujoco.MjSpec()
  gen.build(spec)
  m = spec.compile()
  assert m.nhfield == 1
  model = pio.put_model(m)
  assert model.stat.nhfield == 1
  assert model.hfield_data.shape == (
      model.stat.hfield_nrow, model.stat.hfield_ncol)


def test_sphere_settles_on_hfield_stairs():
  gen = _gen({'stairs': BoxPyramidStairsTerrainCfg(
      proportion=1.0, step_height_range=(0.1, 0.1), step_width=0.4,
      platform_width=1.5, border_width=0.5)}, rows=1, cols=1,
      difficulty_range=(1.0, 1.0))
  spec = mujoco.MjSpec()
  gen.build(spec)
  body = spec.worldbody.add_body(name='ball', pos=[0, 0, 1.0])
  body.add_joint(type=mujoco.mjtJoint.mjJNT_FREE)
  body.add_geom(name='ball', type=mujoco.mjtGeom.mjGEOM_SPHERE,
                size=[0.05, 0, 0], mass=0.1)
  spec.option.timestep = 0.005
  m = spec.compile()
  model = pio.put_model(m, dtype=jnp.float64)
  step = jax.jit(lambda d: pipeline.step(model, d))

  # center platform and an outer stair ring
  for x, name in [(0.0, 'platform'), (1.3, 'ring')]:
    d = pio.make_data(model, dtype=jnp.float64)
    d = d.replace(qpos=d.qpos.at[0].set(x).at[2].set(1.0))
    for _ in range(400):
      d = step(d)
    surface = gen.sample_height(np.array([x]), np.array([0.0]))[0]
    assert np.isfinite(np.asarray(d.qpos)).all(), name
    np.testing.assert_allclose(float(d.qpos[2]), surface + 0.05,
                               atol=5e-3, err_msg=name)


def test_importer_generator_origins():
  cfg = TerrainImporterCfg(
      terrain_type='generator',
      terrain_generator=TerrainGeneratorCfg(
          size=(4.0, 4.0), border_width=2.0, num_rows=4, num_cols=3,
          sub_terrains={'flat': BoxFlatTerrainCfg()}))
  imp = TerrainImporter(cfg, num_envs=7)
  assert imp.env_origins.shape == (7, 3)
  assert imp.origins_table.shape == (4, 3, 3)
  assert imp.max_level == 4
  # initial levels limited to the lower half (max_init_terrain_level_ratio)
  assert imp.terrain_levels.max() < 4
  assert set(imp.terrain_types.tolist()) <= {0, 1, 2}
