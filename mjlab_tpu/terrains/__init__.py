"""Terrain subsystem (capability mirror of reference src/mjlab/terrains/).

Procedural sub-terrains rasterize into one MuJoCo heightfield; the
importer lays out env origins over the (level, type) grid and the
velocity task's terrain curriculum promotes/demotes env levels at reset.
"""

from mjlab_tpu.terrains.config import (
    ROUGH_TERRAINS_CFG,
    ROUGH_TERRAINS_WITH_HF_CFG,
)
from mjlab_tpu.terrains.generator import TerrainGenerator, TerrainGeneratorCfg
from mjlab_tpu.terrains.importer import TerrainImporter, TerrainImporterCfg
from mjlab_tpu.terrains.sub_terrains import (
    BoxFlatTerrainCfg,
    BoxInvertedPyramidStairsTerrainCfg,
    BoxPyramidStairsTerrainCfg,
    BoxRandomGridTerrainCfg,
    FlatTerrainCfg,
    HfInvertedPyramidSlopedTerrainCfg,
    HfPyramidSlopedTerrainCfg,
    HfRandomUniformTerrainCfg,
    HfWaveTerrainCfg,
    SubTerrainCfg,
)

__all__ = [
    'ROUGH_TERRAINS_CFG',
    'ROUGH_TERRAINS_WITH_HF_CFG',
    'TerrainGenerator',
    'TerrainGeneratorCfg',
    'TerrainImporter',
    'TerrainImporterCfg',
    'BoxFlatTerrainCfg',
    'BoxInvertedPyramidStairsTerrainCfg',
    'BoxPyramidStairsTerrainCfg',
    'BoxRandomGridTerrainCfg',
    'FlatTerrainCfg',
    'HfInvertedPyramidSlopedTerrainCfg',
    'HfPyramidSlopedTerrainCfg',
    'HfRandomUniformTerrainCfg',
    'HfWaveTerrainCfg',
    'SubTerrainCfg',
]
