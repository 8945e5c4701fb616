"""Scene composition: terrain + entities -> one compiled MjModel.

Capability mirror of the reference Scene (reference src/mjlab/scene/
scene.py): builds a base visual spec, attaches the terrain spec and each
entity spec under `name/` prefixes, compiles once, and exposes dict access
to per-entity runtime views plus `env_origins`.

TPU-first: after compile, the Scene produces the engine `Model` pytree and
per-entity `EntityView`s with static global indexing; there is no runtime
Scene object state - everything dynamic lives in the batched `Data`.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.entity.entity import Entity, EntityCfg, EntityView
from mjlab_tpu.physics import io as phys_io
from mjlab_tpu.physics.types import Model
from mjlab_tpu.terrains.importer import TerrainImporter, TerrainImporterCfg


@dataclasses.dataclass
class SceneCfg:
  num_envs: int = 1
  env_spacing: float = 2.0
  terrain: TerrainImporterCfg | None = None
  entities: dict[str, EntityCfg] = dataclasses.field(default_factory=dict)


def _base_spec() -> mujoco.MjSpec:
  """Base visual scene: sky, headlight, no geometry (entities/terrain add
  the rest). Replaces the reference's scene.xml asset."""
  spec = mujoco.MjSpec()
  spec.stat.extent = 4.0
  spec.visual.headlight.diffuse = (0.6, 0.6, 0.6)
  spec.visual.headlight.ambient = (0.3, 0.3, 0.3)
  spec.visual.headlight.specular = (0.0, 0.0, 0.0)
  spec.add_texture(
      name='skybox', type=mujoco.mjtTexture.mjTEXTURE_SKYBOX,
      builtin=mujoco.mjtBuiltin.mjBUILTIN_GRADIENT,
      rgb1=(0.3, 0.5, 0.7), rgb2=(0.0, 0.0, 0.0), width=512, height=3072)
  return spec


class Scene:
  """Build-time scene: attach + compile; produces runtime views."""

  def __init__(self, cfg: SceneCfg, dtype=jnp.float32):
    self.cfg = cfg
    self.num_envs = cfg.num_envs
    self._dtype = dtype
    self.spec = _base_spec()

    self.terrain: TerrainImporter | None = None
    if cfg.terrain is not None:
      # built in place, not attached: terrain names stay global (geom
      # 'terrain') so entity contact sensors can reference
      # geom2='terrain' across the entity-attach boundary (reference
      # scene.py:140-147; MuJoCo drops contact sensors with unresolved
      # refnames, and attach always prefixes names in mujoco>=3.10)
      self.terrain = TerrainImporter(cfg.terrain, cfg.num_envs,
                                     spec=self.spec)

    self.entities: dict[str, Entity] = {}
    for name, ecfg in cfg.entities.items():
      ent = Entity(ecfg)
      self.entities[name] = ent
      frame = self.spec.worldbody.add_frame()
      self.spec.attach(ent.spec, prefix=f'{name}/', frame=frame)

    self._mj_model: mujoco.MjModel | None = None
    self._views: dict[str, EntityView] = {}
    self._model: Model | None = None

  def compile(self) -> mujoco.MjModel:
    if self._mj_model is None:
      self._mj_model = self.spec.compile()
    return self._mj_model

  def initialize(self, ncon_cap: 'int | None' = None) -> Model:
    """Compile and build the engine Model + entity views.

    ncon_cap: per-env active-contact capacity (see physics.io.put_model);
    wired from SimulationCfg.nconmax by the env layer."""
    mj = self.compile()
    self._model = phys_io.put_model(mj, dtype=self._dtype,
                                    ncon_cap=ncon_cap)
    for name, ent in self.entities.items():
      self._views[name] = EntityView(ent, self._model, mj, f'{name}/',
                                     dtype=self._dtype)
    return self._model

  @property
  def mj_model(self) -> mujoco.MjModel:
    return self.compile()

  @property
  def model(self) -> Model:
    if self._model is None:
      raise RuntimeError('Scene.initialize() not called')
    return self._model

  def __getitem__(self, name: str) -> EntityView:
    if name not in self._views:
      raise KeyError(
          f'entity {name!r} not in scene; available: {list(self._views)}')
    return self._views[name]

  @property
  def env_origins(self) -> jnp.ndarray:
    """(num_envs, 3) spawn origins from terrain or a square grid."""
    if self.terrain is not None:
      return jnp.asarray(self.terrain.env_origins, self._dtype)
    n = self.num_envs
    side = int(np.ceil(np.sqrt(n)))
    idx = np.arange(n)
    xy = np.stack([idx % side, idx // side], -1).astype(np.float64)
    xy = (xy - xy.mean(axis=0)) * self.cfg.env_spacing
    return jnp.asarray(
        np.concatenate([xy, np.zeros((n, 1))], -1), self._dtype)
