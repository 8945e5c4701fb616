"""Simulation configuration (build-time).

The reference's Simulation class (reference src/mjlab/sim/sim.py) owns GPU
buffers, CUDA graphs and a torch<->warp bridge; under XLA none of that
machinery exists - the engine is a pure function and `jax.jit` provides
the graphs. What remains at this layer is the declarative solver/
integrator configuration applied to the MjSpec before compilation, plus
helpers to build batched Data and expand model fields for domain
randomization."""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import mujoco

from mjlab_tpu.physics import io as phys_io
from mjlab_tpu.physics.types import Data, Model

_CONE = {'pyramidal': mujoco.mjtCone.mjCONE_PYRAMIDAL,
         'elliptic': mujoco.mjtCone.mjCONE_ELLIPTIC}
_INTEGRATOR = {'euler': mujoco.mjtIntegrator.mjINT_EULER,
               'implicitfast': mujoco.mjtIntegrator.mjINT_IMPLICITFAST}


@dataclasses.dataclass
class MujocoCfg:
  """Solver/integrator options -> spec.option (reference sim.py:42-82)."""
  timestep: float = 0.002
  integrator: Literal['euler', 'implicitfast'] = 'implicitfast'
  impratio: float = 1.0
  cone: Literal['pyramidal', 'elliptic'] = 'pyramidal'
  iterations: int = 10
  tolerance: float = 1e-8
  ls_iterations: int = 20
  ls_tolerance: float = 0.01
  gravity: tuple = (0.0, 0.0, -9.81)

  def edit_spec(self, spec: mujoco.MjSpec) -> None:
    spec.option.timestep = self.timestep
    spec.option.integrator = _INTEGRATOR[self.integrator]
    spec.option.cone = _CONE[self.cone]
    spec.option.impratio = self.impratio
    spec.option.iterations = self.iterations
    spec.option.tolerance = self.tolerance
    spec.option.ls_iterations = self.ls_iterations
    spec.option.ls_tolerance = self.ls_tolerance
    spec.option.gravity = self.gravity


@dataclasses.dataclass
class SimulationCfg:
  """nconmax here is the PER-ENV active-contact capacity: when the static
  pair table is larger, a runtime top-K over candidate penetrations picks
  which contacts build constraint rows (physics/constraint.py) — the TPU
  analog of the reference's total nconmax pool (reference sim.py:87-88,
  140000 over 4096 envs ~ 34/env). None = auto (no compaction for small
  tables, 64 for large/self-collision models). njmax has no analog
  (constraint rows are static per contact slot) and is ignored."""
  nconmax: int | None = None
  njmax: int | None = None
  mujoco: MujocoCfg = dataclasses.field(default_factory=MujocoCfg)


def make_batched_data(model: Model, num_envs: int, dtype=jnp.float32) -> Data:
  """Allocate (num_envs, ...) Data."""
  d = phys_io.make_data(model, dtype=dtype)
  return jax.tree.map(
      lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape).copy(), d)


def expand_model_fields(model: Model, fields: list[str],
                        num_envs: int) -> Model:
  """Tile selected model leaves to a leading env axis so per-env domain
  randomization can write them (replaces reference
  src/mjlab/sim/randomization.py's warp tiling kernel)."""
  updates = {}
  for f in sorted(set(fields)):
    leaf = getattr(model, f)
    updates[f] = jnp.broadcast_to(leaf, (num_envs,) + leaf.shape).copy()
  return model.replace(**updates)


def model_vmap_axes(model: Model, template: Model) -> Model:
  """Build an in_axes pytree: 0 for env-expanded leaves, None otherwise."""
  return jax.tree.map(
      lambda leaf, ref: 0 if jnp.ndim(leaf) == jnp.ndim(ref) + 1 else None,
      model, template)
