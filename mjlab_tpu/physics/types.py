"""Model / Data pytree definitions for the batched TPU physics engine.

Design: the engine is a pure-functional re-implementation of the MuJoCo
forward-dynamics pipeline (the role mujoco_warp plays in the reference,
see reference src/mjlab/sim/sim.py:110-195), structured for XLA:

* `ModelStatic` holds everything that must be compile-time constant
  (sizes, tree topology, types, the static collision pair table). It is
  stored as a non-pytree aux field so jit specializes on it.
* `Model` holds numeric model parameters as traced jnp leaves. Any leaf
  may carry a leading env axis for domain randomization (the TPU-native
  replacement for reference src/mjlab/sim/randomization.py).
* `Data` is the per-env dynamic state; batching is via `jax.vmap`.

All functions operating on these live in sibling modules (kinematics,
smooth dynamics, collision, constraint, solver, integrate).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax
import numpy as np
from flax import struct


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7


class IntegratorType(enum.IntEnum):
  EULER = 0
  RK4 = 1
  IMPLICIT = 2
  IMPLICITFAST = 3


class ConeType(enum.IntEnum):
  PYRAMIDAL = 0
  ELLIPTIC = 1


class BiasType(enum.IntEnum):
  NONE = 0
  AFFINE = 1


class GainType(enum.IntEnum):
  FIXED = 0
  AFFINE = 1


class TrnType(enum.IntEnum):
  JOINT = 0
  SITE = 3  # unused for now


class DisableBit(enum.IntFlag):
  CONSTRAINT = 1 << 0
  EQUALITY = 1 << 1
  FRICTIONLOSS = 1 << 2
  LIMIT = 1 << 3
  CONTACT = 1 << 4
  PASSIVE = 1 << 5
  GRAVITY = 1 << 6
  CLAMPCTRL = 1 << 7
  WARMSTART = 1 << 8
  ACTUATION = 1 << 10
  REFSAFE = 1 << 11
  SENSOR = 1 << 12
  EULERDAMP = 1 << 15


def _digest(x: Any) -> bytes:
  if isinstance(x, np.ndarray):
    return x.tobytes() + str(x.shape).encode() + str(x.dtype).encode()
  if isinstance(x, (list, tuple)):
    return b'[' + b','.join(_digest(v) for v in x) + b']'
  if isinstance(x, dict):
    return b'{' + b','.join(_digest(k) + b':' + _digest(v) for k, v in sorted(x.items())) + b'}'
  return repr(x).encode()


@dataclasses.dataclass(frozen=True, eq=False)
class StaticBase:
  """Frozen dataclass with content-based hash/eq so it can live in pytree
  aux data (jit cache keys) despite holding numpy arrays."""

  def _key(self) -> bytes:
    return b'|'.join(_digest(getattr(self, f.name)) for f in dataclasses.fields(self))

  def __hash__(self):
    h = getattr(self, '_hash_cache', None)
    if h is None:
      h = hash(self._key())
      object.__setattr__(self, '_hash_cache', h)
    return h

  def __eq__(self, other):
    return type(self) is type(other) and self._key() == other._key()


@dataclasses.dataclass(frozen=True, eq=False)
class CollisionPairs(StaticBase):
  """Static narrowphase work lists, grouped by collider function.

  For each (typeA, typeB) collider key we keep parallel arrays of geom ids.
  Each pair contributes a fixed number of candidate contact points, giving a
  static total contact capacity `ncon_max` (the TPU analog of the
  reference's nconmax padding, reference src/mjlab/sim/sim.py:87-88).
  """
  # dict: (GeomType, GeomType) ->
  #   (geom1 ids np[int], geom2 ids np[int], pairids np[int] (-1 dynamic),
  #    slot base offset, points per pair)
  groups: dict
  # per-group contact slot base offsets, aligned with iteration order
  ncon_max: int


@dataclasses.dataclass(frozen=True, eq=False)
class ModelStatic(StaticBase):
  # sizes
  nq: int
  nv: int
  nu: int
  nbody: int
  njnt: int
  ngeom: int
  nsite: int
  nsensor: int
  nsensordata: int

  # body topology
  body_parentid: np.ndarray  # (nbody,)
  body_rootid: np.ndarray
  body_jntadr: np.ndarray
  body_jntnum: np.ndarray
  body_dofadr: np.ndarray
  body_dofnum: np.ndarray
  body_geomadr: np.ndarray
  body_geomnum: np.ndarray
  # bodies grouped by tree depth (root=level 0 is the world body)
  body_levels: tuple  # tuple of np.ndarray of body ids
  # (nbody, nv) 1.0 where dof is an ancestor dof of body
  ancestor_mask: np.ndarray
  # (nbody, nbody) 1.0 where row-body is ancestor-or-self of col-body
  subtree_mask: np.ndarray
  # (nv, nv) 1.0 where col-dof precedes row-dof in its kinematic chain
  # (ancestor dofs of the row-dof's body, plus earlier dofs on the same body)
  dof_prefix_mask: np.ndarray

  # joints
  jnt_type: np.ndarray  # (njnt,)
  jnt_qposadr: np.ndarray
  jnt_dofadr: np.ndarray
  jnt_bodyid: np.ndarray
  jnt_limited: np.ndarray
  jnt_actgravcomp: np.ndarray

  # dofs
  dof_bodyid: np.ndarray  # (nv,)
  dof_jntid: np.ndarray

  # geoms
  geom_type: np.ndarray  # (ngeom,)
  geom_bodyid: np.ndarray
  geom_condim: np.ndarray
  geom_priority: np.ndarray

  # sites
  site_bodyid: np.ndarray

  # actuators
  actuator_trntype: np.ndarray
  actuator_trnid: np.ndarray  # (nu, 2)
  actuator_gaintype: np.ndarray
  actuator_biastype: np.ndarray
  actuator_ctrllimited: np.ndarray
  actuator_forcelimited: np.ndarray

  # sensors
  sensor_type: np.ndarray
  sensor_datatype: np.ndarray
  sensor_objtype: np.ndarray
  sensor_objid: np.ndarray
  sensor_reftype: np.ndarray
  sensor_refid: np.ndarray
  sensor_adr: np.ndarray
  sensor_dim: np.ndarray
  sensor_intprm: np.ndarray

  # options (compile-time)
  integrator: int
  cone: int
  iterations: int
  ls_iterations: int
  disableflags: int

  # collision
  pairs: CollisionPairs
  # static per-contact-slot metadata
  con_geom1: np.ndarray
  con_geom2: np.ndarray
  con_dim: np.ndarray

  # names (for debugging / find_* APIs live at entity layer)
  body_names: tuple
  jnt_names: tuple
  geom_names: tuple
  site_names: tuple
  actuator_names: tuple
  sensor_names: tuple

  # heightfield terrain (at most one hfield asset; this is how generated
  # rough terrain collides: one hfield geom instead of thousands of static
  # boxes, keeping the static pair table tiny — the TPU answer to the
  # reference's box-built terrain grid, reference
  # src/mjlab/terrains/primitive_terrains.py + its mjwarp broadphase)
  nhfield: int = 0
  hfield_nrow: int = 0
  hfield_ncol: int = 0
  hfield_size: np.ndarray = None  # (4,) radius_x, radius_y, elev_z, base_z
  hfield_geomid: int = -1

  # contact compaction: when > 0, only the deepest candidate contacts
  # feed the constraint solver each step (runtime top-K over the static
  # pair table) — the TPU analog of mjwarp's dynamic nconmax (reference
  # src/mjlab/sim/sim.py:87-88). Selection runs in TWO pools so row
  # counts stay minimal (the solver's dense-row cost and the Pallas
  # kernel's VMEM footprint scale with rows):
  #   ncon_cap  — frictional slots (condim>1): 2*(maxdim-1) rows each
  #   ncon_cap1 — frictionless slots (condim==1): 1 normal row each
  # 0 = all slots build rows (fine for small pair tables; self-collision
  # models need compaction).
  ncon_cap: int = 0
  ncon_cap1: int = 0

  # mocap bodies: world-attached bodies whose pose is set from the host
  # via data.mocap_pos/quat (mj_kinematics parity)
  nmocap: int = 0
  body_mocapid: np.ndarray = None  # (nbody,) -1 for non-mocap

  # tendons: fixed (joint-coupling) rows are compile-time constant
  # Jacobians; spatial tendons are straight site-to-site chains (wrapping
  # geoms/pulleys unsupported, loud error at build)
  # actuator activation states (filter / filterexact / integrator
  # dynamics; muscle and user dynamics are gated at build)
  na: int = 0
  actuator_dyntype: np.ndarray = None  # (nu,) mjtDyn
  actuator_actadr: np.ndarray = None   # (nu,) act index, -1 = stateless
  actuator_actlimited: np.ndarray = None  # (nu,) bool

  ntendon: int = 0
  ten_is_fixed: np.ndarray = None    # (ntendon,) bool
  ten_coef_q: np.ndarray = None      # (ntendon, nq) fixed: L = W_q @ qpos
  ten_coef_v: np.ndarray = None      # (ntendon, nv) fixed: J row
  ten_site_chains: tuple = ()        # per-tendon tuple of site ids
  ten_limited: np.ndarray = None     # (ntendon,) bool

  # equality constraints (connect/weld/joint); rows are assembled ahead
  # of friction/limit/contact in MuJoCo's efc order
  neq: int = 0
  eq_type: np.ndarray = None  # (neq,) mjtEq codes
  eq_obj1: np.ndarray = None  # (neq,) body or joint id
  eq_obj2: np.ndarray = None

  # mesh geoms: precomputed padded convex hulls (physics/mesh.py
  # MeshHulls namedtuple of np arrays) + per-geom mesh asset id
  nmesh: int = 0
  geom_dataid: np.ndarray = None  # (ngeom,) mesh id, -1 for non-mesh
  mesh_hulls: object = None       # MeshHulls | None

  # Newton-solver early-exit inputs (mirror MjOption.tolerance and
  # MjStatistic.meaninertia): MuJoCo terminates when the gradient norm
  # scaled by 1/(meaninertia*max(1,nv)) drops below tolerance
  # (physics/solver.py, ops/newton.py). Compile-time scalars.
  newton_tolerance: float = 1e-8
  meaninertia: float = 1.0


@struct.dataclass
class Option:
  timestep: jax.Array
  gravity: jax.Array  # (3,)
  impratio: jax.Array
  # linesearch tolerance (mirrors MjOption.ls_tolerance)
  tolerance: jax.Array
  ls_tolerance: jax.Array


@struct.dataclass
class Model:
  stat: ModelStatic = struct.field(pytree_node=False)
  opt: Option

  qpos0: jax.Array
  qpos_spring: jax.Array

  body_pos: jax.Array
  body_quat: jax.Array
  body_ipos: jax.Array
  body_iquat: jax.Array
  body_mass: jax.Array
  body_subtreemass: jax.Array
  body_inertia: jax.Array  # (nbody, 3) principal
  body_invweight0: jax.Array  # (nbody, 2)
  body_gravcomp: jax.Array

  jnt_pos: jax.Array
  jnt_axis: jax.Array
  jnt_range: jax.Array
  jnt_stiffness: jax.Array
  jnt_solref: jax.Array
  jnt_solimp: jax.Array
  jnt_margin: jax.Array

  dof_armature: jax.Array
  dof_damping: jax.Array
  dof_frictionloss: jax.Array
  dof_invweight0: jax.Array
  dof_solref: jax.Array
  dof_solimp: jax.Array

  geom_pos: jax.Array
  geom_quat: jax.Array
  geom_size: jax.Array
  geom_friction: jax.Array
  geom_solref: jax.Array
  geom_solimp: jax.Array
  geom_solmix: jax.Array
  geom_margin: jax.Array
  geom_gap: jax.Array
  geom_rgba: jax.Array

  site_pos: jax.Array
  site_quat: jax.Array

  actuator_gainprm: jax.Array
  actuator_biasprm: jax.Array
  actuator_gear: jax.Array
  actuator_ctrlrange: jax.Array
  actuator_forcerange: jax.Array

  # heightfield elevation grid in meters, (hfield_nrow, hfield_ncol);
  # (1, 1) zeros when the model has no hfield. A pytree leaf (not a baked
  # constant) so large terrains don't bloat the compiled executable.
  hfield_data: jax.Array = None

  # equality constraints ((1,…)-shaped placeholders when neq == 0)
  eq_data: jax.Array = None     # (neq, 11)
  eq_solref: jax.Array = None   # (neq, 2)
  eq_solimp: jax.Array = None   # (neq, 5)
  eq_active0: jax.Array = None  # (neq,) float 0/1

  # actuator activation dynamics ((1,…) placeholders when na == 0)
  actuator_dynprm: jax.Array = None    # (nu, 3) tau in [..., 0]
  actuator_actrange: jax.Array = None  # (nu, 2)

  # tendons ((1,…)-shaped placeholders when ntendon == 0)
  tendon_stiffness: jax.Array = None     # (ntendon,)
  tendon_damping: jax.Array = None       # (ntendon,)
  tendon_lengthspring: jax.Array = None  # (ntendon, 2) deadband
  tendon_range: jax.Array = None         # (ntendon, 2)
  tendon_solref_lim: jax.Array = None    # (ntendon, 2)
  tendon_solimp_lim: jax.Array = None    # (ntendon, 5)
  tendon_margin: jax.Array = None        # (ntendon,)
  tendon_invweight0: jax.Array = None    # (ntendon,)

  # explicit <pair> parameter overrides ((1,…) placeholders when
  # npair == 0). Contacts from predefined pairs take these verbatim
  # instead of geom-pair mixing (MuJoCo mj_collideGeoms pair branch).
  pair_friction: jax.Array = None  # (npair, 5)
  pair_solref: jax.Array = None    # (npair, 2)
  pair_solimp: jax.Array = None    # (npair, 5)
  pair_margin: jax.Array = None    # (npair,)


@struct.dataclass
class Contact:
  """Fixed-capacity contact set (one env). Slot -> pair mapping is static
  (ModelStatic.pairs); inactive slots have dist > 0 and zero impedance."""
  dist: jax.Array  # (ncon,)
  pos: jax.Array  # (ncon, 3)
  frame: jax.Array  # (ncon, 3, 3) rows: normal, t1, t2
  friction: jax.Array  # (ncon, 5)
  solref: jax.Array  # (ncon, 2)
  solimp: jax.Array  # (ncon, 5)
  includemargin: jax.Array  # (ncon,)


@struct.dataclass
class Data:
  # state
  qpos: jax.Array
  qvel: jax.Array
  ctrl: jax.Array
  qacc: jax.Array
  qacc_warmstart: jax.Array
  time: jax.Array
  xfrc_applied: jax.Array  # (nbody, 6) [force, torque] world, like MuJoCo
  qfrc_applied: jax.Array

  # kinematics
  xpos: jax.Array
  xquat: jax.Array
  xmat: jax.Array
  xipos: jax.Array
  ximat: jax.Array
  xanchor: jax.Array
  xaxis: jax.Array
  geom_xpos: jax.Array
  geom_xmat: jax.Array
  site_xpos: jax.Array
  site_xmat: jax.Array

  # com-based quantities
  subtree_com: jax.Array  # (nbody, 3)
  cinr: jax.Array  # (nbody, 6, 6) spatial inertia at subtree com frame
  cdof: jax.Array  # (nv, 6)
  cdof_dot: jax.Array
  cvel: jax.Array  # (nbody, 6)

  # dynamics
  qM: jax.Array  # (nv, nv) dense
  qfrc_bias: jax.Array
  qfrc_passive: jax.Array
  qfrc_spring: jax.Array
  qfrc_damper: jax.Array
  qfrc_actuator: jax.Array
  qfrc_smooth: jax.Array
  qacc_smooth: jax.Array
  qfrc_constraint: jax.Array

  # actuation
  actuator_length: jax.Array
  actuator_velocity: jax.Array
  actuator_force: jax.Array

  # constraints / contacts
  contact: Contact
  efc_force: jax.Array  # (nefc_max,)
  ncon_active: jax.Array  # scalar int, number of active contacts
  solver_niter: jax.Array  # scalar int

  # sensors
  sensordata: jax.Array

  # mocap poses, (nmocap, 3)/(nmocap, 4); (1, .) placeholders when the
  # model has no mocap bodies (set from the host, consumed by kinematics)
  mocap_pos: jax.Array = None
  mocap_quat: jax.Array = None

  # tendon state ((1, …) placeholders when ntendon == 0)
  ten_length: jax.Array = None    # (ntendon,)
  ten_velocity: jax.Array = None  # (ntendon,)
  ten_J: jax.Array = None         # (ntendon, nv)

  # actuator activation state ((1,) placeholders when na == 0)
  act: jax.Array = None      # (na,)
  act_dot: jax.Array = None  # (na,)
