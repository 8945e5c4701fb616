"""Entity: one physical object (robot, prop, terrain) in the scene.

Mirrors the reference's Entity capability surface (reference
src/mjlab/entity/entity.py): built from a config's `spec_fn` MjSpec,
spec editors applied at build time, regex `find_*` queries, and global
indexing resolved after scene compilation.

TPU-first split:
  * `Entity` is the build-time object (CPU, owns the MjSpec).
  * `EntityIndexing` is static index metadata (numpy, hashable).
  * `EntityView` is the runtime facade: pure functions/properties over the
    batched `physics.Data` pytree - reads are gathers, writes return a new
    Data (replacing the reference's in-place torch writes into Warp memory,
    reference src/mjlab/entity/entity.py:437-582).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.entity.spec_config import ActuatorCfg, ActuatorSetCfg, SpecCfg
from mjlab_tpu.physics.types import Data, Model, StaticBase
from mjlab_tpu.utils import math as tmath
from mjlab_tpu.utils.string import (
    resolve_matching_names,
    resolve_matching_names_values,
)


@dataclasses.dataclass
class EntityInitStateCfg:
  pos: tuple = (0.0, 0.0, 0.0)
  rot: tuple = (1.0, 0.0, 0.0, 0.0)
  lin_vel: tuple = (0.0, 0.0, 0.0)
  ang_vel: tuple = (0.0, 0.0, 0.0)
  joint_pos: dict = dataclasses.field(default_factory=lambda: {'.*': 0.0})
  joint_vel: dict = dataclasses.field(default_factory=lambda: {'.*': 0.0})


@dataclasses.dataclass
class EntityCfg:
  spec_fn: Callable[[], mujoco.MjSpec] | None = None
  init_state: EntityInitStateCfg = dataclasses.field(
      default_factory=EntityInitStateCfg)
  actuators: tuple[ActuatorCfg, ...] = ()
  spec_editors: tuple[SpecCfg, ...] = ()
  soft_joint_pos_limit_factor: float = 1.0


@dataclasses.dataclass(frozen=True, eq=False)
class EntityIndexing(StaticBase):
  """Static global indices for one entity inside the compiled scene."""
  body_ids: np.ndarray
  root_body_id: int
  geom_ids: np.ndarray
  site_ids: np.ndarray
  jnt_ids: np.ndarray  # non-free joints, entity order
  q_adr: np.ndarray  # qpos addresses of non-free (scalar) joints
  v_adr: np.ndarray
  free_jnt_id: int  # -1 if fixed base
  free_q_adr: np.ndarray  # (7,) or empty
  free_v_adr: np.ndarray  # (6,) or empty
  ctrl_ids: np.ndarray  # actuator ids, entity order
  body_names: tuple
  joint_names: tuple
  geom_names: tuple
  site_names: tuple
  actuator_names: tuple
  sensor_map: tuple  # ((name, adr, dim), ...)


class Entity:
  """Build-time entity: owns the MjSpec, applies spec editors."""

  def __init__(self, cfg: EntityCfg):
    self.cfg = cfg
    if cfg.spec_fn is None:
      raise ValueError('EntityCfg.spec_fn is required')
    self.spec: mujoco.MjSpec = cfg.spec_fn()
    if cfg.actuators:
      ActuatorSetCfg(cfgs=tuple(cfg.actuators)).edit_spec(self.spec)
    for editor in cfg.spec_editors:
      editor.edit_spec(self.spec)

    joints = list(self.spec.joints)
    self._free_joint_names = [
        j.name for j in joints if j.type == mujoco.mjtJoint.mjJNT_FREE]
    if len(self._free_joint_names) > 1:
      raise ValueError('entity can have at most one free joint')
    self.joint_names = [
        j.name for j in joints if j.type != mujoco.mjtJoint.mjJNT_FREE]
    self.body_names = [b.name for b in self.spec.bodies if b.name != 'world']
    self.geom_names = [g.name for g in self.spec.geoms if g.name]
    self.site_names = [s.name for s in self.spec.sites if s.name]
    self.actuator_names = [a.name for a in self.spec.actuators]
    self.sensor_names = [s.name for s in self.spec.sensors]
    self._add_initial_state_keyframe()

  def _add_initial_state_keyframe(self) -> None:
    """Add an 'init_state' keyframe to the spec (reference
    src/mjlab/entity/entity.py:146-161): qpos = [pos, rot, joint_pos],
    ctrl = joint_pos targets for actuated entities."""
    init = self.cfg.init_state
    qpos_parts = []
    if self._free_joint_names:
      qpos_parts.extend([list(init.pos), list(init.rot)])
    joint_pos = None
    if self.joint_names:
      jp = np.zeros(len(self.joint_names))
      ids, _, vals = resolve_matching_names_values(
          init.joint_pos, self.joint_names)
      jp[ids] = vals
      joint_pos = jp
      # scalar hinge/slide joints contribute 1 qpos each; ball joints 4
      for j, name in zip(
          (j for j in self.spec.joints
           if j.type != mujoco.mjtJoint.mjJNT_FREE), self.joint_names):
        if j.type == mujoco.mjtJoint.mjJNT_BALL:
          qpos_parts.append([1.0, 0.0, 0.0, 0.0])
        else:
          qpos_parts.append([jp[self.joint_names.index(name)]])
    key_qpos = np.hstack(qpos_parts) if qpos_parts else np.array([])
    key = self.spec.add_key(name='init_state', qpos=key_qpos)
    if joint_pos is not None and len(self.actuator_names) == len(joint_pos):
      key.ctrl = joint_pos

  # --- property matrix (reference entity.py:94-113) ---
  @property
  def is_fixed_base(self) -> bool:
    return len(self._free_joint_names) == 0

  @property
  def is_articulated(self) -> bool:
    return len(self.joint_names) > 0

  @property
  def is_actuated(self) -> bool:
    return len(self.actuator_names) > 0

  # --- regex finders ---
  def find_bodies(self, expr, preserve_order=False):
    return resolve_matching_names(expr, self.body_names, preserve_order)

  def find_joints(self, expr, preserve_order=False):
    return resolve_matching_names(expr, self.joint_names, preserve_order)

  def find_geoms(self, expr, preserve_order=False):
    return resolve_matching_names(expr, self.geom_names, preserve_order)

  def find_sites(self, expr, preserve_order=False):
    return resolve_matching_names(expr, self.site_names, preserve_order)

  def find_actuators(self, expr, preserve_order=False):
    return resolve_matching_names(expr, self.actuator_names, preserve_order)

  def compute_indexing(self, mj_model: mujoco.MjModel,
                       prefix: str) -> EntityIndexing:
    """Resolve global ids for this entity in the compiled scene model."""
    def gid(objtype, name):
      i = mujoco.mj_name2id(mj_model, objtype, prefix + name)
      if i < 0:
        raise KeyError(f'{prefix + name} not found in compiled model')
      return i

    body_ids = np.asarray(
        [gid(mujoco.mjtObj.mjOBJ_BODY, n) for n in self.body_names], np.int32)
    geom_ids = np.asarray(
        [gid(mujoco.mjtObj.mjOBJ_GEOM, n) for n in self.geom_names], np.int32)
    site_ids = np.asarray(
        [gid(mujoco.mjtObj.mjOBJ_SITE, n) for n in self.site_names], np.int32)
    jnt_ids = np.asarray(
        [gid(mujoco.mjtObj.mjOBJ_JOINT, n) for n in self.joint_names], np.int32)
    ctrl_ids = np.asarray(
        [gid(mujoco.mjtObj.mjOBJ_ACTUATOR, n) for n in self.actuator_names],
        np.int32)
    q_adr = mj_model.jnt_qposadr[jnt_ids] if len(jnt_ids) else np.zeros(0, np.int32)
    v_adr = mj_model.jnt_dofadr[jnt_ids] if len(jnt_ids) else np.zeros(0, np.int32)
    if self._free_joint_names:
      fj = gid(mujoco.mjtObj.mjOBJ_JOINT, self._free_joint_names[0])
      fq = mj_model.jnt_qposadr[fj] + np.arange(7)
      fv = mj_model.jnt_dofadr[fj] + np.arange(6)
      root_body = int(mj_model.jnt_bodyid[fj])
    else:
      fj, fq, fv = -1, np.zeros(0, np.int64), np.zeros(0, np.int64)
      root_body = int(body_ids[0]) if len(body_ids) else 0
    sensor_map = tuple(
        (n, int(mj_model.sensor_adr[gid(mujoco.mjtObj.mjOBJ_SENSOR, n)]),
         int(mj_model.sensor_dim[gid(mujoco.mjtObj.mjOBJ_SENSOR, n)]))
        for n in self.sensor_names)
    return EntityIndexing(
        body_ids=body_ids, root_body_id=root_body, geom_ids=geom_ids,
        site_ids=site_ids, jnt_ids=jnt_ids,
        q_adr=q_adr.astype(np.int32), v_adr=v_adr.astype(np.int32),
        free_jnt_id=fj, free_q_adr=fq.astype(np.int32),
        free_v_adr=fv.astype(np.int32), ctrl_ids=ctrl_ids,
        body_names=tuple(self.body_names), joint_names=tuple(self.joint_names),
        geom_names=tuple(self.geom_names), site_names=tuple(self.site_names),
        actuator_names=tuple(self.actuator_names), sensor_map=sensor_map)


class EntityView:
  """Runtime facade over batched Data for one entity.

  All reads take the batched Data and return (num_envs, ...) arrays; all
  writes return a new Data. Functional analog of the reference's
  EntityData (reference src/mjlab/entity/data.py)."""

  def __init__(self, entity: Entity, model: Model,
               mj_model: mujoco.MjModel, prefix: str, dtype=jnp.float32):
    self.entity = entity
    self.idx = entity.compute_indexing(mj_model, prefix)
    self._croot_body = int(mj_model.body_rootid[self.idx.root_body_id])
    self.is_fixed_base = entity.is_fixed_base
    self.is_articulated = entity.is_articulated
    self.is_actuated = entity.is_actuated
    cfg = entity.cfg
    idx = self.idx

    # default state tensors (reference entity.py:325-423)
    init = cfg.init_state
    self.default_root_state = jnp.asarray(
        list(init.pos) + list(init.rot) + list(init.lin_vel)
        + list(init.ang_vel), dtype)
    nj = len(idx.joint_names)
    jp = np.zeros(nj)
    jv = np.zeros(nj)
    if nj:
      ids, _, vals = resolve_matching_names_values(
          init.joint_pos, idx.joint_names)
      jp[ids] = vals
      ids, _, vals = resolve_matching_names_values(
          init.joint_vel, idx.joint_names)
      jv[ids] = vals
    self.default_joint_pos = jnp.asarray(jp, dtype)
    self.default_joint_vel = jnp.asarray(jv, dtype)

    lim = (mj_model.jnt_range[idx.jnt_ids] if nj else np.zeros((0, 2)))
    self.joint_pos_limits = jnp.asarray(lim, dtype)
    mid = 0.5 * (lim[:, 0] + lim[:, 1])
    half = 0.5 * (lim[:, 1] - lim[:, 0]) * cfg.soft_joint_pos_limit_factor
    self.soft_joint_pos_limits = jnp.asarray(
        np.stack([mid - half, mid + half], -1) if nj else np.zeros((0, 2)),
        dtype)
    if len(idx.ctrl_ids):
      self.joint_stiffness = jnp.asarray(
          mj_model.actuator_gainprm[idx.ctrl_ids, 0], dtype)
      self.joint_damping = jnp.asarray(
          -mj_model.actuator_biasprm[idx.ctrl_ids, 2], dtype)
      self.joint_effort_limits = jnp.asarray(
          mj_model.actuator_forcerange[idx.ctrl_ids, 1], dtype)
    else:
      self.joint_stiffness = jnp.zeros(0, dtype)
      self.joint_damping = jnp.zeros(0, dtype)
      self.joint_effort_limits = jnp.zeros(0, dtype)

  # ------------------------------------------------------------------
  # reads (batched data)
  # ------------------------------------------------------------------
  def root_pos_w(self, d: Data) -> jax.Array:
    return d.xpos[:, self.idx.root_body_id]

  def root_quat_w(self, d: Data) -> jax.Array:
    return d.xquat[:, self.idx.root_body_id]

  def _vel_at(self, d: Data, body, pos) -> jax.Array:
    """world-frame (lin, ang) velocity of body-fixed point(s).

    cvel is anchored at the c-frame origin: the subtree com of the
    kinematic-root body (reference src/mjlab/entity/data.py:240-246)."""
    cvel = d.cvel[:, body]
    ang = cvel[..., :3]
    com = d.subtree_com[:, self._croot_body]
    if cvel.ndim == 3:
      com = com[:, None, :]
    lin = cvel[..., 3:] + jnp.cross(ang, pos - com)
    return jnp.concatenate([lin, ang], axis=-1)

  def root_vel_w(self, d: Data) -> jax.Array:
    """(num_envs, 6): [lin_vel_w, ang_vel_w] at the root link frame."""
    return self._vel_at(d, self.idx.root_body_id,
                        d.xpos[:, self.idx.root_body_id])

  def root_lin_vel_w(self, d: Data) -> jax.Array:
    return self.root_vel_w(d)[:, :3]

  def root_ang_vel_w(self, d: Data) -> jax.Array:
    return d.cvel[:, self.idx.root_body_id, :3]

  def root_lin_vel_b(self, d: Data) -> jax.Array:
    return tmath.quat_apply_inverse(self.root_quat_w(d),
                                    self.root_lin_vel_w(d))

  def root_ang_vel_b(self, d: Data) -> jax.Array:
    return tmath.quat_apply_inverse(self.root_quat_w(d),
                                    self.root_ang_vel_w(d))

  def projected_gravity_b(self, d: Data) -> jax.Array:
    g = jnp.asarray([0.0, 0.0, -1.0], d.qpos.dtype)
    return tmath.quat_apply_inverse(self.root_quat_w(d), g)

  def heading_w(self, d: Data) -> jax.Array:
    q = self.root_quat_w(d)
    fwd = tmath.quat_apply(q, jnp.asarray([1.0, 0.0, 0.0], q.dtype))
    return jnp.arctan2(fwd[:, 1], fwd[:, 0])

  def joint_pos(self, d: Data) -> jax.Array:
    return d.qpos[:, self.idx.q_adr]

  def joint_vel(self, d: Data) -> jax.Array:
    return d.qvel[:, self.idx.v_adr]

  def joint_acc(self, d: Data) -> jax.Array:
    return d.qacc[:, self.idx.v_adr]

  def actuator_force(self, d: Data) -> jax.Array:
    return d.actuator_force[:, self.idx.ctrl_ids]

  def applied_torque(self, d: Data) -> jax.Array:
    return d.qfrc_actuator[:, self.idx.v_adr]

  def body_pos_w(self, d: Data, body_ids=None) -> jax.Array:
    ids = self.idx.body_ids if body_ids is None else self.idx.body_ids[body_ids]
    return d.xpos[:, ids]

  def body_quat_w(self, d: Data, body_ids=None) -> jax.Array:
    ids = self.idx.body_ids if body_ids is None else self.idx.body_ids[body_ids]
    return d.xquat[:, ids]

  def body_vel_w(self, d: Data, body_ids=None) -> jax.Array:
    ids = self.idx.body_ids if body_ids is None else self.idx.body_ids[body_ids]
    return self._vel_at(d, ids, d.xpos[:, ids])

  def body_lin_vel_w(self, d: Data, body_ids=None) -> jax.Array:
    return self.body_vel_w(d, body_ids)[..., :3]

  def body_ang_vel_w(self, d: Data, body_ids=None) -> jax.Array:
    ids = self.idx.body_ids if body_ids is None else self.idx.body_ids[body_ids]
    return d.cvel[:, ids, :3]

  def geom_pos_w(self, d: Data, geom_ids=None) -> jax.Array:
    ids = self.idx.geom_ids if geom_ids is None else self.idx.geom_ids[geom_ids]
    return d.geom_xpos[:, ids]

  def site_pos_w(self, d: Data, site_ids=None) -> jax.Array:
    ids = self.idx.site_ids if site_ids is None else self.idx.site_ids[site_ids]
    return d.site_xpos[:, ids]

  def sensor_data(self, d: Data, name: str) -> jax.Array:
    for n, adr, dim in self.idx.sensor_map:
      if n == name:
        return d.sensordata[:, adr:adr + dim]
    raise KeyError(f'sensor {name!r} not on entity; '
                   f'available: {[n for n, _, _ in self.idx.sensor_map]}')

  # ------------------------------------------------------------------
  # writes (return new Data); `mask` selects envs (None = all)
  # ------------------------------------------------------------------
  @staticmethod
  def _masked_set(arr, cols, value, mask):
    # cast explicitly: under x64 (oracle tests) a float64 value scattered
    # into an f32 array is a FutureWarning, soon an error
    value = jnp.asarray(value, arr.dtype)
    new = arr.at[:, cols].set(value)
    if mask is None:
      return new
    return jnp.where(mask.reshape((-1,) + (1,) * (arr.ndim - 1)), new, arr)

  def write_root_pose(self, d: Data, pose: jax.Array, mask=None) -> Data:
    if self.is_fixed_base:
      raise ValueError('cannot write root pose of fixed-base entity')
    return d.replace(
        qpos=self._masked_set(d.qpos, self.idx.free_q_adr, pose, mask))

  def write_root_velocity(self, d: Data, vel: jax.Array, mask=None) -> Data:
    """Write (num_envs, 6) [lin_w, ang] into the free joint qvel. Note:
    like the reference (reference src/mjlab/entity/data.py:89-97) this
    writes qvel directly; MuJoCo free-joint angular velocity lives in the
    body-local frame."""
    if self.is_fixed_base:
      raise ValueError('cannot write root velocity of fixed-base entity')
    return d.replace(
        qvel=self._masked_set(d.qvel, self.idx.free_v_adr, vel, mask))

  def write_root_state(self, d: Data, state: jax.Array, mask=None) -> Data:
    d = self.write_root_pose(d, state[:, :7], mask)
    return self.write_root_velocity(d, state[:, 7:13], mask)

  def write_joint_state(self, d: Data, pos, vel, joint_ids=None,
                        mask=None) -> Data:
    q = self.idx.q_adr if joint_ids is None else self.idx.q_adr[joint_ids]
    v = self.idx.v_adr if joint_ids is None else self.idx.v_adr[joint_ids]
    return d.replace(
        qpos=self._masked_set(d.qpos, q, pos, mask),
        qvel=self._masked_set(d.qvel, v, vel, mask))

  def write_joint_position_target(self, d: Data, target, joint_ids=None,
                                  mask=None) -> Data:
    """PD position targets -> ctrl (reference entity.py:544-560)."""
    ids = (self.idx.ctrl_ids if joint_ids is None
           else self.idx.ctrl_ids[joint_ids])
    return d.replace(ctrl=self._masked_set(d.ctrl, ids, target, mask))

  def write_external_wrench(self, d: Data, force, torque, body_ids=None,
                            mask=None) -> Data:
    ids = self.idx.body_ids if body_ids is None else self.idx.body_ids[body_ids]
    wrench = jnp.concatenate([force, torque], axis=-1)
    return d.replace(
        xfrc_applied=self._masked_set(d.xfrc_applied, ids, wrench, mask))

  def reset(self, d: Data, mask=None) -> Data:
    """Clear entity-slice external forces and controls."""
    z = jnp.zeros_like
    xf = d.xfrc_applied.at[:, self.idx.body_ids].set(0.0)
    if mask is not None:
      xf = jnp.where(mask[:, None, None], xf, d.xfrc_applied)
    return d.replace(xfrc_applied=xf)
