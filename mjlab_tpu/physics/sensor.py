"""Sensor evaluation (mj_sensorPos/Vel/Acc analog).

Supported: jointpos/jointvel, actuatorpos/vel/frc, gyro, velocimeter,
accelerometer, framepos/quat/x/y/zaxis, framelinvel/frameangvel,
subtreecom/subtreelinvel, and the MuJoCo 3.x contact sensor (mjSENS_CONTACT
with intprm = [dataspec, reduce, num]) which the reference's
ContactSensorCfg builds for feet contact and self-collision monitoring
(reference src/mjlab/utils/spec_config.py:513-629).

Contact-sensor matching is resolved statically against the engine's static
collision pair table, so at runtime each sensor is a masked reduction over
its matching contact slots.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics import math as pmath
from mjlab_tpu.physics.constraint import efc_layout
from mjlab_tpu.physics.types import Data, DisableBit, Model, ModelStatic

# mjtSensor values (mujoco 3.10)
TOUCH = 0
ACCELEROMETER = 1
VELOCIMETER = 2
GYRO = 3
JOINTPOS = 9
JOINTVEL = 10
ACTUATORPOS = 13
ACTUATORVEL = 14
ACTUATORFRC = 15
FRAMEPOS = 26
FRAMEQUAT = 27
FRAMEXAXIS = 28
FRAMEYAXIS = 29
FRAMEZAXIS = 30
FRAMELINVEL = 31
FRAMEANGVEL = 32
SUBTREECOM = 35
SUBTREELINVEL = 36
CONTACT = 42

# mjtObj values
OBJ_BODY = 1
OBJ_XBODY = 2
OBJ_JOINT = 3
OBJ_GEOM = 5
OBJ_SITE = 6

# contact data fields (mjtConDataField), in layout order
_CONDATA_SIZES = {0: 1, 1: 3, 2: 3, 3: 1, 4: 3, 5: 3, 6: 3}
REDUCE_NONE, REDUCE_MINDIST, REDUCE_MAXFORCE, REDUCE_NETFORCE = 0, 1, 2, 3

SUPPORTED = {
    TOUCH, ACCELEROMETER, VELOCIMETER, GYRO, JOINTPOS, JOINTVEL, ACTUATORPOS,
    ACTUATORVEL, ACTUATORFRC, FRAMEPOS, FRAMEQUAT, FRAMEXAXIS, FRAMEYAXIS,
    FRAMEZAXIS, FRAMELINVEL, FRAMEANGVEL, SUBTREECOM, SUBTREELINVEL, CONTACT,
}


@dataclasses.dataclass(frozen=True)
class _ContactSensorStatic:
  slots: np.ndarray  # matching contact slot indices
  flip: np.ndarray  # 1.0 where the sensor's primary object is geom2
  dataspec: int
  reduce: int
  num: int
  adr: int
  dim: int


def _geom_set(stat: ModelStatic, objtype: int, objid: int) -> set:
  if objtype == OBJ_GEOM:
    return {objid}
  if objtype == OBJ_BODY:
    return set(np.nonzero(stat.geom_bodyid == objid)[0])
  if objtype == OBJ_XBODY:  # subtree
    # all bodies whose ancestor chain contains objid
    bodies = set()
    for b in range(stat.nbody):
      cur = b
      while True:
        if cur == objid:
          bodies.add(b)
          break
        if cur == 0:
          break
        cur = stat.body_parentid[cur]
    return set(np.nonzero(np.isin(stat.geom_bodyid, list(bodies)))[0])
  raise NotImplementedError(f'contact sensor objtype {objtype}')


@functools.lru_cache(maxsize=32)
def _contact_sensors(stat: ModelStatic):
  out = {}
  ncon = max(stat.pairs.ncon_max, 1)
  slot_g1 = np.zeros(ncon, np.int32)
  slot_g2 = np.zeros(ncon, np.int32)
  for _, (g1s, g2s, _pids, base, npts) in stat.pairs.groups.items():
    for i, (g1, g2) in enumerate(zip(g1s, g2s)):
      slot_g1[base + i * npts:base + (i + 1) * npts] = g1
      slot_g2[base + i * npts:base + (i + 1) * npts] = g2
  for i in range(stat.nsensor):
    if stat.sensor_type[i] != CONTACT:
      continue
    set1 = _geom_set(stat, int(stat.sensor_objtype[i]), int(stat.sensor_objid[i]))
    if stat.sensor_refid[i] >= 0 or stat.sensor_reftype[i] == OBJ_GEOM and stat.sensor_refid[i] == 0:
      set2 = _geom_set(stat, int(stat.sensor_reftype[i]), int(stat.sensor_refid[i]))
    else:
      set2 = None
    slots, flip = [], []
    for c in range(stat.pairs.ncon_max):
      g1, g2 = int(slot_g1[c]), int(slot_g2[c])
      if set2 is None:
        if g1 in set1:
          slots.append(c); flip.append(0.0)
        elif g2 in set1:
          slots.append(c); flip.append(1.0)
      else:
        if g1 in set1 and g2 in set2:
          slots.append(c); flip.append(0.0)
        elif g2 in set1 and g1 in set2:
          slots.append(c); flip.append(1.0)
    intprm = stat.sensor_intprm[i]
    out[i] = _ContactSensorStatic(
        slots=np.asarray(slots, np.int32), flip=np.asarray(flip),
        dataspec=int(intprm[0]), reduce=int(intprm[1]), num=int(intprm[2]),
        adr=int(stat.sensor_adr[i]), dim=int(stat.sensor_dim[i]))
  return out


def contact_force(m: Model, d: Data) -> jax.Array:
  """Per-contact-slot force in the contact frame (ncon, 6): decode the
  pyramidal efc forces (mj_contactForce analog). Torque part is zero for
  frictionless/pyramidal condim <= 3."""
  s = m.stat
  lay = efc_layout(s)
  ncon = max(s.pairs.ncon_max, 1)
  dtype = d.qpos.dtype
  force = jnp.zeros((ncon, 6), dtype)
  if not s.pairs.ncon_max:
    return force
  from mjlab_tpu.physics.constraint import elliptic_dmax, elliptic_row_maps
  dm = elliptic_dmax(s)
  if dm:
    # elliptic rows ARE the contact-frame force components
    x_rows, c1_rows, slots3, slots1 = elliptic_row_maps(s)
    f_pad = jnp.concatenate([d.efc_force, jnp.zeros(1, dtype)])
    if s.ncon_cap or s.ncon_cap1:
      p_all = d.contact.dist - d.contact.includemargin
      if s.ncon_cap:
        _, sel3 = jax.lax.top_k(-p_all[jnp.asarray(slots3)], s.ncon_cap)
        idx3 = jnp.asarray(slots3)[sel3]
        rows = f_pad[jnp.asarray(x_rows)]  # (K3, DM)
        force = force.at[idx3[:, None],
                         np.arange(dm)[None, :]].set(rows)
      if s.ncon_cap1:
        _, sel1 = jax.lax.top_k(-p_all[jnp.asarray(slots1)], s.ncon_cap1)
        idx1 = jnp.asarray(slots1)[sel1]
        force = force.at[idx1, 0].set(f_pad[jnp.asarray(c1_rows)])
      return force
    if len(slots3):
      rows = f_pad[jnp.asarray(x_rows)]  # invalid axes read the 0 pad
      force = force.at[np.asarray(slots3)[:, None],
                       np.arange(dm)[None, :]].set(rows)
    if len(slots1):
      force = force.at[np.asarray(slots1), 0].set(
          f_pad[jnp.asarray(c1_rows)])
    return force
  if s.ncon_cap or s.ncon_cap1:
    # Compacted mode: efc rows belong to the per-pool deepest candidate
    # slots. Re-derive the same deterministic top-K selections used by
    # constraint assembly and scatter the decoded forces back onto
    # candidate-slot indices (which is what contact sensors address).
    from mjlab_tpu.physics.constraint import compaction_slot_pools
    K3, K1 = s.ncon_cap, s.ncon_cap1
    A = max(int(s.con_dim.max()) - 1, 1)
    slots3, slots1 = compaction_slot_pools(s)
    p_all = d.contact.dist - d.contact.includemargin
    if K3:
      _, sel3 = jax.lax.top_k(-p_all[jnp.asarray(slots3)], K3)
      idx = jnp.asarray(slots3)[sel3]
      rows = d.efc_force[lay.con_base[:K3, None]
                         + np.arange(2 * A)[None, :]]
      pairs = rows.reshape(K3, A, 2)
      dim = jnp.asarray(s.con_dim)[idx]
      real_axis = jnp.arange(A)[None, :] < (dim[:, None] - 1)
      mu = jnp.where(real_axis, d.contact.friction[idx, :A], 0.0)
      sel = jnp.zeros((K3, 6), dtype)
      sel = sel.at[:, 0].set(jnp.sum(pairs, axis=(1, 2)))
      sel = sel.at[:, 1:1 + A].set(mu * (pairs[..., 0] - pairs[..., 1]))
      force = force.at[idx].set(sel)
    if K1:
      _, sel1 = jax.lax.top_k(-p_all[jnp.asarray(slots1)], K1)
      idx1 = jnp.asarray(slots1)[sel1]
      force = force.at[idx1, 0].set(d.efc_force[lay.con_base[K3:K3 + K1]])
    return force
  nc = s.pairs.ncon_max
  for dim in sorted(set(int(x) for x in s.con_dim[:nc])):
    sl = np.nonzero(s.con_dim[:nc] == dim)[0]
    if len(sl) == 0:
      continue
    if dim == 1:
      force = force.at[sl, 0].set(d.efc_force[lay.con_base[sl]])
      continue
    k = 2 * (dim - 1)
    rows = d.efc_force[
        (lay.con_base[sl][:, None] + np.arange(k)[None, :])]  # (nsl, k)
    pairs = rows.reshape(len(sl), dim - 1, 2)
    mu = d.contact.friction[sl, :dim - 1]
    force = force.at[sl, 0].set(jnp.sum(rows, axis=1))
    force = force.at[sl[:, None], 1 + np.arange(dim - 1)[None, :]].set(
        mu * (pairs[..., 0] - pairs[..., 1]))
  return force


def _object_pos_mat(m: Model, d: Data, objtype: int, objid: int):
  if objtype == OBJ_SITE:
    return d.site_xpos[objid], d.site_xmat[objid]
  if objtype == OBJ_BODY:
    return d.xipos[objid], d.ximat[objid]
  if objtype == OBJ_XBODY:
    return d.xpos[objid], d.xmat[objid]
  if objtype == OBJ_GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid]
  raise NotImplementedError(f'frame sensor objtype {objtype}')


def _object_body(stat: ModelStatic, objtype: int, objid: int) -> int:
  if objtype == OBJ_SITE:
    return int(stat.site_bodyid[objid])
  if objtype in (OBJ_BODY, OBJ_XBODY):
    return int(objid)
  if objtype == OBJ_GEOM:
    return int(stat.geom_bodyid[objid])
  raise NotImplementedError


def _point_vel(m: Model, d: Data, body: int, pos: jax.Array):
  """(angular, linear) world velocity of a body-fixed point."""
  root = m.stat.body_rootid[body]
  v = d.cvel[body]
  ang, lin = v[:3], v[3:]
  return ang, lin + jnp.cross(ang, pos - d.subtree_com[root])


def _cacc(m: Model, d: Data) -> jax.Array:
  """Post-solve body spatial accelerations (mj_rnePostConstraint subset)."""
  s = m.stat
  dtype = d.qpos.dtype
  anc = jnp.asarray(s.ancestor_mask, dtype)
  a0 = jnp.concatenate([jnp.zeros(3, dtype), -m.opt.gravity.astype(dtype)])
  if s.disableflags & DisableBit.GRAVITY:
    a0 = jnp.zeros(6, dtype)
  return a0[None, :] + anc @ (d.cdof_dot * d.qvel[:, None]
                              + d.cdof * d.qacc[:, None])


def sensors(m: Model, d: Data) -> Data:
  s = m.stat
  if s.nsensor == 0 or (s.disableflags & DisableBit.SENSOR):
    return d
  dtype = d.qpos.dtype
  out = d.sensordata
  cacc = None
  cforce = None

  for i in range(s.nsensor):
    st = int(s.sensor_type[i])
    adr = int(s.sensor_adr[i])
    objtype = int(s.sensor_objtype[i])
    objid = int(s.sensor_objid[i])

    if st == JOINTPOS:
      out = out.at[adr].set(d.qpos[s.jnt_qposadr[objid]])
    elif st == JOINTVEL:
      out = out.at[adr].set(d.qvel[s.jnt_dofadr[objid]])
    elif st == ACTUATORPOS:
      out = out.at[adr].set(d.actuator_length[objid])
    elif st == ACTUATORVEL:
      out = out.at[adr].set(d.actuator_velocity[objid])
    elif st == ACTUATORFRC:
      out = out.at[adr].set(d.actuator_force[objid])
    elif st == GYRO:
      body = _object_body(s, objtype, objid)
      ang = d.cvel[body, :3]
      out = out.at[adr:adr + 3].set(d.site_xmat[objid].T @ ang)
    elif st == VELOCIMETER:
      body = _object_body(s, objtype, objid)
      _, lin = _point_vel(m, d, body, d.site_xpos[objid])
      out = out.at[adr:adr + 3].set(d.site_xmat[objid].T @ lin)
    elif st == ACCELEROMETER:
      if cacc is None:
        cacc = _cacc(m, d)
      body = _object_body(s, objtype, objid)
      root = s.body_rootid[body]
      p = d.site_xpos[objid]
      offset = p - d.subtree_com[root]
      acc = pmath.transform_motion(cacc[body], offset)
      ang, lin = _point_vel(m, d, body, p)
      lin_acc = acc[3:] + jnp.cross(ang, lin)
      out = out.at[adr:adr + 3].set(d.site_xmat[objid].T @ lin_acc)
    elif st == FRAMEPOS:
      pos, _ = _object_pos_mat(m, d, objtype, objid)
      refid = int(s.sensor_refid[i])
      if refid >= 0:
        rpos, rmat = _object_pos_mat(m, d, int(s.sensor_reftype[i]), refid)
        pos = rmat.T @ (pos - rpos)
      out = out.at[adr:adr + 3].set(pos)
    elif st == FRAMEQUAT:
      _, mat = _object_pos_mat(m, d, objtype, objid)
      q = pmath.mat_to_quat(mat)
      refid = int(s.sensor_refid[i])
      if refid >= 0:
        _, rmat = _object_pos_mat(m, d, int(s.sensor_reftype[i]), refid)
        q = pmath.mul_quat(pmath.neg_quat(pmath.mat_to_quat(rmat)), q)
      out = out.at[adr:adr + 4].set(q)
    elif st in (FRAMEXAXIS, FRAMEYAXIS, FRAMEZAXIS):
      _, mat = _object_pos_mat(m, d, objtype, objid)
      out = out.at[adr:adr + 3].set(mat[:, st - FRAMEXAXIS])
    elif st == FRAMELINVEL:
      body = _object_body(s, objtype, objid)
      pos, _ = _object_pos_mat(m, d, objtype, objid)
      _, lin = _point_vel(m, d, body, pos)
      out = out.at[adr:adr + 3].set(lin)
    elif st == FRAMEANGVEL:
      body = _object_body(s, objtype, objid)
      out = out.at[adr:adr + 3].set(d.cvel[body, :3])
    elif st == SUBTREECOM:
      out = out.at[adr:adr + 3].set(d.subtree_com[objid])
    elif st == SUBTREELINVEL:
      # momentum / mass of subtree
      sub = jnp.asarray(s.subtree_mask, dtype)[objid]  # (nbody,)
      gb = s.body_rootid
      del gb
      mass = m.body_mass
      # linear velocity of each body's com
      root = s.body_rootid
      lin = d.cvel[:, 3:] + jnp.cross(d.cvel[:, :3],
                                      d.xipos - d.subtree_com[root])
      mom = jnp.sum((sub * mass)[:, None] * lin, axis=0)
      out = out.at[adr:adr + 3].set(mom / jnp.maximum(jnp.sum(sub * mass), 1e-12))
    elif st == TOUCH:
      # sum of normal forces on contacts involving the site's body geoms
      if cforce is None:
        cforce = contact_force(m, d)
      body = s.site_bodyid[objid]
      g1 = s.con_geom1
      g2 = s.con_geom2
      match = ((s.geom_bodyid[g1] == body) | (s.geom_bodyid[g2] == body))
      active = d.contact.dist < d.contact.includemargin
      fn = jnp.where(jnp.asarray(match) & active, cforce[:, 0], 0.0)
      out = out.at[adr].set(jnp.sum(fn))
    elif st == CONTACT:
      if cforce is None:
        cforce = contact_force(m, d)
      cs = _contact_sensors(s)[i]
      out = _contact_sensor(m, d, cs, cforce, out)
    else:
      raise NotImplementedError(f'sensor type {st}')
  return d.replace(sensordata=out)


def _contact_sensor(m: Model, d: Data, cs: _ContactSensorStatic,
                    cforce: jax.Array, out: jax.Array) -> jax.Array:
  dtype = out.dtype
  if len(cs.slots) == 0:
    return out
  slots = cs.slots
  flip = jnp.asarray(cs.flip, dtype)
  dist = d.contact.dist[slots]
  active = dist < d.contact.includemargin[slots]
  # world-frame force on the *secondary* object set; flip to primary
  frames = d.contact.frame[slots]  # (k, 3, 3) rows normal/t1/t2
  f_local = cforce[slots, :3]
  f_world = jnp.einsum('kfx,kf->kx', frames, f_local)
  sign = 1.0 - 2.0 * flip
  f_world = f_world * sign[:, None] * active[:, None].astype(dtype)
  normals = frames[:, 0] * sign[:, None]
  poss = d.contact.pos[slots]

  found = jnp.sum(active.astype(jnp.int32))

  def write_record(out, base, rec):
    """rec: dict field -> array; writes fields present in dataspec."""
    off = base
    for field in range(7):
      if not (cs.dataspec & (1 << field)):
        continue
      size = _CONDATA_SIZES[field]
      val = rec[field]
      out = jax.lax.dynamic_update_slice(out, val.reshape(size).astype(dtype),
                                         (off,))
      off += size
    return out, off

  big = jnp.asarray(1e10, dtype)
  if cs.reduce == REDUCE_NETFORCE:
    rec = {
        0: found.astype(dtype)[None],
        1: jnp.sum(f_world, axis=0),
        2: jnp.zeros(3, dtype),
        3: jnp.min(jnp.where(active, dist, big))[None],
        4: jnp.sum(poss * active[:, None], 0) / jnp.maximum(found, 1),
        5: jnp.zeros(3, dtype).at[2].set(1.0),
        6: jnp.zeros(3, dtype),
    }
    out, _ = write_record(out, cs.adr, rec)
    return out

  if cs.reduce in (REDUCE_MINDIST, REDUCE_MAXFORCE):
    if cs.reduce == REDUCE_MINDIST:
      score = jnp.where(active, dist, big)
      idx = jnp.argmin(score)
    else:
      mag = jnp.linalg.norm(f_world, axis=-1)
      idx = jnp.argmax(jnp.where(active, mag, -1.0))
    rec = {
        0: found.astype(dtype)[None],
        1: f_world[idx],
        2: jnp.zeros(3, dtype),
        3: dist[idx][None],
        4: poss[idx],
        5: normals[idx],
        6: frames[idx, 1],
    }
    out, _ = write_record(out, cs.adr, rec)
    return out

  # reduce == none: first `num` active contacts in slot order.
  # Build a stable ordering: active slots first (by slot order).
  order = jnp.argsort(jnp.where(active, jnp.arange(len(slots)),
                                len(slots) + jnp.arange(len(slots))))
  base = cs.adr
  # first entry is always 'found' count if requested
  rec_size = sum(_CONDATA_SIZES[f] for f in range(7)
                 if cs.dataspec & (1 << f))
  for k in range(cs.num):
    if k >= len(slots):
      break
    sel = order[k]
    ok = active[sel] & (k < found)
    z3 = jnp.zeros(3, dtype)
    rec = {
        0: found.astype(dtype)[None],
        1: jnp.where(ok, f_world[sel], z3),
        2: z3,
        3: jnp.where(ok, dist[sel], 0.0)[None],
        4: jnp.where(ok, poss[sel], z3),
        5: jnp.where(ok, normals[sel], z3),
        6: jnp.where(ok, frames[sel, 1], z3),
    }
    out, _ = write_record(out, base + k * rec_size, rec)
  return out
