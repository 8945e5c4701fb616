"""Fused smooth-dynamics Pallas TPU kernel (default ON since round 4).

One kernel computes, per 128-env lane block, everything between qpos/qvel
and the constraint stage: forward kinematics, body/geom/site frames,
subtree COM, spatial inertias (cinr), cdof, body spatial velocities,
cdof_dot, the CRB mass matrix, and the RNE bias force — the stages
`pipeline.fwd_position`/`fwd_velocity` otherwise run as hundreds of
small XLA ops over (B, nbody, ...) tensors (physics/kinematics.py,
physics/smooth.py). Same design as the whole-solver kernel
(ops/newton.py): structure-of-arrays with the batch on the 128-lane
axis, so each scalar of the per-env tree recursion is one VPU vector op,
and all intermediates stay in VMEM.

Scope (dispatch guard, else the XLA path runs): single kinematic tree
whose root body has one FREE joint, every other body has at most one
HINGE or SLIDE joint, no mocap bodies — the legged-robot class (covers
the shipped Unitree G1/Go1). Measured on chip (round 4): +8.3%
end-to-end on the G1 velocity bench (20,268 vs 18,721 env-steps/s/chip
at 4096 envs), so it is ON by default; MJLAB_SMOOTH_KERNEL=0 opts out.
Interpret-mode equivalence vs the XLA stages:
tests/test_smooth_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mjlab_tpu.physics.types import DisableBit, JointType

_LANES = 128


# ---------------------------------------------------------------------------
# static tree schedule
# ---------------------------------------------------------------------------


class _Tree:
  """Static per-model schedule for the unrolled kernel loops."""

  def __init__(self, s):
    self.nbody = int(s.nbody)
    self.njnt = int(s.njnt)
    self.nv = int(s.nv)
    self.nq = int(s.nq)
    self.ngeom = int(s.ngeom)
    self.nsite = int(s.nsite)
    # parent-before-child order, excluding the world body
    self.order = [int(b) for level in s.body_levels for b in level
                  if int(b) != 0]
    self.parent = [int(p) for p in s.body_parentid]
    # at most one joint per body (dispatch guard checks)
    self.jnt_of_body = [-1] * self.nbody
    for j in range(self.njnt):
      self.jnt_of_body[int(s.jnt_bodyid[j])] = j
    self.jnt_type = [int(t) for t in s.jnt_type]
    self.jnt_qposadr = [int(a) for a in s.jnt_qposadr]
    self.jnt_dofadr = [int(a) for a in s.jnt_dofadr]
    self.dof_bodyid = [int(b) for b in s.dof_bodyid]
    self.body_rootid = [int(r) for r in s.body_rootid]
    self.geom_bodyid = [int(b) for b in s.geom_bodyid]
    self.site_bodyid = [int(b) for b in s.site_bodyid]
    # dofs of each body in order
    self.dofs_of_body = [[] for _ in range(self.nbody)]
    for d in range(self.nv):
      self.dofs_of_body[self.dof_bodyid[d]].append(d)
    # qM sparsity: for dof i, the j <= i with ancestor_mask[body(i), j]
    anc = np.asarray(s.ancestor_mask)
    self.qm_pairs = []
    for i in range(self.nv):
      js = [j for j in range(i + 1)
            if anc[self.dof_bodyid[i], j] > 0.5]
      self.qm_pairs.append(js)
    self.gravity_off = bool(s.disableflags & DisableBit.GRAVITY)

  @staticmethod
  def supported(s) -> bool:
    if s.nmocap:
      return False
    jnt_per_body = np.zeros(s.nbody, np.int32)
    for j in range(int(s.njnt)):
      jnt_per_body[int(s.jnt_bodyid[j])] += 1
    if (jnt_per_body > 1).any():
      return False
    for j in range(int(s.njnt)):
      t = int(s.jnt_type[j])
      b = int(s.jnt_bodyid[j])
      if t == int(JointType.FREE):
        if int(s.body_parentid[b]) != 0:
          return False
      elif t not in (int(JointType.HINGE), int(JointType.SLIDE)):
        return False
    return True


@functools.lru_cache(maxsize=8)
def _tree_cached(s):
  return _Tree(s)


# ---------------------------------------------------------------------------
# channel-first (k, BB) vector/matrix helpers
# ---------------------------------------------------------------------------


def _rsum(v):
  """(R, BB) -> (1, BB) sum (Mosaic-lowerable; see ops/newton.py)."""
  return jnp.sum(v[None], axis=1)


def _cross(a, b):
  """(3, BB) x (3, BB) -> (3, BB)."""
  return jnp.concatenate([
      a[1:2] * b[2:3] - a[2:3] * b[1:2],
      a[2:3] * b[0:1] - a[0:1] * b[2:3],
      a[0:1] * b[1:2] - a[1:2] * b[0:1],
  ], axis=0)


def _qmul(a, b):
  """(4, BB) Hamilton product."""
  aw, ax, ay, az = a[0:1], a[1:2], a[2:3], a[3:4]
  bw, bx, by, bz = b[0:1], b[1:2], b[2:3], b[3:4]
  return jnp.concatenate([
      aw * bw - ax * bx - ay * by - az * bz,
      aw * bx + ax * bw + ay * bz - az * by,
      aw * by - ax * bz + ay * bw + az * bx,
      aw * bz + ax * by - ay * bx + az * bw,
  ], axis=0)


def _qnorm(q):
  n2 = _rsum(q * q)
  n = jnp.sqrt(jnp.maximum(n2, 1e-24))
  ident = jnp.concatenate(
      [jnp.ones_like(q[0:1]), jnp.zeros_like(q[1:4])], axis=0)
  return jnp.where(n > 1e-12, q / n, ident)


def _qrot(v, q):
  """Rotate (3, BB) v by quaternion (4, BB) q."""
  w = q[0:1]
  u = q[1:4]
  uv = _cross(u, v)
  return v + 2.0 * (w * uv + _cross(u, uv))


def _q2m(q):
  """(4, BB) -> (9, BB) row-major rotation matrix."""
  w, x, y, z = q[0:1], q[1:2], q[2:3], q[3:4]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return jnp.concatenate([
      1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
      2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
      2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
  ], axis=0)


def _m3_col(m, i):
  """Column i of a (9, BB) row-major 3x3."""
  return jnp.concatenate([m[i:i + 1], m[3 + i:4 + i], m[6 + i:7 + i]], 0)


def _m3_vec(m, v):
  """(9, BB) @ (3, BB)."""
  return jnp.concatenate([
      _rsum(m[0:3] * v), _rsum(m[3:6] * v), _rsum(m[6:9] * v)], axis=0)


def _m3_mul(a, b):
  """(9, BB) @ (9, BB) row-major."""
  rows = []
  for i in range(3):
    for j in range(3):
      rows.append(_rsum(a[3 * i:3 * i + 3] * _m3_col(b, j)))
  return jnp.concatenate(rows, axis=0)


def _m3_T(m):
  idx = [0, 3, 6, 1, 4, 7, 2, 5, 8]
  return jnp.concatenate([m[i:i + 1] for i in idx], axis=0)


def _hat(v):
  """(3, BB) -> (9, BB) skew matrix."""
  z = jnp.zeros_like(v[0:1])
  x, y, w = v[0:1], v[1:2], v[2:3]
  return jnp.concatenate([z, -w, y, w, z, -x, -y, x, z], axis=0)


def _mot_cross(v, u):
  """Spatial motion cross (6, BB) x (6, BB) (mju_crossMotion)."""
  vang, vlin = v[0:3], v[3:6]
  uang, ulin = u[0:3], u[3:6]
  return jnp.concatenate(
      [_cross(vang, uang), _cross(vang, ulin) + _cross(vlin, uang)], axis=0)


def _frc_cross(v, f):
  """Spatial force cross v x* f (mju_crossForce)."""
  vang, vlin = v[0:3], v[3:6]
  fang, flin = f[0:3], f[3:6]
  return jnp.concatenate(
      [_cross(vang, fang) + _cross(vlin, flin), _cross(vang, flin)], axis=0)


def _i66_vec(M, v):
  """(36, BB) 6x6 row-major @ (6, BB)."""
  rows = [_rsum(M[6 * i:6 * i + 6] * v) for i in range(6)]
  return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(tree: _Tree):
  nb, nv, nj = tree.nbody, tree.nv, tree.njnt
  ng, ns = tree.ngeom, tree.nsite
  FREE, HINGE = int(JointType.FREE), int(JointType.HINGE)
  SLIDE = int(JointType.SLIDE)

  def kernel(qpos_ref, qvel_ref, qpos0_ref, bconst_ref, jconst_ref,
             gconst_ref, sconst_ref, arm_ref, grav_ref,
             xpos_ref, xquat_ref, xmat_ref, xipos_ref, ximat_ref,
             xanchor_ref, xaxis_ref, gxpos_ref, gxmat_ref,
             sxpos_ref, sxmat_ref, scom_ref, cinr_ref, cdof_ref,
             cvel_ref, cdofdot_ref, qM_ref, qbias_ref):
    qpos = qpos_ref[:, :]
    qvel = qvel_ref[:, :]
    qpos0 = qpos0_ref[:, :]
    grav = grav_ref[:, :]
    dt = qpos.dtype
    BB = qpos.shape[-1]
    zero3 = jnp.zeros((3, BB), dt)
    ident4 = jnp.concatenate(
        [jnp.ones((1, BB), dt), jnp.zeros((3, BB), dt)], axis=0)

    def bconst(b):
      row = bconst_ref[b, :, :]  # (18, BB)
      return (row[0:3], row[3:7], row[7:10], row[10:14], row[14:17],
              row[17:18])  # pos, quat, ipos, iquat, inertia, mass

    # ---- forward kinematics -------------------------------------------
    xpos = [zero3] * nb
    xquat = [ident4] * nb
    xanchor = [None] * max(nj, 1)
    xaxis = [None] * max(nj, 1)
    for b in tree.order:
      p = tree.parent[b]
      bpos, bquat, _, _, _, _ = bconst(b)
      pos = xpos[p] + _qrot(bpos, xquat[p])
      quat = _qmul(xquat[p], bquat)
      j = tree.jnt_of_body[b]
      if j >= 0:
        jt = tree.jnt_type[j]
        qa = tree.jnt_qposadr[j]
        if jt == FREE:
          pos = qpos[qa:qa + 3]
          quat = _qnorm(qpos[qa + 3:qa + 7])
          xanchor[j] = pos
          xaxis[j] = jnp.concatenate(
              [jnp.zeros((2, BB), dt), jnp.ones((1, BB), dt)], axis=0)
        else:
          jrow = jconst_ref[j, :, :]  # (6, BB): jnt_pos, jnt_axis
          jpos, jaxis = jrow[0:3], jrow[3:6]
          anchor = pos + _qrot(jpos, quat)
          axis_w = _qrot(jaxis, quat)
          xanchor[j] = anchor
          xaxis[j] = axis_w
          delta = qpos[qa:qa + 1] - qpos0[qa:qa + 1]
          if jt == SLIDE:
            pos = pos + axis_w * delta
          elif jt == HINGE:
            half = 0.5 * delta
            qloc = jnp.concatenate([jnp.cos(half), jaxis * jnp.sin(half)],
                                   axis=0)
            quat = _qmul(quat, qloc)
            pos = anchor - _qrot(jpos, quat)
      quat = _qnorm(quat)
      xpos[b] = pos
      xquat[b] = quat

    xmat = [_q2m(q) for q in xquat]
    xipos = [None] * nb
    ximat = [None] * nb
    for b in range(nb):
      _, _, bipos, biquat, _, _ = bconst(b)
      xipos[b] = xpos[b] + _qrot(bipos, xquat[b])
      ximat[b] = _q2m(_qmul(xquat[b], biquat))

    for g in range(ng):
      b = tree.geom_bodyid[g]
      grow = gconst_ref[g, :, :]  # (7, BB): pos, quat
      gxpos_ref[g, :, :] = xpos[b] + _qrot(grow[0:3], xquat[b])
      gxmat_ref[g, :, :] = _q2m(_qmul(xquat[b], grow[3:7]))
    for st in range(ns):
      b = tree.site_bodyid[st]
      srow = sconst_ref[st, :, :]
      sxpos_ref[st, :, :] = xpos[b] + _qrot(srow[0:3], xquat[b])
      sxmat_ref[st, :, :] = _q2m(_qmul(xquat[b], srow[3:7]))

    # ---- subtree com (backward) ---------------------------------------
    msum = [None] * nb
    mom = [None] * nb
    for b in range(nb):
      mass = bconst(b)[5]
      msum[b] = mass
      mom[b] = mass * xipos[b]
    for b in reversed(tree.order):
      p = tree.parent[b]
      msum[p] = msum[p] + msum[b]
      mom[p] = mom[p] + mom[b]
    scom = [mom[b] / jnp.maximum(msum[b], 1e-12) for b in range(nb)]

    # ---- cinr (spatial inertias in the c-frame) -----------------------
    cinr = [None] * nb
    for b in range(nb):
      _, _, _, _, binertia, mass = bconst(b)
      R = ximat[b]
      # I_world = R diag(inertia) R^T
      RD = jnp.concatenate(
          [R[0:3] * binertia, R[3:6] * binertia, R[6:9] * binertia], axis=0)
      Iw = _m3_mul(RD, _m3_T(R))
      offset = xipos[b] - scom[tree.body_rootid[b]]
      h = mass * offset
      hhat = _hat(h)
      hhh = _m3_mul(hhat, _m3_T(hhat))
      icom = Iw + hhh / jnp.maximum(mass, 1e-12)
      one = jnp.ones((1, BB), dt)
      zr = jnp.zeros((1, BB), dt)
      eye_rows = [jnp.concatenate([one if k == i else zr
                                   for k in range(3)], axis=0)
                  for i in range(3)]
      rows = []
      for i in range(3):  # top: [icom, hhat]
        rows.append(icom[3 * i:3 * i + 3])
        rows.append(hhat[3 * i:3 * i + 3])
      for i in range(3):  # bottom: [-hhat, m I]
        rows.append(-hhat[3 * i:3 * i + 3])
        rows.append(mass * eye_rows[i])
      cinr[b] = jnp.concatenate(rows, axis=0)  # (36, BB)

    # ---- cdof ---------------------------------------------------------
    cdof = [None] * nv
    for j in range(nj):
      jt = tree.jnt_type[j]
      b = tree.dof_bodyid[tree.jnt_dofadr[j]]
      da = tree.jnt_dofadr[j]
      croot = scom[tree.body_rootid[b]]
      if jt == FREE:
        one = jnp.ones((1, BB), dt)
        zr = jnp.zeros((1, BB), dt)
        for i in range(3):
          e = jnp.concatenate([one if k == i else zr for k in range(3)], 0)
          cdof[da + i] = jnp.concatenate([jnp.zeros((3, BB), dt), e], 0)
        off = croot - xanchor[j]
        R = xmat[b]
        for i in range(3):
          ax = _m3_col(R, i)
          cdof[da + 3 + i] = jnp.concatenate([ax, _cross(ax, off)], 0)
      elif jt == SLIDE:
        ax = xaxis[j]
        cdof[da] = jnp.concatenate([jnp.zeros((3, BB), dt), ax], 0)
      else:  # HINGE
        ax = xaxis[j]
        off = croot - xanchor[j]
        cdof[da] = jnp.concatenate([ax, _cross(ax, off)], 0)

    # ---- com_vel: cvel + cdof_dot -------------------------------------
    dof_vel = [cdof[d] * qvel[d:d + 1] for d in range(nv)]
    cvel = [jnp.zeros((6, BB), dt)] * nb
    cdof_dot = [None] * nv
    for b in tree.order:
      v = cvel[tree.parent[b]]
      # dofs are grouped per joint SEGMENT: all dofs of a segment share
      # the prefix velocity at segment start (MuJoCo mj_comVel processes
      # joints, not dofs — a free joint's 3 rotational dofs all see
      # parent + translational velocity, NOT each other)
      j = tree.jnt_of_body[b]
      dofs = tree.dofs_of_body[b]
      if j >= 0 and tree.jnt_type[j] == FREE:
        segments = [dofs[:3], dofs[3:]]
      else:
        segments = [dofs]
      for seg in segments:
        for d in seg:
          cdof_dot[d] = _mot_cross(v, cdof[d])
        for d in seg:
          v = v + dof_vel[d]
      cvel[b] = v

    # ---- CRB mass matrix ----------------------------------------------
    crb_b = list(cinr)
    for b in reversed(tree.order):
      p = tree.parent[b]
      crb_b[p] = crb_b[p] + crb_b[b]
    # qM rows (write the full symmetric matrix + armature diagonal)
    arm = arm_ref[:, :]
    qm_rows = [[None] * nv for _ in range(nv)]
    for i in range(nv):
      t_i = _i66_vec(crb_b[tree.dof_bodyid[i]], cdof[i])  # (6, BB)
      for j in tree.qm_pairs[i]:
        v = _rsum(t_i * cdof[j])  # (1, BB)
        qm_rows[i][j] = v
        qm_rows[j][i] = v
    zero1 = jnp.zeros((1, BB), dt)
    for i in range(nv):
      row = []
      for j in range(nv):
        v = qm_rows[i][j] if qm_rows[i][j] is not None else zero1
        if j == i:
          v = v + arm[i:i + 1]
        row.append(v)
      qM_ref[i, :, :] = jnp.concatenate(row, axis=0)

    # ---- RNE bias -----------------------------------------------------
    if tree.gravity_off:
      a0 = jnp.zeros((6, BB), dt)
    else:
      a0 = jnp.concatenate([jnp.zeros((3, BB), dt), -grav], axis=0)
    cacc = [None] * nb
    cacc[0] = a0
    for b in tree.order:
      a = cacc[tree.parent[b]]
      for d in tree.dofs_of_body[b]:
        a = a + cdof_dot[d] * qvel[d:d + 1]
      cacc[b] = a
    cfrc = [None] * nb
    for b in range(nb):
      cf = _i66_vec(cinr[b], cacc[b])
      cf = cf + _frc_cross(cvel[b], _i66_vec(cinr[b], cvel[b]))
      cfrc[b] = cf
    # subtree force sums (backward), then qfrc_bias[i] = cdof_i . S[body_i]
    S = list(cfrc)
    for b in reversed(tree.order):
      p = tree.parent[b]
      S[p] = S[p] + S[b]
    for i in range(nv):
      qbias_ref[i, :, :] = _rsum(cdof[i] * S[tree.dof_bodyid[i]])

    # ---- store remaining outputs --------------------------------------
    for b in range(nb):
      xpos_ref[b, :, :] = xpos[b]
      xquat_ref[b, :, :] = xquat[b]
      xmat_ref[b, :, :] = xmat[b]
      xipos_ref[b, :, :] = xipos[b]
      ximat_ref[b, :, :] = ximat[b]
      scom_ref[b, :, :] = scom[b]
      cinr_ref[b, :, :] = cinr[b]
      cvel_ref[b, :, :] = cvel[b]
    for j in range(nj):
      xanchor_ref[j, :, :] = xanchor[j]
      xaxis_ref[j, :, :] = xaxis[j]
    for d in range(nv):
      cdof_ref[d, :, :] = cdof[d]
      cdofdot_ref[d, :, :] = cdof_dot[d]

  return kernel


@functools.partial(
    jax.jit, static_argnames=('tree', 'block_b', 'interpret'))
def smooth_fused_tpu(tree: _Tree, qpos, qvel, qpos0, bconst, jconst,
                     gconst, sconst, armature, gravity,
                     block_b: int = _LANES, interpret: bool = False):
  """Batched fused smooth stage. All array args are (B, ...) batched
  (broadcast model fields before calling). Returns a dict of outputs
  batched on axis 0."""
  B = qpos.shape[0]
  nb, nv, nj = tree.nbody, tree.nv, tree.njnt
  ng, ns = tree.ngeom, tree.nsite
  dt = qpos.dtype
  pad = (-B) % block_b
  Bp = B + pad

  def prep(x):
    if pad:
      x = jnp.concatenate(
          [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return jnp.moveaxis(x, 0, -1)

  # identity quats in the padding so _qnorm/q2m stay well-defined
  qpos_p = qpos
  if pad:
    padq = jnp.zeros((pad, qpos.shape[1]), dt)
    free_qa = [tree.jnt_qposadr[j] for j in range(nj)
               if tree.jnt_type[j] == int(JointType.FREE)]
    for qa in free_qa:
      padq = padq.at[:, qa + 3].set(1.0)
    qpos_p = jnp.concatenate([qpos, padq], axis=0)
  args = [jnp.moveaxis(qpos_p, 0, -1)] + [
      prep(a) for a in (qvel, qpos0, bconst, jconst, gconst, sconst,
                        armature, gravity)]

  def spec(shape):
    ix = (lambda i: (0, i)) if len(shape) == 2 else (lambda i: (0, 0, i))
    return pl.BlockSpec(shape[:-1] + (block_b,), ix,
                        memory_space=pltpu.VMEM)

  in_specs = [spec(a.shape) for a in args]
  out_shapes = [
      (nb, 3), (nb, 4), (nb, 9), (nb, 3), (nb, 9),           # x*, xi*
      (max(nj, 1), 3), (max(nj, 1), 3),                      # xanchor/xaxis
      (max(ng, 1), 3), (max(ng, 1), 9),                      # geom
      (max(ns, 1), 3), (max(ns, 1), 9),                      # site
      (nb, 3), (nb, 36), (nv, 6), (nb, 6), (nv, 6),          # scom..cdofdot
      (nv, nv), (nv, 1),                                     # qM, qbias
  ]
  out = pl.pallas_call(
      _make_kernel(tree),
      grid=(Bp // block_b,),
      in_specs=in_specs,
      out_specs=[spec(s + (Bp,)) for s in out_shapes],
      out_shape=[jax.ShapeDtypeStruct(s + (Bp,), dt) for s in out_shapes],
      interpret=interpret,
  )(*args)
  back = lambda x: jnp.moveaxis(x, -1, 0)[:B]
  keys = ('xpos', 'xquat', 'xmat', 'xipos', 'ximat', 'xanchor', 'xaxis',
          'geom_xpos', 'geom_xmat', 'site_xpos', 'site_xmat',
          'subtree_com', 'cinr', 'cdof', 'cvel', 'cdof_dot', 'qM',
          'qfrc_bias')
  res = {k: back(v) for k, v in zip(keys, out)}
  res['xmat'] = res['xmat'].reshape(B, nb, 3, 3)
  res['ximat'] = res['ximat'].reshape(B, nb, 3, 3)
  res['geom_xmat'] = res['geom_xmat'].reshape(B, -1, 3, 3)[:, :ng]
  res['site_xmat'] = res['site_xmat'].reshape(B, -1, 3, 3)[:, :ns]
  res['geom_xpos'] = res['geom_xpos'][:, :ng]
  res['site_xpos'] = res['site_xpos'][:, :ns]
  res['cinr'] = res['cinr'].reshape(B, nb, 6, 6)
  res['qfrc_bias'] = res['qfrc_bias'][..., 0]
  return res
