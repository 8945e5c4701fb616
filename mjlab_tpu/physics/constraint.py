"""Constraint row assembly (dof friction, joint limits, contacts).

The efc row layout is fully static: every dof gets a friction-loss row
(masked by frictionloss > 0 so domain randomization can toggle it), every
limited hinge/slide joint gets a limit row, and every contact slot gets its
pyramidal rows (2*(condim-1), or 1 when condim == 1). Inactive rows carry
zero impedance, so the solver is shape-stable across steps - the TPU
replacement for MuJoCo's dynamic nefc (reference njmax padding,
reference src/mjlab/sim/sim.py:87-88).

Formulas follow the MuJoCo constraint model (impedance sigmoid from solimp,
reference acceleration from solref, R = (1-d)/d * diagApprox) and are
validated against mjData.efc_* in tests/test_physics_constraint.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics.types import Data, DisableBit, JointType, Model, ModelStatic

_MINIMP = 0.0001
_MAXIMP = 0.9999
_MINVAL = 1e-15


_EQ_CONNECT, _EQ_WELD, _EQ_JOINT = 0, 1, 2
_EQ_ROWS = {_EQ_CONNECT: 3, _EQ_WELD: 6, _EQ_JOINT: 1}


def equality_rows_count(stat: ModelStatic) -> int:
  if not stat.neq:
    return 0
  return int(sum(_EQ_ROWS[int(t)] for t in stat.eq_type[:stat.neq]))


@dataclasses.dataclass(frozen=True)
class EfcLayout:
  """Row order matches MuJoCo's efc arrays:
  [equality | dof friction | joint limits | contacts]."""
  nefc: int
  # equality rows: [0, ne)
  ne: int
  # friction rows: one per dof, rows [ne, ne + nv)
  nf: int
  # limit rows
  limit_jnt: np.ndarray  # joint ids with limits (hinge/slide)
  limit_base: int
  # contact rows
  con_base: np.ndarray  # (ncon,) first row of each contact slot
  con_rows: np.ndarray  # (ncon,) number of rows of each slot
  # tendon limit rows (dense J): after joint limits, before contacts
  limit_ten: np.ndarray = dataclasses.field(
      default_factory=lambda: np.zeros(0, np.int64))

  @property
  def nl(self) -> int:
    return len(self.limit_jnt)

  @property
  def nlt(self) -> int:
    return len(self.limit_ten)

  @property
  def ncr(self) -> int:
    """Total dense contact rows."""
    return self.nefc - self.ne - self.nf - self.nl - self.nlt


def elliptic_dmax(stat: ModelStatic) -> int:
  """Max condim over frictional contact slots when the model uses the
  elliptic friction cone; 0 for pyramidal models or no frictional slots.
  Nonzero => make_efc emits the structured elliptic x_* block."""
  if stat.cone != 1 or not stat.pairs.ncon_max:
    return 0
  dims = np.asarray(stat.con_dim[:stat.pairs.ncon_max])
  dm = int(dims.max()) if len(dims) else 0
  return dm if dm > 1 else 0


@functools.lru_cache(maxsize=32)
def efc_layout(stat: ModelStatic) -> EfcLayout:
  ne = equality_rows_count(stat)
  nf = stat.nv
  limit_jnt = np.nonzero(
      stat.jnt_limited &
      np.isin(stat.jnt_type, (int(JointType.HINGE), int(JointType.SLIDE))))[0]
  limit_base = ne + nf
  limit_ten = (np.nonzero(stat.ten_limited[:stat.ntendon])[0]
               if stat.ntendon else np.zeros(0, np.int64))
  nlt = len(limit_ten)
  if stat.ncon_cap or stat.ncon_cap1:
    # compacted layout, two pools: ncon_cap frictional slots with a
    # uniform pyramidal structure (2 rows per friction axis of the max
    # frictional condim), then ncon_cap1 frictionless slots with one
    # normal row each
    k3, k1 = stat.ncon_cap, stat.ncon_cap1
    dm = elliptic_dmax(stat)
    k_rows = dm if dm else 2 * max(int(stat.con_dim.max()) - 1, 1)
    base0 = limit_base + len(limit_jnt) + nlt
    con_base = np.concatenate([
        base0 + k_rows * np.arange(k3, dtype=np.int32),
        base0 + k_rows * k3 + np.arange(k1, dtype=np.int32)])
    con_rows = np.concatenate([
        np.full(k3, k_rows, np.int32), np.ones(k1, np.int32)])
    return EfcLayout(
        nefc=base0 + k3 * k_rows + k1, ne=ne, nf=nf,
        limit_jnt=limit_jnt, limit_base=limit_base,
        con_base=con_base, con_rows=con_rows, limit_ten=limit_ten)
  ncon = max(stat.pairs.ncon_max, 1)
  con_rows = np.zeros(ncon, np.int32)
  con_base = np.zeros(ncon, np.int32)
  row = limit_base + len(limit_jnt) + nlt  # limit_base already includes ne
  # static per-slot condim (priority/pair-aware, io.contact_slot_meta)
  dims = np.asarray(stat.con_dim[:ncon], np.int32)
  ell = stat.cone == 1
  for c in range(stat.pairs.ncon_max):
    con_base[c] = row
    con_rows[c] = (1 if dims[c] == 1
                   else (dims[c] if ell else 2 * (dims[c] - 1)))
    row += con_rows[c]
  return EfcLayout(nefc=row, ne=ne, nf=nf, limit_jnt=limit_jnt,
                   limit_base=limit_base, con_base=con_base,
                   con_rows=con_rows, limit_ten=limit_ten)


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """MuJoCo constraint impedance sigmoid d(r)."""
  dmin = jnp.clip(solimp[..., 0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  width = jnp.maximum(solimp[..., 2], _MINVAL)
  mid = jnp.clip(solimp[..., 3], _MINIMP, _MAXIMP)
  power = jnp.maximum(solimp[..., 4], 1.0)

  x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
  lo = jnp.power(x / jnp.maximum(mid, _MINVAL), power - 1.0) * x / jnp.maximum(mid, _MINVAL) * mid
  # y_lo = mid * (x/mid)^power ; y_hi = 1 - (1-mid) * ((1-x)/(1-mid))^power
  y_lo = mid * jnp.power(x / jnp.maximum(mid, _MINVAL), power)
  y_hi = 1.0 - (1.0 - mid) * jnp.power(
      (1.0 - x) / jnp.maximum(1.0 - mid, _MINVAL), power)
  y = jnp.where(x <= mid, y_lo, y_hi)
  y = jnp.where(power <= 1.0, x, y)
  del lo
  return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def _kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array,
         timestep: jax.Array, refsafe: bool):
  """Stiffness/damping-derived aref coefficients (b, k_eff) and impedance."""
  imp = _impedance(solimp, pos)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  timeconst = solref[..., 0]
  dampratio = solref[..., 1]
  if refsafe:
    timeconst = jnp.maximum(timeconst, 2.0 * timestep)
  b_std = 2.0 / (dmax * jnp.maximum(timeconst, _MINVAL))
  k_std = 1.0 / jnp.maximum(
      dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL)
  # direct mode: solref = (-stiffness, -damping)
  direct = (solref[..., 0] <= 0) | (solref[..., 1] <= 0)
  b = jnp.where(direct, -solref[..., 1] / dmax, b_std)
  k = jnp.where(direct, -solref[..., 0] / (dmax * dmax), k_std)
  return b, k, imp


def _body_point_jac(m: Model, d: Data, body: int, point, dtype):
  """(3, nv) translational jacobian of a world point on `body`."""
  s = m.stat
  anc = jnp.asarray(s.ancestor_mask[body], dtype)  # (nv,)
  croot = d.subtree_com[int(s.body_rootid[body])]
  cdof_ang = d.cdof[:, :3]
  cdof_lin = d.cdof[:, 3:]
  col = cdof_lin + jnp.cross(cdof_ang, point[None, :] - croot[None, :])
  return (col * anc[:, None]).T  # (3, nv)


def _eq_residuals(m: Model, qpos, dtype):
  """Concatenated equality residual vector (ner,) as a pure function of
  qpos (runs FK internally) — differentiated for the velocity and the
  J_dot*qvel acceleration-bias term of aref."""
  from mjlab_tpu.physics import kinematics as _kin
  from mjlab_tpu.physics import math as pmath
  from mjlab_tpu.physics.io import make_data
  s = m.stat
  dk = make_data(m, dtype=dtype).replace(qpos=qpos)
  dk = _kin.kinematics(m, dk)
  parts = []
  for e in range(s.neq):
    etype = int(s.eq_type[e])
    o1, o2 = int(s.eq_obj1[e]), int(s.eq_obj2[e])
    data = m.eq_data[e].astype(dtype)
    if etype == _EQ_JOINT:
      adr1 = int(s.jnt_qposadr[o1])
      y = qpos[adr1] - m.qpos0[adr1]
      x = (qpos[int(s.jnt_qposadr[o2])] - m.qpos0[int(s.jnt_qposadr[o2])]
           if o2 >= 0 else jnp.zeros((), dtype))
      poly = data[:5]
      parts.append((y - jnp.sum(poly * x ** jnp.arange(5, dtype=dtype)))[
          None])
    elif etype == _EQ_CONNECT:
      p1 = dk.xpos[o1] + dk.xmat[o1] @ data[0:3]
      p2 = dk.xpos[o2] + dk.xmat[o2] @ data[3:6]
      parts.append(p1 - p2)
    else:  # _EQ_WELD
      p1 = dk.xpos[o1] + dk.xmat[o1] @ data[3:6]
      p2 = dk.xpos[o2] + dk.xmat[o2] @ data[0:3]
      q2inv = pmath.neg_quat(dk.xquat[o2])
      res_r = data[10] * pmath.mul_quat(
          pmath.mul_quat(q2inv, dk.xquat[o1]), data[6:10])[1:4]
      parts.append(jnp.concatenate([p1 - p2, res_r]))
  return jnp.concatenate(parts)


def equality_block(m: Model, d: Data, ts, refsafe, dtype):
  """Bilateral equality rows (connect / weld / joint), MuJoCo semantics
  verified against mjData.efc_* (tests/test_equality.py):

  connect: residual = anchor1_w - anchor2_w, J = jacp1 - jacp2.
  weld:    position rows like connect on (x1 + R1 relpose_p) vs
           (x2 + R2 anchor); rotation rows r = ts * vec(q2^-1 q1 relq)
           with columns 0.5*ts*vec(q2^-1 [0, axis_v] q1 relq) signed by
           the ancestor delta.
  joint:   r = y - y0 - poly(x - x0); J = e_y - poly'(x - x0) e_x.

  aref includes MuJoCo's acceleration-level bias: aref = -b*(J qvel)
  - k*imp*pos - Jdot*qvel, with Jdot*qvel obtained as the second
  directional derivative of the residual along the position-integration
  path (matches mj_step to machine precision).

  Returns (e_J (ner, nv), e_D, e_aref, e_active, e_pos)."""
  from mjlab_tpu.physics import math as pmath
  from mjlab_tpu.physics.pipeline import _integrate_pos
  s = m.stat
  nv = s.nv
  rows_J, rows_D, rows_aref, rows_act, rows_pos = [], [], [], [], []
  disabled = bool(s.disableflags & DisableBit.EQUALITY)

  def path(sv):
    return _eq_residuals(m, _integrate_pos(m, d.qpos, d.qvel, sv), dtype)

  def path_vel(sv):
    return jax.jvp(path, (sv,), (jnp.ones((), dtype),))[1]

  jdot_qvel = jax.jvp(path_vel, (jnp.zeros((), dtype),),
                      (jnp.ones((), dtype),))[1]
  row0 = 0

  for e in range(s.neq):
    etype = int(s.eq_type[e])
    o1, o2 = int(s.eq_obj1[e]), int(s.eq_obj2[e])
    data = m.eq_data[e].astype(dtype)
    solref = m.eq_solref[e].astype(dtype)
    solimp = m.eq_solimp[e].astype(dtype)
    act = (m.eq_active0[e] > 0) & (not disabled)

    if etype == _EQ_JOINT:
      q0 = m.qpos0
      adr1 = int(s.jnt_qposadr[o1])
      dof1 = int(s.jnt_dofadr[o1])
      y = d.qpos[adr1] - q0[adr1]
      if o2 >= 0:
        adr2 = int(s.jnt_qposadr[o2])
        dof2 = int(s.jnt_dofadr[o2])
        x = d.qpos[adr2] - q0[adr2]
      else:
        x = jnp.zeros((), dtype)
      poly = data[:5]
      powers = x ** jnp.arange(5, dtype=dtype)
      res = y - jnp.sum(poly * powers)
      dpoly = jnp.sum(poly[1:] * jnp.arange(1, 5, dtype=dtype)
                      * x ** jnp.arange(4, dtype=dtype))
      J = jnp.zeros((1, nv), dtype).at[0, dof1].set(1.0)
      if o2 >= 0:
        J = J.at[0, dof2].add(-dpoly)
        diag = m.dof_invweight0[dof1] + m.dof_invweight0[dof2]
      else:
        diag = m.dof_invweight0[dof1]
      res = res[None]
      imp_pos = jnp.abs(res)
      diag = diag * jnp.ones(1, dtype)
    elif etype == _EQ_CONNECT:
      R1 = d.xmat[o1]
      R2 = d.xmat[o2]
      p1 = d.xpos[o1] + R1 @ data[0:3]
      p2 = d.xpos[o2] + R2 @ data[3:6]
      res = p1 - p2
      J = _body_point_jac(m, d, o1, p1, dtype) \
          - _body_point_jac(m, d, o2, p2, dtype)
      imp_pos = jnp.linalg.norm(res) * jnp.ones(3, dtype)
      diag = (m.body_invweight0[o1, 0] + m.body_invweight0[o2, 0]) \
          * jnp.ones(3, dtype)
    else:  # _EQ_WELD
      R1 = d.xmat[o1]
      R2 = d.xmat[o2]
      anchor = data[0:3]
      relp = data[3:6]
      relq = data[6:10]
      tq = data[10]
      p1 = d.xpos[o1] + R1 @ relp
      p2 = d.xpos[o2] + R2 @ anchor
      res_p = p1 - p2
      Jp = _body_point_jac(m, d, o1, p1, dtype) \
          - _body_point_jac(m, d, o2, p2, dtype)
      q1 = d.xquat[o1]
      q2 = d.xquat[o2]
      q2inv = pmath.neg_quat(q2)
      res_r = tq * pmath.mul_quat(pmath.mul_quat(q2inv, q1), relq)[1:4]
      # rotation jacobian columns: 0.5*tq*vec(q2^-1 [0,a_v] q1 relq)
      ancd = jnp.asarray(
          s.ancestor_mask[o1] - s.ancestor_mask[o2], dtype)  # (nv,)
      axes4 = jnp.concatenate(
          [jnp.zeros((nv, 1), dtype), d.cdof[:, :3]], axis=-1)  # (nv, 4)
      q1relq = pmath.mul_quat(q1, relq)
      tmp = jax.vmap(lambda a4: pmath.mul_quat(
          pmath.mul_quat(q2inv, a4), q1relq))(axes4)  # (nv, 4)
      Jr = (0.5 * tq) * tmp[:, 1:4].T * ancd[None, :]  # (3, nv)
      J = jnp.concatenate([Jp, Jr], axis=0)
      res = jnp.concatenate([res_p, res_r])
      imp_pos = jnp.linalg.norm(res) * jnp.ones(6, dtype)
      diag = jnp.concatenate([
          (m.body_invweight0[o1, 0] + m.body_invweight0[o2, 0])
          * jnp.ones(3, dtype),
          (m.body_invweight0[o1, 1] + m.body_invweight0[o2, 1])
          * jnp.ones(3, dtype)])

    nrow = J.shape[0]
    b_c, k_c, imp = _kbi(jnp.broadcast_to(solref, (nrow, 2)),
                         jnp.broadcast_to(solimp, (nrow, 5)),
                         imp_pos, ts, refsafe)
    vel = J @ d.qvel
    r = jnp.maximum((1.0 - imp) / imp * diag, _MINVAL)
    rows_J.append(J)
    rows_D.append(1.0 / r)
    # MuJoCo includes the Jdot*qvel acceleration bias for connect/weld
    # but NOT for joint couplings (verified empirically vs efc_aref)
    bias = (jdot_qvel[row0:row0 + nrow] if etype != _EQ_JOINT
            else jnp.zeros(nrow, dtype))
    rows_aref.append(-b_c * vel - k_c * imp * res - bias)
    rows_act.append(jnp.broadcast_to(act, (nrow,)))
    rows_pos.append(res)
    row0 += nrow

  return (jnp.concatenate(rows_J, axis=0),
          jnp.concatenate(rows_D),
          jnp.concatenate(rows_aref),
          jnp.concatenate(rows_act),
          jnp.concatenate(rows_pos))


def _elliptic_block(p, jt_f, jr_f, vel_t, vel_r, friction, solref, solimp,
                    invw, dim, impratio, ts, refsafe, DM, dtype):
  """Structured elliptic contact block (one entry per frictional contact).

  MuJoCo's elliptic-cone constraint model, extracted empirically from
  mj_constraintUpdate and verified to ~1e-13 (scratch/probe_elliptic*.py,
  tests/test_elliptic.py): regularized cone coefficient
  mu = friction[0]/sqrt(impratio); friction-row regularizer
  D_j = D_normal * impratio * (friction_j/friction_0)^2; friction-row
  aref = -b*vel_j (pos = 0); normal row as in the pyramidal case.

  Returns dict of:
    x_J    (NX, DM, nv) row jacobians [normal, t1, t2, torsional, r1, r2]
    x_D    (NX, DM) per-row D (0 beyond each contact's condim)
    x_aref (NX, DM)
    x_mu   (NX,) regularized cone coefficient
    x_fr   (NX, DM-1) raw friction coefficients (0 beyond condim)
    x_active (NX,), x_pos (NX,)
  """
  NX = p.shape[0]
  act = p < 0
  b_c, k_c, imp = _kbi(solref, solimp, p, ts, refsafe)
  r_n = jnp.maximum((1.0 - imp) / imp * invw, _MINVAL)
  D_n = 1.0 / r_n
  A = DM - 1
  fr = friction[:, :A]
  real_axis = jnp.arange(A)[None, :] < (dim[:, None] - 1)  # (NX, A)
  fr = jnp.where(real_axis, fr, 0.0)
  fr0 = jnp.maximum(friction[:, 0], _MINVAL)
  mu = fr0 / jnp.sqrt(impratio)
  D_f = jnp.where(real_axis,
                  D_n[:, None] * impratio * (fr / fr0[:, None]) ** 2, 0.0)
  axes = jnp.concatenate([jt_f[:, 1:3], jr_f], axis=1)[:, :A]  # (NX, A, nv)
  vels = jnp.concatenate([vel_t[:, 1:3], vel_r], axis=1)[:, :A]
  xJ = jnp.concatenate([jt_f[:, :1], axes], axis=1)  # (NX, DM, nv)
  aref_n = -b_c * vel_t[:, 0] - k_c * imp * p
  aref_f = jnp.where(real_axis, -b_c[:, None] * vels, 0.0)
  x_aref = jnp.concatenate([aref_n[:, None], aref_f], axis=1)
  x_D = jnp.concatenate([D_n[:, None], D_f], axis=1)
  x_D = jnp.where(act[:, None], x_D, 0.0)
  return dict(x_J=xJ, x_D=x_D, x_aref=x_aref, x_mu=mu, x_fr=fr,
              x_active=act, x_pos=p)


def _empty_elliptic(nv, dtype, dm=2):
  return dict(x_J=jnp.zeros((1, dm, nv), dtype),
              x_D=jnp.zeros((1, dm), dtype),
              x_aref=jnp.zeros((1, dm), dtype),
              x_mu=jnp.zeros(1, dtype),
              x_fr=jnp.zeros((1, dm - 1), dtype),
              x_active=jnp.zeros(1, bool),
              x_pos=jnp.zeros(1, dtype))


@functools.lru_cache(maxsize=32)
def elliptic_row_maps(stat: ModelStatic):
  """Static dense efc row addresses for the elliptic blocks:
  (x_rows (NX, DM) with invalid axes mapped to nefc for drop-scatter,
   c1_rows (NC1,) frictionless slot rows, x_slots, c1_slots)."""
  lay = efc_layout(stat)
  DM = elliptic_dmax(stat)
  if stat.ncon_cap or stat.ncon_cap1:
    K3, K1 = stat.ncon_cap, stat.ncon_cap1
    x_rows = (lay.con_base[:K3, None] + np.arange(DM)[None, :]
              if K3 else np.zeros((0, DM), np.int64))
    c1_rows = lay.con_base[K3:K3 + K1]
    slots3, slots1 = compaction_slot_pools(stat)
    return x_rows, c1_rows, slots3, slots1
  nc = stat.pairs.ncon_max
  dims = np.asarray(stat.con_dim[:nc])
  sl3 = np.nonzero(dims > 1)[0]
  sl1 = np.nonzero(dims == 1)[0]
  x_rows = lay.con_base[sl3][:, None] + np.arange(DM)[None, :]
  # axes beyond a slot's condim have no dense row: map to nefc (dropped)
  invalid = np.arange(DM)[None, :] >= dims[sl3][:, None]
  x_rows = np.where(invalid, lay.nefc, x_rows)
  return x_rows, lay.con_base[sl1], sl3, sl1


def compaction_slot_pools(stat: ModelStatic):
  """Static candidate-slot index lists for the two compaction pools:
  frictional (condim>1) and frictionless (condim==1)."""
  nc = stat.pairs.ncon_max
  dims = np.asarray(stat.con_dim[:nc])
  return (np.nonzero(dims > 1)[0].astype(np.int32),
          np.nonzero(dims == 1)[0].astype(np.int32))


@functools.lru_cache(maxsize=32)
def _slot_static(stat: ModelStatic):
  """Static per-candidate-slot arrays: ancestor-mask delta (nc, nv), the
  subtree-com row index of each geom's kinematic root, and dims."""
  nc = max(stat.pairs.ncon_max, 1)
  b1 = stat.geom_bodyid[np.asarray(stat.con_geom1[:nc])]
  b2 = stat.geom_bodyid[np.asarray(stat.con_geom2[:nc])]
  anc = np.asarray(stat.ancestor_mask)
  return (anc[b2] - anc[b1],  # (nc, nv) signed ancestor delta
          stat.body_rootid[b1].astype(np.int32),
          stat.body_rootid[b2].astype(np.int32),
          b1.astype(np.int32), b2.astype(np.int32))


@functools.lru_cache(maxsize=32)
def _pool_static(stat: ModelStatic, slots_key: tuple):
  """Constant per-pool matrices for selection-by-matmul: the signed
  ancestor-delta (nc_pool, nv), a one-hot root-body map (nc_pool, nbody)
  per side, and the pair inverse weight when invweight is unbatched."""
  slots = np.asarray(slots_key, np.int32)
  anc_delta, root1, root2, b1, b2 = _slot_static(stat)
  nbody = np.asarray(stat.body_rootid).shape[0]
  r1 = np.zeros((len(slots), nbody), np.float32)
  r2 = np.zeros((len(slots), nbody), np.float32)
  r1[np.arange(len(slots)), root1[slots]] = 1.0
  r2[np.arange(len(slots)), root2[slots]] = 1.0
  return (anc_delta[slots], r1, r2, b1[slots], b2[slots])


def _selected_contact_data(m: Model, d: Data, slots: np.ndarray, K: int,
                           dtype):
  """Top-K selection within a static slot pool. Per-slot data reaches the
  selected set through matmuls — TPU gathers at dynamic indices lower to
  slow scatter loops, while (K, nc_pool) x (nc_pool, D) GEMMs run on the
  MXU. Static per-slot operands (ancestor delta, root maps) are CONSTANT
  matrices, so XLA folds their selection into single large GEMMs."""
  s = m.stat
  con = d.contact
  anc_delta, r1map, r2map, b1, b2 = _pool_static(s, tuple(int(x) for x in slots))
  sl = jnp.asarray(slots)
  p_pool = (con.dist - con.includemargin)[sl]
  _, sel = jax.lax.top_k(-p_pool, K)
  onehot = jax.nn.one_hot(sel, len(slots), dtype=dtype)  # (K, nc_pool)

  # dynamic per-slot fields: one narrow batched select
  packed = jnp.concatenate([
      p_pool[:, None], con.pos[sl], con.frame[sl].reshape(-1, 9),
      con.friction[sl], con.solref[sl], con.solimp[sl],
  ], axis=-1)  # (nc_pool, 25)
  out = onehot @ packed
  p = out[:, 0]
  pos_w = out[:, 1:4]
  frame = out[:, 4:13].reshape(K, 3, 3)
  friction = out[:, 13:18]
  solref = out[:, 18:20]
  solimp = out[:, 20:25]

  # static-operand selections: constant B folds to (K, X) @ const
  ancd = onehot @ jnp.asarray(anc_delta, dtype)          # (K, nv)
  sel_r1 = onehot @ jnp.asarray(r1map, dtype)            # (K, nbody)
  sel_r2 = onehot @ jnp.asarray(r2map, dtype)
  croot1 = sel_r1 @ d.subtree_com
  croot2 = sel_r2 @ d.subtree_com
  invw_all = (m.body_invweight0[jnp.asarray(b1), 0]
              + m.body_invweight0[jnp.asarray(b2), 0])   # (nc_pool,)
  invw = onehot @ invw_all
  dim = jnp.asarray(s.con_dim)[sl][sel]  # small int gather
  return p, pos_w, frame, friction, solref, solimp, croot1, croot2, \
      invw, ancd, dim


def _pool_jacobians(d: Data, pos_w, frame, croot1, croot2, ancd,
                    with_axes: bool):
  """Contact-frame jacobian rows from pre-selected slot data.

  Uses the identity J_point(p) = ancΔ ⊙ (cdof_lin + ω x (p - c)), with
  the two-body difference folded into the signed ancestor delta; the
  root-com terms c differ per side, handled by the correction term."""
  cdof_ang = d.cdof[:, :3]  # (nv, 3)
  cdof_lin = d.cdof[:, 3:]

  # two-sided point jacobian: ancΔ ⊙ (lin + ω x (p - c2*on2 - c1*on1))…
  # sides share p, so jt = anc2⊙(lin+ωx(p-c2)) - anc1⊙(lin+ωx(p-c1)).
  # With ancΔ = anc2 - anc1 this is ancΔ⊙(lin+ωxp) - anc2⊙(ωxc2)
  # + anc1⊙(ωxc1). The c-terms need per-side masks; keep the direct
  # two-sided form via the midpoint trick: both sides' ancestor sets are
  # disjoint outside the common ancestors, where the difference cancels
  # exactly; using the per-slot croots with the signed delta is exact
  # because a dof is an ancestor of at most one side OR both with equal
  # croot (same kinematic root).
  rel1 = pos_w[:, None, :] - croot1[:, None, :]
  rel2 = pos_w[:, None, :] - croot2[:, None, :]
  # dofs on side 2 (ancd=+1) use rel2; side 1 (ancd=-1) use rel1; shared
  # ancestors cancel in the difference so either rel works there.
  use2 = (ancd > 0)[:, :, None]
  rel = jnp.where(use2, rel2, rel1)
  col = cdof_lin[None] + jnp.cross(cdof_ang[None], rel)
  jt = col * ancd[:, :, None]
  if not with_axes:
    n_row = jnp.einsum('cx,cvx->cv', frame[:, 0], jt)
    return n_row, None, n_row @ d.qvel, None
  jr = cdof_ang[None] * ancd[:, :, None]
  jt_f = jnp.einsum('cfx,cvx->cfv', frame, jt)  # (K, 3, nv)
  jr_f = jnp.einsum('cfx,cvx->cfv', frame, jr)
  vel_t = jt_f @ d.qvel
  vel_r = jr_f @ d.qvel
  return jt_f, jr_f, vel_t, vel_r


def _contacts_compacted(m: Model, d: Data, ts, refsafe, dtype):
  """Contact constraint block from the DEEPEST candidate slots, selected
  per pool (runtime top-K over penetration — the TPU analog of mjwarp's
  dynamic contact pool, reference sim.py:87-88 nconmax). Frictional
  slots (condim>1) build a uniform pyramidal block of 2*(maxdim-1) rows
  (narrower true condim masks its extra axes); frictionless slots build
  one one-sided normal row each. Splitting the pools keeps the dense row
  count — which drives both solver FLOPs and the Pallas kernel's VMEM
  footprint — near the physical minimum."""
  s = m.stat
  lay = efc_layout(s)
  K3, K1 = s.ncon_cap, s.ncon_cap1
  A = max(int(s.con_dim.max()) - 1, 1)
  slots3, slots1 = compaction_slot_pools(s)
  impratio = m.opt.impratio.astype(dtype)
  ell_dm = elliptic_dmax(s)
  x_block = None

  blocks = []

  if K3 and ell_dm:
    (p, pos_w, frame, friction, solref, solimp, croot1, croot2, invw,
     ancd, dim) = _selected_contact_data(m, d, slots3, K3, dtype)
    jt_f, jr_f, vel_t, vel_r = _pool_jacobians(
        d, pos_w, frame, croot1, croot2, ancd, True)
    x_block = _elliptic_block(
        p, jt_f, jr_f, vel_t, vel_r, friction, solref, solimp, invw, dim,
        impratio, ts, refsafe, ell_dm, dtype)
  elif K3:
    (p, pos_w, frame, friction, solref, solimp, croot1, croot2, invw,
     ancd, dim) = _selected_contact_data(m, d, slots3, K3, dtype)
    act = p < 0
    jt_f, jr_f, vel_t, vel_r = _pool_jacobians(
        d, pos_w, frame, croot1, croot2, ancd, True)
    jn, vn = jt_f[:, 0], vel_t[:, 0]
    axes = jnp.concatenate([jt_f[:, 1:3], jr_f], axis=1)[:, :A]
    vels = jnp.concatenate([vel_t[:, 1:3], vel_r], axis=1)[:, :A]
    b_c, k_c, imp = _kbi(solref, solimp, p, ts, refsafe)

    mu = friction[:, :A]
    real_axis = jnp.arange(A)[None, :] < (dim[:, None] - 1)  # (K3, A)
    mu = jnp.where(real_axis, mu, 0.0)
    row_active = real_axis & act[:, None]
    # diagApprox uses the FIRST friction coefficient for every pyramid
    # row (incl. torsional/rolling) — oracle-verified vs mj_forward
    mu0 = friction[:, 0:1]
    dA = jnp.broadcast_to(
        invw[:, None] * (1.0 + mu0 * mu0) * 2.0 * mu0 * mu0 / impratio,
        mu.shape)
    r = jnp.maximum((1.0 - imp[:, None]) / imp[:, None] * dA, _MINVAL)
    D_axis = 1.0 / r

    signs = jnp.asarray([1.0, -1.0], dtype)
    Jrows = (jn[:, None, None, :]
             + signs[None, None, :, None]
             * (mu[..., None] * axes)[:, :, None, :])
    vrows = (vn[:, None, None] + signs[None, None, :] * (mu * vels)[:, :, None])
    aref_rows = (-b_c[:, None, None] * vrows - (k_c * imp * p)[:, None, None])
    n_rows = K3 * A * 2
    blocks.append((
        Jrows.reshape(n_rows, s.nv),
        jnp.broadcast_to(D_axis[:, :, None], (K3, A, 2)).reshape(n_rows),
        aref_rows.reshape(n_rows),
        jnp.broadcast_to(row_active[:, :, None], (K3, A, 2)).reshape(n_rows),
        jnp.broadcast_to(p[:, None, None], (K3, A, 2)).reshape(n_rows)))

  if K1:
    (p, pos_w, frame, friction, solref, solimp, croot1, croot2, invw,
     ancd, dim) = _selected_contact_data(m, d, slots1, K1, dtype)
    act = p < 0
    jn, _, vn, _ = _pool_jacobians(
        d, pos_w, frame, croot1, croot2, ancd, False)
    b_c, k_c, imp = _kbi(solref, solimp, p, ts, refsafe)
    r = jnp.maximum((1.0 - imp) / imp * invw, _MINVAL)
    blocks.append((jn, 1.0 / r, -b_c * vn - k_c * imp * p, act, p))

  if not blocks:
    nv = s.nv
    blocks = [(jnp.zeros((1, nv), dtype), jnp.zeros(1, dtype),
               jnp.zeros(1, dtype), jnp.zeros(1, bool),
               jnp.zeros(1, dtype))]
  c_J = jnp.concatenate([b[0] for b in blocks], axis=0)
  c_D = jnp.concatenate([b[1] for b in blocks])
  c_aref = jnp.concatenate([b[2] for b in blocks])
  c_active = jnp.concatenate([b[3] for b in blocks])
  c_pos = jnp.concatenate([b[4] for b in blocks])
  if x_block is None:
    assert c_J.shape[0] == lay.ncr, (c_J.shape, lay.ncr)
  return c_J, c_D, c_aref, c_active, c_pos, x_block


def make_efc(m: Model, d: Data):
  """Assemble constraint blocks, exploiting row structure: dof-friction
  rows have J = I and joint-limit rows are one-hot (+-1 at one dof), so
  only CONTACT rows carry a dense Jacobian. The solver consumes the
  blocks directly — Hessian contributions of friction/limit rows are
  diagonal — which roughly halves the dense constraint work vs a flat
  (nefc, nv) Jacobian (nefc ~ 2x contact rows for the humanoid tasks).

  Returns a dict:
    f_D, f_aref, f_floss, f_active           (nv,)   friction (Huber)
    l_sign, l_D, l_aref, l_active, l_pos     (nl,)   limits (one-sided)
    c_J (ncr, nv), c_D, c_aref, c_active, c_pos      contacts (one-sided)
  Row order for dense views (efc_force layout): friction, limits,
  contacts — identical to MuJoCo-style [friction | limit | contact].
  """
  s = m.stat
  lay = efc_layout(s)
  dtype = d.qpos.dtype
  nv = s.nv
  nl = lay.nl
  ncr = lay.ncr
  ts = m.opt.timestep.astype(dtype)
  refsafe = not (s.disableflags & DisableBit.REFSAFE)

  # ---- dof friction rows ----
  if not (s.disableflags & DisableBit.FRICTIONLOSS):
    b, k, imp = _kbi(m.dof_solref, m.dof_solimp, jnp.zeros(nv, dtype), ts,
                     refsafe)
    r = jnp.maximum((1.0 - imp) / imp * m.dof_invweight0, _MINVAL)
    f_D = 1.0 / r
    f_aref = -b * d.qvel
    f_floss = m.dof_frictionloss
    f_active = m.dof_frictionloss > 0
  else:
    f_D = jnp.zeros(nv, dtype)
    f_aref = jnp.zeros(nv, dtype)
    f_floss = jnp.zeros(nv, dtype)
    f_active = jnp.zeros(nv, bool)

  # ---- joint limit rows ----
  if nl and not (s.disableflags & DisableBit.LIMIT):
    jids = lay.limit_jnt
    qadr = s.jnt_qposadr[jids]
    dadr = s.jnt_dofadr[jids]
    q = d.qpos[qadr]
    lo, hi = m.jnt_range[jids, 0], m.jnt_range[jids, 1]
    dist_lo = q - lo
    dist_hi = hi - q
    use_lo = dist_lo <= dist_hi
    dist = jnp.where(use_lo, dist_lo, dist_hi)
    l_sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
    margin = m.jnt_margin[jids]
    p = dist - margin
    b, k, imp = _kbi(m.jnt_solref[jids], m.jnt_solimp[jids], p, ts, refsafe)
    vel = l_sign * d.qvel[dadr]
    r = jnp.maximum((1.0 - imp) / imp * m.dof_invweight0[dadr], _MINVAL)
    l_D = 1.0 / r
    l_aref = -b * vel - k * imp * p
    l_active = p < 0
    l_pos = p
  else:
    l_sign = jnp.zeros(max(nl, 1), dtype)
    l_D = jnp.zeros(max(nl, 1), dtype)
    l_aref = jnp.zeros(max(nl, 1), dtype)
    l_active = jnp.zeros(max(nl, 1), bool)
    l_pos = jnp.zeros(max(nl, 1), dtype)

  # ---- tendon limit rows (dense J = sign * ten_J) ----
  if lay.nlt and not (s.disableflags & DisableBit.LIMIT):
    tl = lay.limit_ten
    L = d.ten_length[tl]
    lo, hi = m.tendon_range[tl, 0], m.tendon_range[tl, 1]
    dist_lo = L - lo
    dist_hi = hi - L
    use_lo = dist_lo <= dist_hi
    dist = jnp.where(use_lo, dist_lo, dist_hi)
    sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
    p = dist - m.tendon_margin[tl]
    b, k, imp = _kbi(m.tendon_solref_lim[tl], m.tendon_solimp_lim[tl], p,
                     ts, refsafe)
    vel = sign * d.ten_velocity[tl]
    r = jnp.maximum((1.0 - imp) / imp * m.tendon_invweight0[tl], _MINVAL)
    t_J = sign[:, None] * d.ten_J[tl]
    t_D = 1.0 / r
    t_aref = -b * vel - k * imp * p
    t_active = p < 0
    t_pos = p
  else:
    t_J = jnp.zeros((max(lay.nlt, 1), nv), dtype)
    t_D = jnp.zeros(max(lay.nlt, 1), dtype)
    t_aref = jnp.zeros(max(lay.nlt, 1), dtype)
    t_active = jnp.zeros(max(lay.nlt, 1), bool)
    t_pos = jnp.zeros(max(lay.nlt, 1), dtype)

  # ---- contact rows, dense block (pyramidal) or elliptic x block ----
  ell_dm = elliptic_dmax(s)
  x_block = None
  nce = max(ncr, 1)
  c_J = jnp.zeros((nce, nv), dtype)
  c_D = jnp.zeros(nce, dtype)
  c_aref = jnp.zeros(nce, dtype)
  c_active = jnp.zeros(nce, bool)
  c_pos = jnp.zeros(nce, dtype)
  con_row0 = lay.nf + nl  # global row index of first contact row
  if (s.ncon_cap or s.ncon_cap1) and not (
      s.disableflags & DisableBit.CONTACT):
    c_J, c_D, c_aref, c_active, c_pos, x_block = _contacts_compacted(
        m, d, ts, refsafe, dtype)
  elif s.pairs.ncon_max and not (s.disableflags & DisableBit.CONTACT):
    con = d.contact
    ncon = s.pairs.ncon_max
    anc = jnp.asarray(s.ancestor_mask, dtype)
    b1 = s.geom_bodyid[s.con_geom1]
    b2 = s.geom_bodyid[s.con_geom2]
    croot1 = d.subtree_com[s.body_rootid[b1]]  # (ncon, 3)
    croot2 = d.subtree_com[s.body_rootid[b2]]
    cdof_ang = d.cdof[:, :3]  # (nv, 3)
    cdof_lin = d.cdof[:, 3:]

    # translational jacobian at contact point, world frame: (ncon, 3, nv)
    def point_jac(p, croot, body):
      # (ncon, nv, 3): lin + ang x (p - croot)
      rel = p[:, None, :] - croot[:, None, :]  # (ncon, 1, 3)
      col = cdof_lin[None] + jnp.cross(cdof_ang[None], rel)
      return col * anc[body][:, :, None]  # mask

    jt = point_jac(con.pos, croot2, b2) - point_jac(con.pos, croot1, b1)
    jr = (cdof_ang[None] * anc[b2][:, :, None]
          - cdof_ang[None] * anc[b1][:, :, None])
    # project into contact frame: frame rows (ncon, 3, 3)
    jt_f = jnp.einsum('cfx,cvx->cfv', con.frame, jt)  # (ncon, 3, nv)
    jr_f = jnp.einsum('cfx,cvx->cfv', con.frame, jr)

    p = con.dist - con.includemargin
    act = p < 0
    b, k, imp = _kbi(con.solref, con.solimp, p, ts, refsafe)
    invw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]

    qvel = d.qvel
    vel_t = jt_f @ qvel  # (ncon, 3)
    vel_r = jr_f @ qvel

    if ell_dm:
      sl3 = np.nonzero(s.con_dim[:ncon] > 1)[0]
      sl1 = np.nonzero(s.con_dim[:ncon] == 1)[0]
      x_block = _elliptic_block(
          p[sl3], jt_f[sl3], jr_f[sl3], vel_t[sl3], vel_r[sl3],
          con.friction[sl3], con.solref[sl3], con.solimp[sl3], invw[sl3],
          jnp.asarray(s.con_dim)[sl3], m.opt.impratio.astype(dtype),
          ts, refsafe, ell_dm, dtype)
      if len(sl1):
        r1 = jnp.maximum((1.0 - imp[sl1]) / imp[sl1] * invw[sl1], _MINVAL)
        c_J = jt_f[sl1, 0]
        c_D = 1.0 / r1
        c_aref = -b[sl1] * vel_t[sl1, 0] - k[sl1] * imp[sl1] * p[sl1]
        c_active = act[sl1]
        c_pos = p[sl1]
      else:
        c_J = jnp.zeros((1, nv), dtype)
        c_D = jnp.zeros(1, dtype)
        c_aref = jnp.zeros(1, dtype)
        c_active = jnp.zeros(1, bool)
        c_pos = jnp.zeros(1, dtype)

    # vectorize per condim group (slots of equal condim share row structure)
    for dim in sorted(set(int(x) for x in s.con_dim[:ncon])) \
        if not ell_dm else []:
      sl = np.nonzero(s.con_dim[:ncon] == dim)[0]
      if len(sl) == 0:
        continue
      nsl = len(sl)
      if dim == 1:
        rows = lay.con_base[sl] - con_row0
        r = jnp.maximum((1.0 - imp[sl]) / imp[sl] * invw[sl], _MINVAL)
        c_J = c_J.at[rows].set(jt_f[sl, 0])
        c_pos = c_pos.at[rows].set(p[sl])
        c_D = c_D.at[rows].set(1.0 / r)
        c_aref = c_aref.at[rows].set(
            -b[sl] * vel_t[sl, 0] - k[sl] * imp[sl] * p[sl])
        c_active = c_active.at[rows].set(act[sl])
        continue
      # pyramidal rows: for friction dim i, rows (Jn + mu_i T_i, Jn - mu_i T_i)
      k_rows = 2 * (dim - 1)
      rows = (lay.con_base[sl][:, None] - con_row0
              + np.arange(k_rows)[None, :]).ravel()
      axes = jnp.concatenate(
          [jt_f[sl, 1:min(dim, 3)], jr_f[sl, :max(dim - 3, 0)]], 1)  # (nsl, dim-1, nv)
      vels = jnp.concatenate(
          [vel_t[sl, 1:min(dim, 3)], vel_r[sl, :max(dim - 3, 0)]], 1)
      mu = con.friction[sl, :dim - 1]  # (nsl, dim-1)
      signs = jnp.asarray([1.0, -1.0], dtype)
      Jrows = (jt_f[sl, 0][:, None, None, :]
               + signs[None, None, :, None] * (mu[..., None] * axes)[:, :, None, :])
      vrows = (vel_t[sl, 0][:, None, None]
               + signs[None, None, :] * (mu * vels)[:, :, None])
      # diagApprox uses the FIRST friction coefficient for every pyramid
      # row (incl. torsional/rolling) — oracle-verified vs mj_forward
      mu0 = con.friction[sl, 0:1]
      dA = jnp.broadcast_to(
          invw[sl][:, None] * (1.0 + mu0 * mu0) * 2.0 * mu0 * mu0
          / m.opt.impratio.astype(dtype), mu.shape)  # (nsl, dim-1)
      r = jnp.maximum((1.0 - imp[sl][:, None]) / imp[sl][:, None] * dA, _MINVAL)
      D_rows = jnp.repeat((1.0 / r)[:, :, None], 2, axis=2).reshape(nsl * k_rows)
      aref_rows = (-b[sl][:, None, None] * vrows
                   - (k[sl] * imp[sl] * p[sl])[:, None, None]).reshape(nsl * k_rows)
      c_J = c_J.at[rows].set(Jrows.reshape(nsl * k_rows, nv))
      c_pos = c_pos.at[rows].set(jnp.repeat(p[sl], k_rows))
      c_D = c_D.at[rows].set(D_rows)
      c_aref = c_aref.at[rows].set(aref_rows)
      c_active = c_active.at[rows].set(jnp.repeat(act[sl], k_rows))

  # ---- equality rows (bilateral), MuJoCo order: ahead of everything ----
  if lay.ne:
    e_J, e_D, e_aref, e_active, e_pos = equality_block(
        m, d, ts, refsafe, dtype)
  else:
    e_J = jnp.zeros((1, nv), dtype)
    e_D = jnp.zeros(1, dtype)
    e_aref = jnp.zeros(1, dtype)
    e_active = jnp.zeros(1, bool)
    e_pos = jnp.zeros(1, dtype)

  if x_block is None and ell_dm:
    x_block = _empty_elliptic(nv, dtype, ell_dm)

  if s.disableflags & DisableBit.CONSTRAINT:
    f_active = jnp.zeros_like(f_active)
    l_active = jnp.zeros_like(l_active)
    c_active = jnp.zeros_like(c_active)
    e_active = jnp.zeros_like(e_active)
    t_active = jnp.zeros_like(t_active)
    if x_block is not None:
      x_block['x_active'] = jnp.zeros_like(x_block['x_active'])

  f_D = jnp.where(f_active, f_D, 0.0)
  l_D = jnp.where(l_active, l_D, 0.0)
  c_D = jnp.where(c_active, c_D, 0.0)
  e_D = jnp.where(e_active, e_D, 0.0)
  t_D = jnp.where(t_active, t_D, 0.0)
  out = dict(
      f_D=f_D, f_aref=f_aref, f_floss=f_floss, f_active=f_active,
      l_sign=l_sign, l_D=l_D, l_aref=l_aref, l_active=l_active, l_pos=l_pos,
      c_J=c_J, c_D=c_D, c_aref=c_aref, c_active=c_active, c_pos=c_pos,
      e_J=e_J, e_D=e_D, e_aref=e_aref, e_active=e_active, e_pos=e_pos)
  if lay.nlt:
    out.update(t_J=t_J, t_D=t_D, t_aref=t_aref, t_active=t_active,
               t_pos=t_pos)
  if x_block is not None:
    x_block['x_D'] = jnp.where(x_block['x_active'][:, None],
                               x_block['x_D'], 0.0)
    out.update(x_block)
  return out


def limit_dofadr(stat: ModelStatic) -> np.ndarray:
  """Static dof address of each limit row (at least length 1)."""
  lay = efc_layout(stat)
  if lay.nl == 0:
    return np.zeros(1, np.int32)
  return stat.jnt_dofadr[lay.limit_jnt].astype(np.int32)


def densify_efc(stat: ModelStatic, efc: dict) -> dict:
  """Flat (nefc, ...) views in MuJoCo row order
  [equality | friction | limit | contact] — for tests/debugging parity
  with mjData.efc_* arrays."""
  lay = efc_layout(stat)
  ne, nv, nl, nlt, ncr = lay.ne, lay.nf, lay.nl, lay.nlt, lay.ncr
  ldof = limit_dofadr(stat)
  dtype = efc['c_J'].dtype
  J = jnp.zeros((lay.nefc, nv), dtype)
  if ne:
    J = J.at[:ne].set(efc['e_J'][:ne])
  J = J.at[ne + jnp.arange(nv), jnp.arange(nv)].set(1.0)
  if nl:
    J = J.at[ne + nv + jnp.arange(nl), ldof].set(efc['l_sign'])
  if nlt:
    J = J.at[ne + nv + nl + jnp.arange(nlt)].set(efc['t_J'][:nlt])

  elliptic = 'x_J' in efc
  if ncr and not elliptic:
    J = J.at[ne + nv + nl + nlt:].set(efc['c_J'][:ncr])

  def cat(e, f, l, c, t=None):
    parts = []
    if ne:
      parts.append(e[:ne])
    parts.append(f)
    parts.append(l[:nl])
    if nlt:
      parts.append(t[:nlt] if t is not None
                   else jnp.zeros(nlt, dtype))
    if ncr:
      parts.append(c[:ncr] if not elliptic
                   else jnp.zeros(ncr, c.dtype if hasattr(c, 'dtype')
                                  else dtype))
    return jnp.concatenate(parts, axis=0)

  z = jnp.zeros(max(nl, 1), dtype)
  ez = jnp.zeros_like(efc['e_D'])
  tget = lambda k: efc.get(k) if nlt else None
  tb = (jnp.ones(max(nlt, 1), bool) if nlt else None)
  out = dict(
      J=J,
      D=cat(efc['e_D'], efc['f_D'], efc['l_D'], efc['c_D'], tget('t_D')),
      aref=cat(efc['e_aref'], efc['f_aref'], efc['l_aref'], efc['c_aref'],
               tget('t_aref')),
      frictionloss=cat(ez, efc['f_floss'], z, jnp.zeros_like(efc['c_D'])),
      active=cat(efc['e_active'], efc['f_active'], efc['l_active'],
                 efc['c_active'], tget('t_active')),
      oneside=cat(jnp.zeros_like(efc['e_active']), jnp.zeros(nv, bool),
                  jnp.ones(max(nl, 1), bool), jnp.ones_like(efc['c_active']),
                  tb),
      pos=cat(efc['e_pos'], jnp.zeros(nv, dtype), efc['l_pos'],
              efc['c_pos'], tget('t_pos')))
  if elliptic and ncr:
    # scatter frictionless (c block) and elliptic (x block) rows into the
    # dense slot-ordered layout; invalid x axes map to row nefc (dropped)
    x_rows, c1_rows, _, _ = elliptic_row_maps(stat)
    if efc['x_D'].shape[0] != x_rows.shape[0]:
      # empty placeholder block (contacts disabled): nothing to scatter
      x_rows = np.zeros((0, efc['x_D'].shape[1]), np.int64)
    xr = jnp.asarray(x_rows)
    c1r = jnp.asarray(c1_rows)

    def scat(dense, cvals, xvals):
      if len(c1_rows):
        dense = dense.at[c1r].set(cvals[:len(c1_rows)], mode='drop')
      if x_rows.shape[0]:
        dense = dense.at[xr.ravel()].set(
            xvals.reshape(xr.size, *xvals.shape[2:]), mode='drop')
      return dense

    out['J'] = scat(out['J'], efc['c_J'], efc['x_J'])
    out['D'] = scat(out['D'], efc['c_D'], efc['x_D'])
    out['aref'] = scat(out['aref'], efc['c_aref'], efc['x_aref'])
    nx, dm = efc['x_D'].shape
    out['active'] = scat(out['active'], efc['c_active'],
                         jnp.broadcast_to(efc['x_active'][:, None],
                                          (nx, dm)))
    out['pos'] = scat(out['pos'], efc['c_pos'],
                      jnp.broadcast_to(efc['x_pos'][:, None], (nx, dm)))
    out['oneside'] = scat(out['oneside'], jnp.ones_like(efc['c_active']),
                          jnp.broadcast_to(efc['x_active'][:, None],
                                           (nx, dm)))
  return out
