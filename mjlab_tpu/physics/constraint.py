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


@dataclasses.dataclass(frozen=True)
class EfcLayout:
  nefc: int
  # friction rows: one per dof, rows [0, nv)
  nf: int
  # limit rows
  limit_jnt: np.ndarray  # joint ids with limits (hinge/slide)
  limit_base: int
  # contact rows
  con_base: np.ndarray  # (ncon,) first row of each contact slot
  con_rows: np.ndarray  # (ncon,) number of rows of each slot


@functools.lru_cache(maxsize=32)
def efc_layout(stat: ModelStatic) -> EfcLayout:
  nf = stat.nv
  limit_jnt = np.nonzero(
      stat.jnt_limited &
      np.isin(stat.jnt_type, (int(JointType.HINGE), int(JointType.SLIDE))))[0]
  limit_base = nf
  ncon = max(stat.pairs.ncon_max, 1)
  # recover static per-slot condim (same logic as io.make_data)
  con_rows = np.zeros(ncon, np.int32)
  con_base = np.zeros(ncon, np.int32)
  row = limit_base + len(limit_jnt)
  dims = np.ones(ncon, np.int32)
  for _, (g1s, g2s, base, npts) in stat.pairs.groups.items():
    for i, (g1, g2) in enumerate(zip(g1s, g2s)):
      p1, p2 = stat.geom_priority[g1], stat.geom_priority[g2]
      if p1 != p2:
        condim = stat.geom_condim[g1] if p1 > p2 else stat.geom_condim[g2]
      else:
        condim = max(stat.geom_condim[g1], stat.geom_condim[g2])
      sl = slice(base + i * npts, base + (i + 1) * npts)
      dims[sl] = condim
  for c in range(stat.pairs.ncon_max):
    con_base[c] = row
    con_rows[c] = 1 if dims[c] == 1 else 2 * (dims[c] - 1)
    row += con_rows[c]
  return EfcLayout(nefc=row, nf=nf, limit_jnt=limit_jnt,
                   limit_base=limit_base, con_base=con_base,
                   con_rows=con_rows)


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


def make_efc(m: Model, d: Data):
  """Assemble dense efc arrays. Returns a dict of (nefc, ...) arrays."""
  s = m.stat
  lay = efc_layout(s)
  dtype = d.qpos.dtype
  nefc, nv = lay.nefc, s.nv
  ts = m.opt.timestep.astype(dtype)
  refsafe = not (s.disableflags & DisableBit.REFSAFE)

  J = jnp.zeros((nefc, nv), dtype)
  pos = jnp.zeros(nefc, dtype)
  D = jnp.zeros(nefc, dtype)
  aref = jnp.zeros(nefc, dtype)
  floss = jnp.zeros(nefc, dtype)
  active = jnp.zeros(nefc, dtype=bool)
  # row class: 0 = friction (Huber), 1 = one-sided inequality
  oneside = jnp.zeros(nefc, dtype=bool)

  # ---- dof friction rows ----
  if not (s.disableflags & DisableBit.FRICTIONLOSS):
    b, k, imp = _kbi(m.dof_solref, m.dof_solimp, jnp.zeros(nv, dtype), ts,
                     refsafe)
    vel = d.qvel
    r = jnp.maximum((1.0 - imp) / imp * m.dof_invweight0, _MINVAL)
    J = J.at[jnp.arange(nv), jnp.arange(nv)].set(1.0)
    D = D.at[:nv].set(1.0 / r)
    aref = aref.at[:nv].set(-b * vel)
    floss = floss.at[:nv].set(m.dof_frictionloss)
    active = active.at[:nv].set(m.dof_frictionloss > 0)

  # ---- joint limit rows ----
  if len(lay.limit_jnt) and not (s.disableflags & DisableBit.LIMIT):
    jids = lay.limit_jnt
    qadr = s.jnt_qposadr[jids]
    dadr = s.jnt_dofadr[jids]
    rows = lay.limit_base + np.arange(len(jids))
    q = d.qpos[qadr]
    lo, hi = m.jnt_range[jids, 0], m.jnt_range[jids, 1]
    dist_lo = q - lo
    dist_hi = hi - q
    use_lo = dist_lo <= dist_hi
    dist = jnp.where(use_lo, dist_lo, dist_hi)
    sign = jnp.where(use_lo, 1.0, -1.0)
    margin = m.jnt_margin[jids]
    p = dist - margin
    act = p < 0
    b, k, imp = _kbi(m.jnt_solref[jids], m.jnt_solimp[jids], p, ts, refsafe)
    vel = sign * d.qvel[dadr]
    r = jnp.maximum((1.0 - imp) / imp * m.dof_invweight0[dadr], _MINVAL)
    J = J.at[rows, dadr].set(sign)
    pos = pos.at[rows].set(p)
    D = D.at[rows].set(1.0 / r)
    aref = aref.at[rows].set(-b * vel - k * imp * p)
    active = active.at[rows].set(act)
    oneside = oneside.at[rows].set(True)

  # ---- contact rows (pyramidal) ----
  if s.pairs.ncon_max and not (s.disableflags & DisableBit.CONTACT):
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

    # vectorize per condim group (slots of equal condim share row structure)
    for dim in sorted(set(int(x) for x in s.con_dim[:ncon])):
      sl = np.nonzero(s.con_dim[:ncon] == dim)[0]
      if len(sl) == 0:
        continue
      nsl = len(sl)
      if dim == 1:
        rows = lay.con_base[sl]
        r = jnp.maximum((1.0 - imp[sl]) / imp[sl] * invw[sl], _MINVAL)
        J = J.at[rows].set(jt_f[sl, 0])
        pos = pos.at[rows].set(p[sl])
        D = D.at[rows].set(1.0 / r)
        aref = aref.at[rows].set(-b[sl] * vel_t[sl, 0] - k[sl] * imp[sl] * p[sl])
        active = active.at[rows].set(act[sl])
        oneside = oneside.at[rows].set(True)
        continue
      # pyramidal rows: for friction dim i, rows (Jn + mu_i T_i, Jn - mu_i T_i)
      k_rows = 2 * (dim - 1)
      rows = (lay.con_base[sl][:, None] + np.arange(k_rows)[None, :]).ravel()
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
      dA = (invw[sl][:, None] * (1.0 + mu * mu) * 2.0 * mu * mu
            / m.opt.impratio.astype(dtype))  # (nsl, dim-1)
      r = jnp.maximum((1.0 - imp[sl][:, None]) / imp[sl][:, None] * dA, _MINVAL)
      D_rows = jnp.repeat((1.0 / r)[:, :, None], 2, axis=2).reshape(nsl * k_rows)
      aref_rows = (-b[sl][:, None, None] * vrows
                   - (k[sl] * imp[sl] * p[sl])[:, None, None]).reshape(nsl * k_rows)
      J = J.at[rows].set(Jrows.reshape(nsl * k_rows, nv))
      pos = pos.at[rows].set(jnp.repeat(p[sl], k_rows))
      D = D.at[rows].set(D_rows)
      aref = aref.at[rows].set(aref_rows)
      active = active.at[rows].set(jnp.repeat(act[sl], k_rows))
      oneside = oneside.at[rows].set(True)

  if s.disableflags & DisableBit.CONSTRAINT:
    active = jnp.zeros_like(active)

  D = jnp.where(active, D, 0.0)
  return dict(J=J, pos=pos, D=D, aref=aref, frictionloss=floss,
              active=active, oneside=oneside)
