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

  @property
  def nl(self) -> int:
    return len(self.limit_jnt)

  @property
  def ncr(self) -> int:
    """Total dense contact rows."""
    return self.nefc - self.nf - self.nl


@functools.lru_cache(maxsize=32)
def efc_layout(stat: ModelStatic) -> EfcLayout:
  nf = stat.nv
  limit_jnt = np.nonzero(
      stat.jnt_limited &
      np.isin(stat.jnt_type, (int(JointType.HINGE), int(JointType.SLIDE))))[0]
  limit_base = nf
  if stat.ncon_cap:
    # compacted layout: ncon_cap selected slots, uniform row structure
    # (2 rows per friction axis of the model's max condim)
    k_rows = 2 * max(int(stat.con_dim.max()) - 1, 1)
    n_rows = stat.ncon_cap * k_rows
    con_base = (limit_base + len(limit_jnt)
                + k_rows * np.arange(stat.ncon_cap, dtype=np.int32))
    return EfcLayout(
        nefc=limit_base + len(limit_jnt) + n_rows, nf=nf,
        limit_jnt=limit_jnt, limit_base=limit_base,
        con_base=con_base,
        con_rows=np.full(stat.ncon_cap, k_rows, np.int32))
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


def _contacts_compacted(m: Model, d: Data, ts, refsafe, dtype):
  """Contact constraint block from the ncon_cap DEEPEST candidate slots
  (runtime top-K over penetration — the TPU analog of mjwarp's dynamic
  contact pool, reference sim.py:87-88 nconmax). All selected slots share
  a uniform pyramidal row structure of the model's max condim; slots with
  smaller true condim mask their extra friction axes (a condim-1 slot
  becomes a +/- pair of normal rows with D split so forces/costs match
  the single-row formulation exactly)."""
  s = m.stat
  lay = efc_layout(s)
  con = d.contact
  K = s.ncon_cap
  A = max(int(s.con_dim.max()) - 1, 1)  # friction axes in the row layout
  anc = jnp.asarray(s.ancestor_mask, dtype)

  # ---- select the K deepest candidates ----
  p_all = con.dist - con.includemargin
  _, idx = jax.lax.top_k(-p_all, K)
  p = p_all[idx]
  act = p < 0
  pos_w = con.pos[idx]
  frame = con.frame[idx]
  friction = con.friction[idx]
  g1 = jnp.asarray(s.con_geom1)[idx]
  g2 = jnp.asarray(s.con_geom2)[idx]
  dim = jnp.asarray(s.con_dim)[idx]
  body_of_geom = jnp.asarray(s.geom_bodyid)
  rootid = jnp.asarray(s.body_rootid)
  b1 = body_of_geom[g1]
  b2 = body_of_geom[g2]

  # ---- jacobians for the selected slots only ----
  cdof_ang = d.cdof[:, :3]
  cdof_lin = d.cdof[:, 3:]
  croot1 = d.subtree_com[rootid[b1]]
  croot2 = d.subtree_com[rootid[b2]]

  def point_jac(pt, croot, body):
    rel = pt[:, None, :] - croot[:, None, :]
    col = cdof_lin[None] + jnp.cross(cdof_ang[None], rel)
    return col * anc[body][:, :, None]

  jt = point_jac(pos_w, croot2, b2) - point_jac(pos_w, croot1, b1)
  jr = (cdof_ang[None] * anc[b2][:, :, None]
        - cdof_ang[None] * anc[b1][:, :, None])
  jt_f = jnp.einsum('cfx,cvx->cfv', frame, jt)  # (K, 3, nv)
  jr_f = jnp.einsum('cfx,cvx->cfv', frame, jr)

  b_c, k_c, imp = _kbi(con.solref[idx], con.solimp[idx], p, ts, refsafe)
  invw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
  vel_t = jt_f @ d.qvel  # (K, 3)
  vel_r = jr_f @ d.qvel

  # friction axes 0..A-1 map to (tangent1, tangent2, torsion, roll1, roll2)
  axes = jnp.concatenate([jt_f[:, 1:3], jr_f], axis=1)[:, :A]  # (K, A, nv)
  vels = jnp.concatenate([vel_t[:, 1:3], vel_r], axis=1)[:, :A]
  mu = friction[:, :A]  # (K, A) combined coefficients per axis

  ax_ids = jnp.arange(A)
  real_axis = ax_ids[None, :] < (dim[:, None] - 1)  # (K, A)
  # condim-1 slots: axis 0 becomes a frictionless normal pair
  normal_pair = (dim[:, None] == 1) & (ax_ids[None, :] == 0)
  row_active = (real_axis | normal_pair) & act[:, None]
  mu = jnp.where(real_axis, mu, 0.0)

  # impedance denominators: pyramid dA for real axes, plain normal for the
  # frictionless pair (with a 1/2 split across the +/- duplicate rows)
  dA_pyr = invw[:, None] * (1.0 + mu * mu) * 2.0 * mu * mu \
      / m.opt.impratio.astype(dtype)
  dA = jnp.where(real_axis, dA_pyr, invw[:, None])
  r = jnp.maximum((1.0 - imp[:, None]) / imp[:, None] * dA, _MINVAL)
  D_axis = jnp.where(normal_pair, 0.5 / r, 1.0 / r)  # (K, A)

  signs = jnp.asarray([1.0, -1.0], dtype)
  # rows: (K, A, 2, nv) -> (K*A*2, nv), ordered (axis, +/-) per slot
  Jrows = (jt_f[:, 0][:, None, None, :]
           + signs[None, None, :, None] * (mu[..., None] * axes)[:, :, None, :])
  vrows = (vel_t[:, 0][:, None, None]
           + signs[None, None, :] * (mu * vels)[:, :, None])
  aref_rows = (-b_c[:, None, None] * vrows
               - (k_c * imp * p)[:, None, None])

  n_rows = K * A * 2
  c_J = Jrows.reshape(n_rows, s.nv)
  c_D = jnp.broadcast_to(D_axis[:, :, None], (K, A, 2)).reshape(n_rows)
  c_aref = aref_rows.reshape(n_rows)
  c_active = jnp.broadcast_to(row_active[:, :, None],
                              (K, A, 2)).reshape(n_rows)
  c_pos = jnp.broadcast_to(p[:, None, None], (K, A, 2)).reshape(n_rows)
  assert n_rows == lay.ncr, (n_rows, lay.ncr)
  return c_J, c_D, c_aref, c_active, c_pos


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

  # ---- contact rows (pyramidal), dense block ----
  nce = max(ncr, 1)
  c_J = jnp.zeros((nce, nv), dtype)
  c_D = jnp.zeros(nce, dtype)
  c_aref = jnp.zeros(nce, dtype)
  c_active = jnp.zeros(nce, bool)
  c_pos = jnp.zeros(nce, dtype)
  con_row0 = lay.nf + nl  # global row index of first contact row
  if s.ncon_cap and not (s.disableflags & DisableBit.CONTACT):
    c_J, c_D, c_aref, c_active, c_pos = _contacts_compacted(
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

    # vectorize per condim group (slots of equal condim share row structure)
    for dim in sorted(set(int(x) for x in s.con_dim[:ncon])):
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
      dA = (invw[sl][:, None] * (1.0 + mu * mu) * 2.0 * mu * mu
            / m.opt.impratio.astype(dtype))  # (nsl, dim-1)
      r = jnp.maximum((1.0 - imp[sl][:, None]) / imp[sl][:, None] * dA, _MINVAL)
      D_rows = jnp.repeat((1.0 / r)[:, :, None], 2, axis=2).reshape(nsl * k_rows)
      aref_rows = (-b[sl][:, None, None] * vrows
                   - (k[sl] * imp[sl] * p[sl])[:, None, None]).reshape(nsl * k_rows)
      c_J = c_J.at[rows].set(Jrows.reshape(nsl * k_rows, nv))
      c_pos = c_pos.at[rows].set(jnp.repeat(p[sl], k_rows))
      c_D = c_D.at[rows].set(D_rows)
      c_aref = c_aref.at[rows].set(aref_rows)
      c_active = c_active.at[rows].set(jnp.repeat(act[sl], k_rows))

  if s.disableflags & DisableBit.CONSTRAINT:
    f_active = jnp.zeros_like(f_active)
    l_active = jnp.zeros_like(l_active)
    c_active = jnp.zeros_like(c_active)

  f_D = jnp.where(f_active, f_D, 0.0)
  l_D = jnp.where(l_active, l_D, 0.0)
  c_D = jnp.where(c_active, c_D, 0.0)
  return dict(
      f_D=f_D, f_aref=f_aref, f_floss=f_floss, f_active=f_active,
      l_sign=l_sign, l_D=l_D, l_aref=l_aref, l_active=l_active, l_pos=l_pos,
      c_J=c_J, c_D=c_D, c_aref=c_aref, c_active=c_active, c_pos=c_pos)


def limit_dofadr(stat: ModelStatic) -> np.ndarray:
  """Static dof address of each limit row (at least length 1)."""
  lay = efc_layout(stat)
  if lay.nl == 0:
    return np.zeros(1, np.int32)
  return stat.jnt_dofadr[lay.limit_jnt].astype(np.int32)


def densify_efc(stat: ModelStatic, efc: dict) -> dict:
  """Flat (nefc, ...) views in [friction | limit | contact] row order —
  for tests/debugging parity with MuJoCo's efc_* arrays."""
  lay = efc_layout(stat)
  nv, nl, ncr = lay.nf, lay.nl, lay.ncr
  ldof = limit_dofadr(stat)
  dtype = efc['c_J'].dtype
  J = jnp.zeros((lay.nefc, nv), dtype)
  J = J.at[jnp.arange(nv), jnp.arange(nv)].set(1.0)
  if nl:
    J = J.at[nv + jnp.arange(nl), ldof].set(efc['l_sign'])
  if ncr:
    J = J.at[nv + nl:].set(efc['c_J'][:ncr])
  cat = lambda f, l, c: jnp.concatenate(
      [f, l[:nl], c[:ncr]] if ncr else [f, l[:nl]], axis=0)
  z = jnp.zeros(max(nl, 1), dtype)
  return dict(
      J=J,
      D=cat(efc['f_D'], efc['l_D'], efc['c_D']),
      aref=cat(efc['f_aref'], efc['l_aref'], efc['c_aref']),
      frictionloss=cat(efc['f_floss'], z, jnp.zeros_like(efc['c_D'])),
      active=cat(efc['f_active'], efc['l_active'], efc['c_active']),
      oneside=cat(jnp.zeros(nv, bool), jnp.ones(max(nl, 1), bool),
                  jnp.ones_like(efc['c_active'])),
      pos=cat(jnp.zeros(nv, dtype), efc['l_pos'], efc['c_pos']))
