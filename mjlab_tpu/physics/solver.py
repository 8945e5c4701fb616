"""Newton constraint solver (primal, acceleration space).

Implements MuJoCo's Newton solver: minimize over qacc
    C(x) = 0.5 (x - a_smooth)^T M (x - a_smooth) + sum_i s_i(J_i x - aref_i)
with one-sided quadratic costs for limits/contacts (pyramidal cone) and
Huber costs for dof friction loss. Each Newton step assembles the exact
Hessian, solves by dense Cholesky, and runs a parallel exact linesearch
(multi-alpha bracketing of the convex piecewise-quadratic phi).

Constraint blocks are STRUCTURED (physics/constraint.py make_efc):
dof-friction rows have J = I and limit rows are one-hot, so both
contribute only to the Hessian DIAGONAL; only contact rows are dense.
This halves the dense constraint math vs a flat (nefc, nv) Jacobian.

TPU notes: fixed shapes, static iteration counts (matching the
reference's iterations=10, ls_iterations=20 at scale, reference
src/mjlab/tasks/velocity/velocity_env_cfg.py:248-256). Under vmap on TPU
the per-iteration Cholesky solve dispatches to a fused Pallas kernel
(ops/pd_solve.py); MJLAB_NEWTON_KERNEL=1 selects a whole-solver Pallas
kernel instead (ops/newton.py). The per-env early exit the GPU reference
relies on is replaced by a fixed iteration count — the lockstep-friendly
choice on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.ops.pd_solve import solve_pd as _solve_pd
from mjlab_tpu.physics import constraint as _constraint
from mjlab_tpu.physics.types import Data, Model

# whole-solver Pallas kernel (ops/newton.py): ~20% faster than the
# vmapped-XLA path + fused Cholesky at 4096 G1 envs (keeps all Newton
# iterations in VMEM). MJLAB_NEWTON_KERNEL=0 falls back to the XLA path.
_MEGA_KERNEL = os.environ.get('MJLAB_NEWTON_KERNEL', '1') == '1'
_EPS = 1e-15

# Test-only: revert the linesearch polish to the pre-fix unguarded 1D
# Newton step (the f32-blowup root cause, round 4). The regression test
# (tests/test_blowup_regression.py) flips this to prove the captured
# trigger states still bite without the safeguard. Read at trace time;
# flip + _newton_fn.cache_clear() + a fresh jit to take effect.
UNSAFE_LS_POLISH = False


# ---------------------------------------------------------------------------
# per-block force/cost pieces
# ---------------------------------------------------------------------------


def _forces_oneside(jar, D, active, bilateral=None):
  quad = (jar < 0) & active
  if bilateral is not None:
    quad = quad | (bilateral & active)
  f = jnp.where(quad, -D * jar, 0.0)
  return f, quad


def _forces_friction(jar, D, floss, active):
  act = active & (floss > 0)
  f = jnp.where(act, -jnp.clip(D * jar, -floss, floss), 0.0)
  quad = act & (jnp.abs(D * jar) < floss)
  return f, quad


def _cost_oneside(jar, D, active, bilateral=None):
  quad = (jar < 0) & active
  if bilateral is not None:
    quad = quad | (bilateral & active)
  return jnp.sum(jnp.where(quad, 0.5 * D * jar * jar, 0.0))


def _cost_friction(jar, D, floss, active):
  act = active & (floss > 0)
  quad = 0.5 * D * jar * jar
  lin = floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, _EPS)
  s = jnp.where(jnp.abs(D * jar) < floss, quad, lin)
  return jnp.sum(jnp.where(act, s, 0.0))


# ---------------------------------------------------------------------------
# elliptic-cone contact pieces (MuJoCo zone formulas, verified to ~1e-13
# against mj_constraintUpdate — see physics/constraint.py _elliptic_block)
# ---------------------------------------------------------------------------


def _elliptic_zones(jx, xD, mu, fr, act):
  """Common elliptic quantities. jx: (..., NX, DM) residuals; returns
  (mid, bot, K, z, w, Tu) with zone masks including the active gate."""
  N = jx[..., 0]
  u = jx[..., 1:] * fr / jnp.maximum(mu, _EPS)[..., None]
  Tu = jnp.sqrt(jnp.maximum(jnp.sum(u * u, -1), _EPS))
  top = N >= mu * Tu
  bottom = mu * N + Tu <= 0.0
  mid = act & ~top & ~bottom
  bot = act & bottom & ~top
  K = xD[..., 0] / (2.0 * (1.0 + mu * mu))
  z = mu * Tu - N
  w = (u / Tu[..., None]) * fr  # dC/djar_t direction scale
  return mid, bot, K, z, w, Tu


def _elliptic_forces(jx, xD, mu, fr, act):
  """(forces (..., NX, DM), cost scalar-per-batch) of the elliptic block."""
  mid, bot, K, z, w, Tu = _elliptic_zones(jx, xD, mu, fr, act)
  f_mid = jnp.concatenate(
      [(2.0 * K * z)[..., None], -(2.0 * K * z)[..., None] * w], -1)
  f_bot = -xD * jx
  f = jnp.where(mid[..., None], f_mid,
                jnp.where(bot[..., None], f_bot, 0.0))
  cost = jnp.sum(jnp.where(mid, K * z * z,
                           jnp.where(bot,
                                     0.5 * jnp.sum(xD * jx * jx, -1),
                                     0.0)), -1)
  return f, cost


def _elliptic_hess(jx, xD, mu, fr, act):
  """Exact per-contact cost Hessian blocks B (..., NX, DM, DM)."""
  mid, bot, K, z, w, Tu = _elliptic_zones(jx, xD, mu, fr, act)
  dm = jx.shape[-1]
  g = jnp.concatenate([-jnp.ones_like(w[..., :1]), w], -1)  # (..., DM)
  ggT = g[..., :, None] * g[..., None, :]
  # tangential curvature (diag(fr^2) - w w^T) / (mu * Tu), zero row/col 0
  eye_t = jnp.zeros((dm, dm), jx.dtype).at[
      jnp.arange(1, dm), jnp.arange(1, dm)].set(1.0)
  fr_full = jnp.concatenate([jnp.zeros_like(w[..., :1]), fr], -1)
  w_full = jnp.concatenate([jnp.zeros_like(w[..., :1]), w], -1)
  diag_fr2 = eye_t * (fr_full[..., :, None] * fr_full[..., None, :])
  wwT = w_full[..., :, None] * w_full[..., None, :]
  denom = jnp.maximum(mu * Tu, _EPS)
  B_mid = 2.0 * K[..., None, None] * (
      ggT + (z / denom)[..., None, None] * (diag_fr2 - wwT))
  B_bot = (jnp.eye(dm, dtype=jx.dtype) * xD[..., None, :])
  return jnp.where(mid[..., None, None], B_mid,
                   jnp.where(bot[..., None, None], B_bot, 0.0))


def _elliptic_gh(jx, jdx, xD, mu, fr, act):
  """Linesearch pieces: (-f . jdx summed, jdx^T B jdx summed) — the
  gradient and curvature contributions of the elliptic block to
  phi'(alpha)/phi''(alpha) at residuals jx along direction jdx."""
  mid, bot, K, z, w, Tu = _elliptic_zones(jx, xD, mu, fr, act)
  gdot = -jdx[..., 0] + jnp.sum(w * jdx[..., 1:], -1)
  denom = jnp.maximum(mu * Tu, _EPS)
  h_mid = 2.0 * K * (gdot * gdot
                     + (z / denom) * (jnp.sum((fr * jdx[..., 1:]) ** 2, -1)
                                      - jnp.sum(w * jdx[..., 1:], -1) ** 2))
  h_bot = jnp.sum(xD * jdx * jdx, -1)
  f, _ = _elliptic_forces(jx, xD, mu, fr, act)
  g = -jnp.sum(f * jdx, (-2, -1))
  h = jnp.sum(jnp.where(mid, h_mid, jnp.where(bot, h_bot, 0.0)), -1)
  return g, h


def _newton_jax(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref, lD,
                l_act, f_aref, fD, floss, f_act, iterations, ls_polish,
                ldof, ne=0, xargs=None, grad_th=0.0):
  """Single-env structured Newton solve ->
  (qacc, f_friction (nv,), f_limit (nl,), f_contact (ncr,)[, f_elliptic]).
  Pure jax.numpy path (float64 CPU oracle tests + custom_vmap fallback).
  xargs = (xJ (NX, DM, nv), x_aref, xD, x_mu, x_fr, x_act) adds the
  elliptic-cone contact block (MuJoCo cone=elliptic)."""
  ldof = jnp.asarray(ldof)
  # first `ne` dense rows are bilateral equality rows (no one-sided clamp)
  bilat = jnp.arange(cJ.shape[0]) < ne
  elliptic = xargs is not None
  if elliptic:
    xJ, x_aref, xD, x_mu, x_fr, x_act = xargs

  def jars_of(x):
    jars = (x - f_aref,
            l_sign * x[ldof] - l_aref,
            cJ @ x - c_aref)
    if elliptic:
      jars = jars + (jnp.einsum('cdv,v->cd', xJ, x) - x_aref,)
    return jars

  def forces_of(jars):
    jf, jl, jc = jars[:3]
    ff, qf = _forces_friction(jf, fD, floss, f_act)
    fl, ql = _forces_oneside(jl, lD, l_act)
    fc, qc = _forces_oneside(jc, cD, c_act, bilat)
    if elliptic:
      fx, _ = _elliptic_forces(jars[3], xD, x_mu, x_fr, x_act)
      return (ff, fl, fc, fx), (qf, ql, qc)
    return (ff, fl, fc), (qf, ql, qc)

  def cost_of(x):
    jars = jars_of(x)
    jf, jl, jc = jars[:3]
    dx = x - a0
    cost = (0.5 * dx @ (M @ dx)
            + _cost_friction(jf, fD, floss, f_act)
            + _cost_oneside(jl, lD, l_act)
            + _cost_oneside(jc, cD, c_act, bilat))
    if elliptic:
      cost = cost + _elliptic_forces(jars[3], xD, x_mu, x_fr, x_act)[1]
    return cost

  def jt_apply(forces):
    """J^T f with the structured blocks."""
    ff, fl, fc = forces[:3]
    out = ff + cJ.T @ fc
    out = out.at[ldof].add(l_sign * fl)
    if elliptic:
      out = out + jnp.einsum('cd,cdv->v', forces[3], xJ)
    return out

  x0 = jnp.where(cost_of(ws) < cost_of(a0), ws, a0)

  def newton_step(_, x):
    jars = jars_of(x)
    forces, (qf, ql, qc) = forces_of(jars)
    grad = M @ (x - a0) - jt_apply(forces)

    # Hessian: M + diagonal (friction+limit) + dense contact part
    diag = jnp.zeros_like(x).at[ldof].add(jnp.where(ql, lD, 0.0))
    diag = diag + jnp.where(qf, fD, 0.0)
    Dq_c = jnp.where(qc, cD, 0.0)
    H = M + (cJ.T * Dq_c[None, :]) @ cJ
    H = H + jnp.diag(diag) + 1e-12 * jnp.eye(H.shape[0], dtype=H.dtype)
    if elliptic:
      B = _elliptic_hess(jars[3], xD, x_mu, x_fr, x_act)  # (NX, DM, DM)
      H = H + jnp.einsum('cab,cau,cbv->uv', B, xJ, xJ)
    # fused Pallas op when vmapped on TPU (ops/pd_solve.py)
    dx = _solve_pd(H, -grad)

    # parallel linesearch on convex piecewise-quadratic phi
    jd_f = dx
    jd_l = l_sign * dx[ldof]
    jd_c = cJ @ dx
    jd_x = jnp.einsum('cdv,v->cd', xJ, dx) if elliptic else None
    Md = M @ dx
    dMd = dx @ Md
    xMd = (x - a0) @ Md
    jf0, jl0, jc0 = jars[:3]

    def phi_grad_hess(alpha):
      a = alpha[..., None]
      jf_a = jf0 + a * jd_f
      jl_a = jl0 + a * jd_l
      jc_a = jc0 + a * jd_c
      ff_a, qf_a = _forces_friction(jf_a, fD, floss, f_act)
      fl_a, ql_a = _forces_oneside(jl_a, lD, l_act)
      fc_a, qc_a = _forces_oneside(jc_a, cD, c_act, bilat)
      g = (alpha * dMd + xMd
           - jnp.sum(ff_a * jd_f, -1) - jnp.sum(fl_a * jd_l, -1)
           - jnp.sum(fc_a * jd_c, -1))
      h = (dMd + jnp.sum(jnp.where(qf_a, fD, 0.0) * jd_f * jd_f, -1)
           + jnp.sum(jnp.where(ql_a, lD, 0.0) * jd_l * jd_l, -1)
           + jnp.sum(jnp.where(qc_a, cD, 0.0) * jd_c * jd_c, -1))
      if elliptic:
        jx_a = jars[3] + alpha[..., None, None] * jd_x
        gx, hx = _elliptic_gh(jx_a, jd_x, xD, x_mu, x_fr, x_act)
        g = g + gx
        h = h + hx
      return g, h

    g0, h0 = phi_grad_hess(jnp.zeros((), x.dtype))
    a1 = jnp.maximum(-g0 / jnp.maximum(h0, _EPS), 0.0)
    scales = jnp.asarray([0.0, 0.125, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 4.0,
                          8.0], x.dtype)
    grid = a1 * scales
    gg, _ = phi_grad_hess(grid)
    neg = gg <= 0.0
    lo_idx = jnp.argmax(jnp.where(neg, scales, -1.0))
    lo = grid[lo_idx]
    g_lo = gg[lo_idx]
    pos = gg > 0.0
    hi_idx = jnp.argmin(jnp.where(pos, scales, jnp.inf))
    any_pos = jnp.any(pos)
    hi = jnp.where(any_pos, grid[hi_idx], grid[-1])
    g_hi = jnp.where(any_pos, gg[hi_idx], gg[-1])
    denom = g_hi - g_lo
    alpha = jnp.where(
        jnp.abs(denom) > _EPS,
        lo - g_lo * (hi - lo) / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0),
        lo)
    alpha = jnp.where(any_pos, alpha, grid[-1])

    # safeguarded polish (mirrors ops/newton.py): phi is convex so phi'
    # is nondecreasing — keep the [lo, hi] bracket and bisect whenever
    # the 1D Newton step leaves it; unguarded steps overshoot at the
    # piecewise-quadratic kinks of stiff deep-penetration landscapes
    def polish(_, c):
      a, lo_, hi_, found = c
      g, h = phi_grad_hess(a)
      if UNSAFE_LS_POLISH:  # test-only pre-fix path, see module docstring
        return a - g / jnp.maximum(h, _EPS), lo_, hi_, found
      neg = g <= 0
      lo_ = jnp.where(neg, jnp.maximum(a, lo_), lo_)
      hi_ = jnp.where(neg, hi_,
                      jnp.where(found, jnp.minimum(a, hi_), a))
      found = found | ~neg
      a_n = a - g / jnp.maximum(h, _EPS)
      inside = (a_n >= lo_) & (a_n <= hi_)
      a = jnp.where(found & ~inside, 0.5 * (lo_ + hi_),
                    jnp.maximum(a_n, lo_))
      return a, lo_, hi_, found

    alpha, _, _, _ = jax.lax.fori_loop(
        0, ls_polish, polish, (alpha, lo, hi, any_pos))
    alpha = jnp.maximum(alpha, 0.0)
    # MuJoCo-style convergence termination (mj_solNewton): once the
    # gradient norm is below the scaled tolerance the iterate freezes
    # (zero step). Under vmap every env still runs `iterations` loop
    # bodies in lockstep, but frozen envs' results match the Pallas
    # kernel's genuine per-block early exit bit-for-bit.
    alpha = jnp.where(grad @ grad > grad_th * grad_th, alpha, 0.0)
    return x + alpha * dx

  x = jax.lax.fori_loop(0, iterations, newton_step, x0)
  forces, _ = forces_of(jars_of(x))
  if elliptic:
    return x, forces[0], forces[1], forces[2], forces[3]
  return x, forces[0], forces[1], forces[2]


@functools.lru_cache(maxsize=None)
def _newton_fn(iterations: int, ls_polish: int, ldof: tuple, ne: int = 0,
               grad_th: float = 0.0):
  """custom_vmap Newton solve: the vmapped TPU path can run the whole
  solver as one Pallas kernel (MJLAB_NEWTON_KERNEL=1); by default the
  vmapped jax path runs with the fused Pallas Cholesky solve. grad_th > 0
  enables MuJoCo-style convergence termination (ops/newton.py)."""
  ldof_np = np.asarray(ldof, np.int32)

  @jax.custom_batching.custom_vmap
  def fn(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref, lD, l_act,
         f_aref, fD, floss, f_act):
    return _newton_jax(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref,
                       lD, l_act, f_aref, fD, floss, f_act, iterations,
                       ls_polish, ldof_np, ne, grad_th=grad_th)

  @fn.def_vmap
  def _rule(axis_size, in_batched, *args):  # noqa: ANN001
    args = tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched))
    M = args[0]
    cJ = args[3]
    if (M.ndim == 3 and jax.default_backend() == 'tpu'
        and M.dtype == jnp.float32 and _MEGA_KERNEL and ne == 0
        and M.shape[0] >= 256
        and _kernel_vmem_bytes(M.shape[-1], cJ.shape[1]) < 11 * 2 ** 20):
      from mjlab_tpu.ops.newton import newton_solve_tpu
      out = newton_solve_tpu(*args, iterations=iterations,
                             ls_polish=ls_polish, ldof=ldof,
                             grad_th=grad_th)
    else:
      out = jax.vmap(
          lambda *a: _newton_jax(*a, iterations, ls_polish, ldof_np,
                                 ne, grad_th=grad_th))(*args)
    return out, (True, True, True, True)

  return fn


@functools.lru_cache(maxsize=None)
def _newton_fn_elliptic(iterations: int, ls_polish: int, ldof: tuple,
                        ne: int = 0, grad_th: float = 0.0):
  """Newton solve with the elliptic-cone contact block (XLA path only;
  the whole-solver Pallas kernel implements the pyramidal cost)."""
  ldof_np = np.asarray(ldof, np.int32)

  def fn(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref, lD, l_act,
         f_aref, fD, floss, f_act, xJ, x_aref, xD, x_mu, x_fr, x_act):
    return _newton_jax(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref,
                       lD, l_act, f_aref, fD, floss, f_act, iterations,
                       ls_polish, ldof_np, ne,
                       xargs=(xJ, x_aref, xD, x_mu, x_fr, x_act),
                       grad_th=grad_th)

  return fn


def _kernel_vmem_bytes(n: int, ncr: int, block_b: int = 128) -> int:
  """Rough VMEM footprint of one ops/newton.py block: M + cJ (+ its
  double buffer) + 2 (n,n) scratch + one (ncr,n,BB) transient. Models
  with huge self-collision row counts (e.g. G1 tracking, ncr ~ 2400)
  cannot fit and must take the XLA path."""
  f = 4 * block_b
  return (3 * n * n + 3 * ncr * n + 12 * ncr + 8 * n) * f


def solve(m: Model, d: Data, efc) -> Data:
  """Run the Newton solver; returns Data with qacc/qfrc_constraint/efc_force."""
  s = m.stat
  ldof = tuple(int(i) for i in _constraint.limit_dofadr(s))
  # ls_iterations -> 1D-polish step count: the 10-point parallel grid
  # costs ~10 evaluations, each polish step one more. The flagship
  # config (ls_iterations=20) keeps the round-1 default of 2 polish
  # steps; larger budgets (oracle tests use 50) polish further.
  ls_polish = max(1, min((int(s.ls_iterations) - 10) // 4, 6))
  # MuJoCo convergence threshold (mj_solNewton): stop when
  # ||grad|| * 1/(meaninertia * max(1, nv)) < opt.tolerance. The unscaled
  # threshold is static so frozen-lane masking costs one compare.
  grad_th = float(s.newton_tolerance) * float(s.meaninertia) * max(1, s.nv)
  lay = _constraint.efc_layout(s)
  ne = lay.ne
  nlt = lay.nlt
  if ne or nlt:
    # dense block gains prefix rows: bilateral equality rows at the
    # FRONT, then tendon-limit rows (one-sided), then contacts
    pre_J = ([efc['e_J']] if ne else []) + ([efc['t_J']] if nlt else [])
    pre_a = ([efc['e_aref']] if ne else []) + ([efc['t_aref']] if nlt
                                               else [])
    pre_D = ([efc['e_D']] if ne else []) + ([efc['t_D']] if nlt else [])
    pre_c = ([efc['e_active']] if ne else []) + ([efc['t_active']] if nlt
                                                 else [])
    cJ = jnp.concatenate(pre_J + [efc['c_J']], axis=0)
    c_aref = jnp.concatenate(pre_a + [efc['c_aref']])
    c_D = jnp.concatenate(pre_D + [efc['c_D']])
    c_act = jnp.concatenate(pre_c + [efc['c_active']])
  else:
    cJ, c_aref, c_D, c_act = (efc['c_J'], efc['c_aref'], efc['c_D'],
                              efc['c_active'])
  elliptic = 'x_J' in efc
  if elliptic:
    fn = _newton_fn_elliptic(int(s.iterations), ls_polish, ldof, ne,
                             grad_th)
    x, ff, fl, fc, fx = fn(
        d.qM, d.qacc_smooth, d.qacc_warmstart,
        cJ, c_aref, c_D, c_act,
        efc['l_sign'], efc['l_aref'], efc['l_D'], efc['l_active'],
        efc['f_aref'], efc['f_D'], efc['f_floss'], efc['f_active'],
        efc['x_J'], efc['x_aref'], efc['x_D'], efc['x_mu'], efc['x_fr'],
        efc['x_active'])
    qfrc_constraint = (ff + cJ.T @ fc
                       + jnp.einsum('cd,cdv->v', fx, efc['x_J'])).at[
                           jnp.asarray(ldof)].add(efc['l_sign'] * fl)
    # dense efc_force [equality|friction|limit|contacts by slot]: the
    # frictionless (c block) and elliptic (x block) rows scatter to their
    # static slot-ordered addresses
    x_rows, c1_rows, _, _ = _constraint.elliptic_row_maps(s)
    efc_force = jnp.zeros(lay.nefc, x.dtype)
    if ne:
      efc_force = efc_force.at[:ne].set(fc[:ne])
    efc_force = efc_force.at[ne + jnp.arange(s.nv)].set(ff)
    if lay.nl:
      efc_force = efc_force.at[ne + s.nv + jnp.arange(lay.nl)].set(
          fl[:lay.nl])
    if nlt:
      efc_force = efc_force.at[ne + s.nv + lay.nl + jnp.arange(nlt)].set(
          fc[ne:ne + nlt])
    if len(c1_rows):
      efc_force = efc_force.at[jnp.asarray(c1_rows)].set(
          fc[ne + nlt:ne + nlt + len(c1_rows)], mode='drop')
    if x_rows.shape[0] and fx.shape[0] == x_rows.shape[0]:
      efc_force = efc_force.at[jnp.asarray(x_rows).ravel()].set(
          fx.reshape(-1), mode='drop')
  else:
    fn = _newton_fn(int(s.iterations), ls_polish, ldof, ne, grad_th)
    x, ff, fl, fc = fn(
        d.qM, d.qacc_smooth, d.qacc_warmstart,
        cJ, c_aref, c_D, c_act,
        efc['l_sign'], efc['l_aref'], efc['l_D'], efc['l_active'],
        efc['f_aref'], efc['f_D'], efc['f_floss'], efc['f_active'])
    qfrc_constraint = (ff + cJ.T @ fc).at[
        jnp.asarray(ldof)].add(efc['l_sign'] * fl)
    # dense efc_force in MuJoCo row order
    # [equality | friction | joint limits | tendon limits | contacts]
    parts = []
    if ne:
      parts.append(fc[:ne])
    parts.append(ff)
    parts.append(fl[:lay.nl])
    if nlt:
      parts.append(fc[ne:ne + nlt])
    parts.append(fc[ne + nlt:ne + nlt + lay.ncr])
    efc_force = jnp.concatenate([p for p in parts if p.shape[0]], axis=0)
  return d.replace(
      qacc=x,
      qfrc_constraint=qfrc_constraint,
      efc_force=efc_force,
      solver_niter=jnp.asarray(s.iterations, jnp.int32))
