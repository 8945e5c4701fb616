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


def _newton_jax(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref, lD,
                l_act, f_aref, fD, floss, f_act, iterations, ls_polish,
                ldof, ne=0):
  """Single-env structured Newton solve ->
  (qacc, f_friction (nv,), f_limit (nl,), f_contact (ncr,)).
  Pure jax.numpy path (float64 CPU oracle tests + custom_vmap fallback).
  """
  ldof = jnp.asarray(ldof)
  # first `ne` dense rows are bilateral equality rows (no one-sided clamp)
  bilat = jnp.arange(cJ.shape[0]) < ne

  def jars_of(x):
    return (x - f_aref,
            l_sign * x[ldof] - l_aref,
            cJ @ x - c_aref)

  def forces_of(jars):
    jf, jl, jc = jars
    ff, qf = _forces_friction(jf, fD, floss, f_act)
    fl, ql = _forces_oneside(jl, lD, l_act)
    fc, qc = _forces_oneside(jc, cD, c_act, bilat)
    return (ff, fl, fc), (qf, ql, qc)

  def cost_of(x):
    jf, jl, jc = jars_of(x)
    dx = x - a0
    return (0.5 * dx @ (M @ dx)
            + _cost_friction(jf, fD, floss, f_act)
            + _cost_oneside(jl, lD, l_act)
            + _cost_oneside(jc, cD, c_act, bilat))

  def jt_apply(ff, fl, fc):
    """J^T f with the structured blocks."""
    out = ff + cJ.T @ fc
    return out.at[ldof].add(l_sign * fl)

  x0 = jnp.where(cost_of(ws) < cost_of(a0), ws, a0)

  def newton_step(_, x):
    jars = jars_of(x)
    (ff, fl, fc), (qf, ql, qc) = forces_of(jars)
    grad = M @ (x - a0) - jt_apply(ff, fl, fc)

    # Hessian: M + diagonal (friction+limit) + dense contact part
    diag = jnp.zeros_like(x).at[ldof].add(jnp.where(ql, lD, 0.0))
    diag = diag + jnp.where(qf, fD, 0.0)
    Dq_c = jnp.where(qc, cD, 0.0)
    H = M + (cJ.T * Dq_c[None, :]) @ cJ
    H = H + jnp.diag(diag) + 1e-12 * jnp.eye(H.shape[0], dtype=H.dtype)
    # fused Pallas op when vmapped on TPU (ops/pd_solve.py)
    dx = _solve_pd(H, -grad)

    # parallel linesearch on convex piecewise-quadratic phi
    jd_f = dx
    jd_l = l_sign * dx[ldof]
    jd_c = cJ @ dx
    Md = M @ dx
    dMd = dx @ Md
    xMd = (x - a0) @ Md
    jf0, jl0, jc0 = jars

    def phi_grad_hess(alpha):
      a = alpha[..., None]
      (ff_a, fl_a, fc_a), (qf_a, ql_a, qc_a) = forces_of(
          (jf0 + a * jd_f, jl0 + a * jd_l, jc0 + a * jd_c))
      g = (alpha * dMd + xMd
           - jnp.sum(ff_a * jd_f, -1) - jnp.sum(fl_a * jd_l, -1)
           - jnp.sum(fc_a * jd_c, -1))
      h = (dMd + jnp.sum(jnp.where(qf_a, fD, 0.0) * jd_f * jd_f, -1)
           + jnp.sum(jnp.where(ql_a, lD, 0.0) * jd_l * jd_l, -1)
           + jnp.sum(jnp.where(qc_a, cD, 0.0) * jd_c * jd_c, -1))
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

    def polish(_, a):
      g, h = phi_grad_hess(a)
      return a - g / jnp.maximum(h, _EPS)

    alpha = jax.lax.fori_loop(0, ls_polish, polish, alpha)
    return x + jnp.maximum(alpha, 0.0) * dx

  x = jax.lax.fori_loop(0, iterations, newton_step, x0)
  (ff, fl, fc), _ = forces_of(jars_of(x))
  return x, ff, fl, fc


@functools.lru_cache(maxsize=None)
def _newton_fn(iterations: int, ls_polish: int, ldof: tuple, ne: int = 0):
  """custom_vmap Newton solve: the vmapped TPU path can run the whole
  solver as one Pallas kernel (MJLAB_NEWTON_KERNEL=1); by default the
  vmapped jax path runs with the fused Pallas Cholesky solve."""
  ldof_np = np.asarray(ldof, np.int32)

  @jax.custom_batching.custom_vmap
  def fn(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref, lD, l_act,
         f_aref, fD, floss, f_act):
    return _newton_jax(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref,
                       lD, l_act, f_aref, fD, floss, f_act, iterations,
                       ls_polish, ldof_np, ne)

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
                             ls_polish=ls_polish, ldof=ldof)
    else:
      out = jax.vmap(
          lambda *a: _newton_jax(*a, iterations, ls_polish, ldof_np,
                                 ne))(*args)
    return out, (True, True, True, True)

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
  lay = _constraint.efc_layout(s)
  ne = lay.ne
  if ne:
    # bilateral equality rows join the dense block at the FRONT
    cJ = jnp.concatenate([efc['e_J'], efc['c_J']], axis=0)
    c_aref = jnp.concatenate([efc['e_aref'], efc['c_aref']])
    c_D = jnp.concatenate([efc['e_D'], efc['c_D']])
    c_act = jnp.concatenate([efc['e_active'], efc['c_active']])
  else:
    cJ, c_aref, c_D, c_act = (efc['c_J'], efc['c_aref'], efc['c_D'],
                              efc['c_active'])
  fn = _newton_fn(int(s.iterations), ls_polish, ldof, ne)
  x, ff, fl, fc = fn(
      d.qM, d.qacc_smooth, d.qacc_warmstart,
      cJ, c_aref, c_D, c_act,
      efc['l_sign'], efc['l_aref'], efc['l_D'], efc['l_active'],
      efc['f_aref'], efc['f_D'], efc['f_floss'], efc['f_active'])
  qfrc_constraint = (ff + cJ.T @ fc).at[
      jnp.asarray(ldof)].add(efc['l_sign'] * fl)
  # dense efc_force in MuJoCo row order [equality|friction|limit|contact]
  parts = ([fc[:ne], ff, fl[:lay.nl], fc[ne:ne + lay.ncr]] if ne
           else [ff, fl[:lay.nl], fc[:lay.ncr]])
  efc_force = jnp.concatenate([p for p in parts if p.shape[0]], axis=0)
  return d.replace(
      qacc=x,
      qfrc_constraint=qfrc_constraint,
      efc_force=efc_force,
      solver_niter=jnp.asarray(s.iterations, jnp.int32))
