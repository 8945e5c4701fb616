"""The full Newton contact solver as one Pallas TPU kernel.

Runs ALL solver iterations for a 128-env lane block inside VMEM: per
block it reads M / contact-Jacobian / constraint blocks once from HBM and
writes qacc + constraint forces once. Math matches physics/solver.py
(MuJoCo Newton, pyramidal cone, one-sided quadratic + Huber friction-loss
costs, parallel linesearch) with the same structured constraint blocks:
friction rows (J = I) and limit rows (one-hot) contribute only to the
Hessian diagonal; only contact rows are dense.

Layout is structure-of-arrays: batch on the 128-lane axis, so each scalar
of the per-env recursions is a 128-wide VPU vector op. Default TPU path
for batch >= 256 within the VMEM budget (physics/solver.py dispatch;
MJLAB_NEWTON_KERNEL=0 opts out to the vmapped-XLA path with the fused
Cholesky kernel, ops/pd_solve.py). Known headroom: the Hessian assembly
is VPU work (~22.6M MACs per 128-env block per Newton iteration); an
XLA-batched-GEMM hybrid would move it to the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_EPS = 1e-15


def _rsum(v):
  """(R, BB) -> (1, BB) sum. Mosaic cannot lower sublane reductions whose
  output drops to lane-only 1D (even via keepdims); reducing the middle
  axis of a 3D view lowers cleanly."""
  return jnp.sum(v[None], axis=1)


def _make_kernel(iterations: int, ls_polish: int, n: int, ncr: int, nl: int,
                 ldof: tuple, grad_th: float = 0.0):
  """Kernel closure over static sizes/iteration count/limit dof map.

  grad_th > 0 enables MuJoCo-style convergence termination (MuJoCo
  mj_solNewton: stop when the scaled gradient norm drops below
  opt.tolerance; grad_th is the UNscaled threshold
  tolerance * meaninertia * max(1, nv), precomputed by the caller):
  converged lanes freeze (alpha forced to 0, so their iterates — and
  hence results — are independent of how long the block keeps looping).
  NOTE: the iteration loop below is deliberately Python-unrolled (a lax
  loop blows the VMEM budget, see BASELINE.md round 4), so on TPU every
  block executes ALL `iterations` unrolled bodies — there is no block
  early exit, and raising the cap costs every block the extra
  iterations. The freeze is the stability fix for deep-penetration
  states (blowup forensics round 4: 8.6 cm penetrations need ~3x the
  typical iteration count; a fixed low cap returned unconverged qacc
  and exploded f32 velocities) and keeps results bit-identical to the
  XLA path's per-lane convergence semantics."""

  def f_oneside(jar, D, act):
    negm = (jar < 0).astype(jar.dtype) * act
    return -D * jar * negm, negm

  def f_friction(jar, D, floss, act):
    actf = act * (floss > 0).astype(jar.dtype)
    f = -jnp.clip(D * jar, -floss, floss) * actf
    quad = (jnp.abs(D * jar) < floss).astype(jar.dtype) * actf
    return f, quad

  def c_oneside(jar, D, act):
    negm = (jar < 0).astype(jar.dtype) * act
    return _rsum(0.5 * D * jar * jar * negm)

  def c_friction(jar, D, floss, act):
    actf = act * (floss > 0).astype(jar.dtype)
    quad = 0.5 * D * jar * jar
    lin = floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, _EPS)
    huber = (jnp.abs(D * jar) < floss).astype(jar.dtype)
    return _rsum((huber * quad + (1.0 - huber) * lin) * actf)

  def kernel(m_ref, cj_ref, caref_ref, cd_ref, cact_ref,
             lsign_ref, laref_ref, ld_ref, lact_ref,
             faref_ref, fd_ref, floss_ref, fact_ref,
             a0_ref, ws_ref,
             x_ref, ff_ref, fl_ref, fc_ref, h_ref, l_ref):
    M = m_ref[:, :, :]          # (n,n,BB)
    cJ = cj_ref[:, :, :]        # (ncr,n,BB)
    c_aref = caref_ref[:, :]    # (ncr,BB)
    cD = cd_ref[:, :]
    c_act = cact_ref[:, :]      # float 0/1
    l_sign = lsign_ref[:, :]    # (nl,BB)
    l_aref = laref_ref[:, :]
    lD = ld_ref[:, :]
    l_act = lact_ref[:, :]
    f_aref = faref_ref[:, :]    # (n,BB)
    fD = fd_ref[:, :]
    floss = floss_ref[:, :]
    f_act = fact_ref[:, :]
    a0 = a0_ref[:, :]
    ws = ws_ref[:, :]

    def cjmul(x):  # (n,BB) -> (ncr,BB)
      acc = cJ[:, 0, :] * x[0:1, :]
      for i in range(1, n):
        acc = acc + cJ[:, i, :] * x[i:i + 1, :]
      return acc

    def cjtmul(f):  # (ncr,BB) -> (n,BB)
      return jnp.sum(cJ * f[:, None, :], axis=0)

    def mmul(x):
      acc = M[:, 0, :] * x[0:1, :]
      for i in range(1, n):
        acc = acc + M[:, i, :] * x[i:i + 1, :]
      return acc

    def gather_l(x):  # rows x[ldof] -> (nl,BB)
      return jnp.concatenate([x[dof:dof + 1, :] for dof in ldof], axis=0)

    def scatter_l(base, vals):  # base (n,BB) += scatter of (nl,BB)
      dof_to_j = {dof: j for j, dof in enumerate(ldof)}
      rows = []
      for i in range(n):
        row = base[i:i + 1, :]
        if i in dof_to_j:
          j = dof_to_j[i]
          row = row + vals[j:j + 1, :]
        rows.append(row)
      return jnp.concatenate(rows, axis=0)

    def jars_of(x):
      return (x - f_aref, l_sign * gather_l(x) - l_aref, cjmul(x) - c_aref)

    def forces_of(jars):
      jf, jl, jc = jars
      ff, qf = f_friction(jf, fD, floss, f_act)
      fl, ql = f_oneside(jl, lD, l_act)
      fc, qc = f_oneside(jc, cD, c_act)
      return (ff, fl, fc), (qf, ql, qc)

    def total_cost(x):
      jf, jl, jc = jars_of(x)
      dx = x - a0
      return (0.5 * _rsum(dx * mmul(dx))
              + c_friction(jf, fD, floss, f_act)
              + c_oneside(jl, lD, l_act)
              + c_oneside(jc, cD, c_act))

    use_ws = total_cost(ws) < total_cost(a0)  # (1,BB)
    x = jnp.where(use_ws, ws, a0)

    # upper-triangular H is never consumed (the Cholesky/tri-solves read
    # the lower triangle only); zero it once so no uninitialized VMEM
    # feeds the (discarded) upper arithmetic
    h_ref[:, :, :] = jnp.zeros((n, n, h_ref.shape[-1]), M.dtype)

    # The Newton loop MUST stay Python-unrolled: any lax loop (while_loop
    # AND fori_loop were both tried) costs +3.6 MB of Mosaic stack at the
    # 4096-env G1 shape — over the 16 MB scoped-vmem limit — because the
    # dynamic trip count defeats cross-iteration buffer reuse. Converged
    # lanes still freeze per MuJoCo semantics (alpha masked to 0 once the
    # scaled gradient norm is under tolerance), the block just executes
    # all `iterations` unrolled steps.
    th2 = jnp.asarray(grad_th * grad_th, M.dtype)

    for _ in range(iterations):
      jf, jl, jc = jars_of(x)
      (ff, fl, fc), (qf, ql, qc) = forces_of((jf, jl, jc))
      grad = mmul(x - a0) - scatter_l(ff + cjtmul(fc), l_sign * fl)
      g2 = _rsum(grad * grad)  # (1,BB)
      Dq_c = cD * qc  # (ncr,BB)
      diag = scatter_l(fD * qf, lD * ql)  # (n,BB)

      # H = M + diag + cJ^T Dq_c cJ; symmetric, so build only the lower
      # triangle (rows >= jcol) — halves the dominant VPU MAC count
      for jcol in range(n):
        w = cJ[:, jcol, :] * Dq_c  # (ncr,BB)
        low = (M[jcol:, jcol, :]
               + jnp.sum(cJ[:, jcol:, :] * w[:, None, :], axis=0))
        low = low + jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (n - jcol, 1), 0) == 0),
            diag[jcol:jcol + 1, :], 0.0)
        h_ref[jcol:, jcol, :] = low

      # Cholesky (+ tiny ridge), lower rows only — the upper triangle of
      # L is never read
      for jc_ in range(n):
        if jc_:
          acc = jnp.sum(l_ref[jc_:, :jc_, :] * l_ref[jc_:jc_ + 1, :jc_, :],
                        axis=1)
          col = h_ref[jc_:, jc_, :] - acc
        else:
          col = h_ref[jc_:, jc_, :]
        ddiag = jnp.sqrt(jnp.maximum(col[0:1, :] + 1e-12, 1e-12))
        l_ref[jc_:, jc_, :] = col / ddiag

      # solve H dx = -grad
      ys = []
      for jc_ in range(n):
        acc = -grad[jc_:jc_ + 1, :]
        for k in range(jc_):
          acc = acc - l_ref[jc_:jc_ + 1, k, :] * ys[k]
        ys.append(acc / l_ref[jc_:jc_ + 1, jc_, :])
      xs = [None] * n
      for jc_ in range(n - 1, -1, -1):
        acc = ys[jc_]
        for k in range(jc_ + 1, n):
          acc = acc - l_ref[k:k + 1, jc_, :] * xs[k]
        xs[jc_] = acc / l_ref[jc_:jc_ + 1, jc_, :]
      dx = jnp.concatenate(xs, axis=0)

      # parallel linesearch
      jd_f = dx
      jd_l = l_sign * gather_l(dx)
      jd_c = cjmul(dx)
      Md = mmul(dx)
      dMd = _rsum(dx * Md)
      xMd = _rsum((x - a0) * Md)
      jf0, jl0, jc0 = jf, jl, jc

      def phi_gh(alpha):  # (1,BB)
        (ff_a, fl_a, fc_a), (qf_a, ql_a, qc_a) = forces_of(
            (jf0 + alpha * jd_f, jl0 + alpha * jd_l, jc0 + alpha * jd_c))
        g = (alpha * dMd + xMd - _rsum(ff_a * jd_f)
             - _rsum(fl_a * jd_l) - _rsum(fc_a * jd_c))
        h = (dMd + _rsum(fD * qf_a * jd_f * jd_f)
             + _rsum(lD * ql_a * jd_l * jd_l)
             + _rsum(cD * qc_a * jd_c * jd_c))
        return g, h

      zero = jnp.zeros_like(dMd)
      g0, h0 = phi_gh(zero)
      a1 = jnp.maximum(-g0 / jnp.maximum(h0, _EPS), 0.0)
      scales = (0.0, 0.125, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 4.0, 8.0)
      lo = zero
      g_lo = g0
      hi = a1 * scales[-1]
      g_hi, _ = phi_gh(hi)
      found_hi = g_hi > 0
      for sc in scales[1:-1]:
        a_s = a1 * sc
        g_s, _ = phi_gh(a_s)
        neg = g_s <= 0
        take_lo = neg & (a_s > lo)
        lo = jnp.where(take_lo, a_s, lo)
        g_lo = jnp.where(take_lo, g_s, g_lo)
        take_hi = (~neg) & ((a_s < hi) | ~found_hi)
        hi = jnp.where(take_hi, a_s, hi)
        g_hi = jnp.where(take_hi, g_s, g_hi)
        found_hi = found_hi | ~neg
      denom = g_hi - g_lo
      alpha = jnp.where(jnp.abs(denom) > _EPS,
                        lo - g_lo * (hi - lo)
                        / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0),
                        lo)
      alpha = jnp.where(found_hi, alpha, a1 * scales[-1])
      # safeguarded polish: phi is convex so phi' is nondecreasing — keep
      # a [lo, hi] bracket with phi'(lo) <= 0 <= phi'(hi) and fall back to
      # bisection whenever the 1D Newton step leaves it. Unguarded Newton
      # steps overshoot at the piecewise-quadratic kinks of stiff
      # deep-penetration landscapes, returning a bad alpha that explodes
      # f32 velocities within a few substeps (blowup forensics round 4).
      for _p in range(ls_polish):
        g_p, h_p = phi_gh(alpha)
        neg = g_p <= 0
        lo = jnp.where(neg, jnp.maximum(alpha, lo), lo)
        # first positive-slope point REPLACES the unbracketed hi guess
        hi = jnp.where(neg, hi,
                       jnp.where(found_hi, jnp.minimum(alpha, hi), alpha))
        found_hi = found_hi | ~neg
        a_n = alpha - g_p / jnp.maximum(h_p, _EPS)
        inside = (a_n >= lo) & (a_n <= hi)
        alpha = jnp.where(found_hi & ~inside, 0.5 * (lo + hi),
                          jnp.maximum(a_n, lo))
      alpha = jnp.maximum(alpha, 0.0)
      # per-lane freeze: lanes whose gradient already met the tolerance
      # take a zero step (MuJoCo convergence semantics)
      alpha = jnp.where(g2 > th2, alpha, 0.0)
      x = x + alpha * dx

    (ff, fl, fc), _ = forces_of(jars_of(x))
    x_ref[:, :] = x
    ff_ref[:, :] = ff
    fl_ref[:, :] = fl
    fc_ref[:, :] = fc

  return kernel


@functools.partial(jax.jit,
                   static_argnames=('iterations', 'ls_polish', 'ldof',
                                    'block_b', 'interpret', 'grad_th'))
def newton_solve_tpu(M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref, lD,
                     l_act, f_aref, fD, floss, f_act,
                     iterations: int, ldof: tuple, ls_polish: int = 2,
                     block_b: int = _LANES, interpret: bool = False,
                     grad_th: float = 0.0):
  """Batched structured Newton solve. Returns (qacc (B,n), ff (B,n),
  fl (B,nl), fc (B,ncr)). grad_th > 0 enables MuJoCo-style convergence
  termination (see _make_kernel); iterations then acts as the cap."""
  B, n, _ = M.shape
  ncr = cJ.shape[1]
  nl = l_sign.shape[1]
  pad = (-B) % block_b
  fz = lambda x: x.astype(M.dtype)

  def padded(x, eye=False):
    if not pad:
      return x
    if eye:
      extra = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype),
                               (pad,) + x.shape[1:])
    else:
      extra = jnp.zeros((pad,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, extra], 0)

  args = [padded(M, eye=True), padded(cJ), padded(c_aref), padded(cD),
          padded(fz(c_act)), padded(l_sign), padded(l_aref), padded(lD),
          padded(fz(l_act)), padded(f_aref), padded(fD), padded(floss),
          padded(fz(f_act)), padded(a0), padded(ws)]
  Bp = B + pad
  tr = lambda x: jnp.moveaxis(x, 0, -1)
  args = [tr(a) for a in args]
  # kernel arg order: M, cJ, c_aref, cD, c_act, l_sign, l_aref, lD, l_act,
  # f_aref, fD, floss, f_act, a0, ws

  def spec(shape):
    if len(shape) == 2:
      return pl.BlockSpec(shape[:-1] + (block_b,), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    return pl.BlockSpec(shape[:-1] + (block_b,), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)

  in_specs = [spec(a.shape) for a in args]
  kernel = _make_kernel(iterations, ls_polish, n, ncr, nl, ldof, grad_th)
  out = pl.pallas_call(
      kernel,
      grid=(Bp // block_b,),
      in_specs=in_specs,
      out_specs=[spec((n, Bp)), spec((n, Bp)), spec((nl, Bp)),
                 spec((ncr, Bp))],
      out_shape=[jax.ShapeDtypeStruct((n, Bp), M.dtype),
                 jax.ShapeDtypeStruct((n, Bp), M.dtype),
                 jax.ShapeDtypeStruct((nl, Bp), M.dtype),
                 jax.ShapeDtypeStruct((ncr, Bp), M.dtype)],
      scratch_shapes=[pltpu.VMEM((n, n, block_b), M.dtype),
                      pltpu.VMEM((n, n, block_b), M.dtype)],
      interpret=interpret,
  )(*args)
  x_t, ff_t, fl_t, fc_t = out
  back = lambda x: jnp.moveaxis(x, -1, 0)[:B]
  return back(x_t), back(ff_t), back(fl_t), back(fc_t)
