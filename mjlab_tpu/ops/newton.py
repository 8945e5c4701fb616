"""The full Newton contact solver as one Pallas TPU kernel.

Motivation: even with the factorization fused (ops/pd_solve.py), each
Newton iteration still issues ~40 small XLA ops (Hessian assembly,
constraint-space matvecs, linesearch) whose fixed overhead dominates at
robot-scale sizes (nv~35, nefc~120). This kernel runs ALL solver
iterations for a 128-env lane block inside VMEM: per block it reads
M/J/efc once from HBM and writes qacc/efc_force once.

Math is identical to physics/solver.py (MuJoCo Newton, pyramidal cone,
one-sided quadratic + Huber friction-loss costs, parallel linesearch).
Layout is structure-of-arrays: batch on the 128-lane axis, so each scalar
of the per-env recursions is a 128-wide VPU op.

Used via jax.custom_batching.custom_vmap from physics/solver.py — the
unbatched/CPU path keeps the pure jax.numpy implementation (float64
oracle tests run that path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 64 lanes per block keeps peak VMEM (J block + one (nefc,n,BB)
# transient + Cholesky scratch, double-buffered) under the 16MB budget.
_LANES = 128
_EPS = 1e-15


def _rsum(v):
  """(R, BB) -> (1, BB) sum. Mosaic cannot lower sublane reductions whose
  output drops to 1D/lane-only (even via keepdims); reducing a middle axis
  of a 3D view lowers cleanly."""
  return jnp.sum(v[None], axis=1)


def _make_kernel(iterations: int, n: int, nefc: int):
  """Kernel closure over static sizes/iteration count."""

  def forces(jar, D, floss, oneside_f, active_f):
    """Returns (row forces, quadratic-zone mask as FLOAT 0/1) — Mosaic
    dislikes mixed bool/i1 selects, so masks stay in float arithmetic."""
    is_fric = (floss > 0).astype(jar.dtype)
    neg = (jar < 0).astype(jar.dtype)
    f_one = -D * jar * neg
    f_fric = -jnp.clip(D * jar, -floss, floss)
    in_huber = (jnp.abs(D * jar) < floss).astype(jar.dtype)
    f = oneside_f * f_one + (1.0 - oneside_f) * is_fric * f_fric
    quad_f = (oneside_f * neg
              + (1.0 - oneside_f) * is_fric * in_huber) * active_f
    return f * active_f, quad_f

  def cost_s(jar, D, floss, oneside_f, active_f):
    quad = 0.5 * D * jar * jar
    lin = floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, _EPS)
    is_fric = (floss > 0).astype(jar.dtype)
    neg = (jar < 0).astype(jar.dtype)
    in_huber = (jnp.abs(D * jar) < floss).astype(jar.dtype)
    s_one = quad * neg
    s_fric = in_huber * quad + (1.0 - in_huber) * lin
    s = oneside_f * s_one + (1.0 - oneside_f) * is_fric * s_fric
    # per-env scalars stay 2D (1, BB): Mosaic cannot lower sublane
    # reductions with 1D outputs
    return _rsum(s * active_f)

  def kernel(m_ref, j_ref, aref_ref, d_ref, floss_ref, oneside_ref,
             act_ref, a0_ref, ws_ref, x_ref, f_ref, h_ref, l_ref):
    # shapes: m (n,n,BB), j (nefc,n,BB), efc vectors (nefc,BB),
    # a0/ws (n,BB); outputs x (n,BB), f (nefc,BB);
    # scratch h/l (n,n,BB)
    D = d_ref[:, :]
    floss = floss_ref[:, :]
    oneside = oneside_ref[:, :]  # float 0/1
    active_f = act_ref[:, :]
    a0 = a0_ref[:, :]
    J = j_ref[:, :, :]
    M = m_ref[:, :, :]
    aref = aref_ref[:, :]

    # Matvecs as accumulation loops over the small static dim: peak VMEM
    # temporaries stay at (nefc,BB)/(n,BB) instead of (nefc,n,BB).
    def jmul(x):  # (n,BB) -> (nefc,BB)
      acc = J[:, 0, :] * x[0:1, :]
      for i in range(1, n):
        acc = acc + J[:, i, :] * x[i:i + 1, :]
      return acc

    def jtmul(f):  # (nefc,BB) -> (n,BB)
      return jnp.sum(J * f[:, None, :], axis=0)

    def mmul(x):  # (n,BB) -> (n,BB)
      acc = M[:, 0, :] * x[0:1, :]
      for i in range(1, n):
        acc = acc + M[:, i, :] * x[i:i + 1, :]
      return acc

    def total_cost(x):  # -> (1,BB)
      jar = jmul(x) - aref
      dx = x - a0
      return 0.5 * _rsum(dx * mmul(dx)) + \
          cost_s(jar, D, floss, oneside, active_f)

    ws = ws_ref[:, :]
    use_ws = total_cost(ws) < total_cost(a0)  # (1,BB)
    x = jnp.where(use_ws, ws, a0)

    for _ in range(iterations):
      jar = jmul(x) - aref
      f, quad_f = forces(jar, D, floss, oneside, active_f)
      grad = mmul(x - a0) - jtmul(f)
      Dq = D * quad_f  # (nefc,BB)

      # H = M + J^T diag(Dq) J, column by column; per column one
      # (nefc,n,BB) transient multiply-reduce (sized by block_b)
      for jcol in range(n):
        w = J[:, jcol, :] * Dq  # (nefc,BB)
        h_ref[:, jcol, :] = M[:, jcol, :] + jnp.sum(
            J * w[:, None, :], axis=0)

      # Cholesky of H (+ tiny ridge on the diagonal)
      for jc in range(n):
        if jc:
          acc = jnp.sum(l_ref[:, :jc, :] * l_ref[jc:jc + 1, :jc, :],
                        axis=1)
          col = h_ref[:, jc, :] - acc
        else:
          col = h_ref[:, jc, :]
        ddiag = jnp.sqrt(jnp.maximum(col[jc:jc + 1, :] + 1e-12, 1e-12))
        l_ref[:, jc, :] = col / ddiag

      # solve H dx = -grad (ys/xs entries are (1,BB))
      ys = []
      for jc in range(n):
        acc = -grad[jc:jc + 1, :]
        for k in range(jc):
          acc = acc - l_ref[jc:jc + 1, k, :] * ys[k]
        ys.append(acc / l_ref[jc:jc + 1, jc, :])
      xs = [None] * n
      for jc in range(n - 1, -1, -1):
        acc = ys[jc]
        for k in range(jc + 1, n):
          acc = acc - l_ref[k:k + 1, jc, :] * xs[k]
        xs[jc] = acc / l_ref[jc:jc + 1, jc, :]
      dx = jnp.concatenate(xs, axis=0)  # (n,BB)

      # parallel linesearch on convex piecewise-quadratic phi
      jd = jmul(dx)
      Md = mmul(dx)
      dMd = _rsum(dx * Md)  # (1,BB)
      xMd = _rsum((x - a0) * Md)

      def phi_gh(alpha):  # alpha (1,BB)
        jar_a = jar + alpha * jd
        f_a, quad_a = forces(jar_a, D, floss, oneside, active_f)
        g = alpha * dMd + xMd - _rsum(f_a * jd)
        h = dMd + _rsum(D * quad_a * jd * jd)
        return g, h

      zero = jnp.zeros_like(dMd)
      g0, h0 = phi_gh(zero)
      a1 = -g0 / jnp.maximum(h0, _EPS)
      a1 = jnp.maximum(a1, 0.0)
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
      for _p in range(2):
        g_p, h_p = phi_gh(alpha)
        alpha = alpha - g_p / jnp.maximum(h_p, _EPS)
      alpha = jnp.maximum(alpha, 0.0)
      x = x + alpha * dx

    jar = jmul(x) - aref
    f, _ = forces(jar, D, floss, oneside, active_f)
    x_ref[:, :] = x
    f_ref[:, :] = f

  return kernel


@functools.partial(jax.jit,
                   static_argnames=('iterations', 'block_b'))
def newton_solve_tpu(M, a0, ws, J, aref, D, floss, active, oneside,
                     iterations: int, block_b: int = _LANES):
  """Batched Newton solve. M (B,n,n), a0/ws (B,n), J (B,nefc,n),
  efc vectors (B,nefc). Returns (qacc (B,n), efc_force (B,nefc))."""
  B, n, _ = M.shape
  nefc = J.shape[1]
  pad = (-B) % block_b
  if pad:
    padm = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), (pad, n, n))
    M = jnp.concatenate([M, padm], 0)
    zn = jnp.zeros((pad, n), M.dtype)
    ze = jnp.zeros((pad, nefc), M.dtype)
    a0 = jnp.concatenate([a0, zn], 0)
    ws = jnp.concatenate([ws, zn], 0)
    J = jnp.concatenate([J, jnp.zeros((pad, nefc, n), M.dtype)], 0)
    aref = jnp.concatenate([aref, ze], 0)
    D = jnp.concatenate([D, ze], 0)
    floss = jnp.concatenate([floss, ze], 0)
    active = jnp.concatenate([active, jnp.zeros((pad, nefc), bool)], 0)
    oneside = jnp.concatenate([oneside, jnp.zeros((pad, nefc), bool)], 0)
  Bp = B + pad

  t3 = lambda x: jnp.transpose(x, (1, 2, 0))
  t2 = lambda x: jnp.transpose(x, (1, 0))
  f32 = lambda x: x.astype(M.dtype)

  kernel = _make_kernel(iterations, n, nefc)
  vspec = lambda shape: pl.BlockSpec(
      shape + (block_b,),
      (lambda i: (0, i)) if len(shape) == 1 else (lambda i: (0, 0, i)),
      memory_space=pltpu.VMEM)
  x_t, f_t = pl.pallas_call(
      kernel,
      grid=(Bp // block_b,),
      in_specs=[
          vspec((n, n)),      # M
          vspec((nefc, n)),   # J
          vspec((nefc,)),     # aref
          vspec((nefc,)),     # D
          vspec((nefc,)),     # floss
          vspec((nefc,)),     # oneside
          vspec((nefc,)),     # active
          vspec((n,)),        # a0
          vspec((n,)),        # ws
      ],
      out_specs=[vspec((n,)), vspec((nefc,))],
      out_shape=[jax.ShapeDtypeStruct((n, Bp), M.dtype),
                 jax.ShapeDtypeStruct((nefc, Bp), M.dtype)],
      scratch_shapes=[pltpu.VMEM((n, n, block_b), M.dtype),
                      pltpu.VMEM((n, n, block_b), M.dtype)],
  )(t3(M), t3(J), t2(aref), t2(D), t2(floss), t2(f32(oneside)),
    t2(f32(active)), t2(a0), t2(ws))
  return jnp.transpose(x_t, (1, 0))[:B], jnp.transpose(f_t, (1, 0))[:B]
