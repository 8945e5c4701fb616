"""Newton constraint solver (primal, acceleration space).

Implements MuJoCo's Newton solver: minimize over qacc
    C(x) = 0.5 (x - a_smooth)^T M (x - a_smooth) + sum_i s_i(J_i x - aref_i)
with one-sided quadratic costs for limits/contacts (pyramidal cone) and
Huber costs for dof friction loss. Each Newton step assembles the exact
Hessian M + J^T diag(D_active) J, solves by dense Cholesky, and runs an
exact linesearch (1D Newton on the convex piecewise-quadratic phi(alpha)).

TPU notes: everything is fixed-shape; iteration counts are static
(model.stat.iterations / ls_iterations, matching the reference's
iterations=10, ls_iterations=20 at scale, reference
src/mjlab/tasks/velocity/velocity_env_cfg.py:248-256). Batched over envs by
vmap, the Cholesky/GEMM inner ops become large batched MXU calls. The
per-env early-exit the GPU reference relies on is replaced by running a
fixed iteration count, which is the lockstep-friendly choice on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from mjlab_tpu.ops.pd_solve import solve_pd as _solve_pd
from mjlab_tpu.physics.types import Data, Model

_MEGA_KERNEL = os.environ.get('MJLAB_NEWTON_KERNEL', '0') == '1'


def _forces(jar, efc):
  """Row forces f_i = -s'_i(jar_i) and quadratic-zone mask."""
  D = efc['D']
  floss = efc['frictionloss']
  oneside = efc['oneside']
  is_fric = floss > 0

  # one-sided rows
  f_one = jnp.where(jar < 0, -D * jar, 0.0)
  quad_one = jar < 0
  # friction (Huber) rows
  f_fric = -jnp.clip(D * jar, -floss, floss)
  quad_fric = jnp.abs(D * jar) < floss

  f = jnp.where(oneside, f_one, jnp.where(is_fric, f_fric, 0.0))
  quad = jnp.where(oneside, quad_one, jnp.where(is_fric, quad_fric, False))
  quad = quad & efc['active']
  f = jnp.where(efc['active'], f, 0.0)
  return f, quad


def _cost(x, a0, M, jar, efc):
  D = efc['D']
  floss = efc['frictionloss']
  oneside = efc['oneside']
  is_fric = floss > 0
  quad = 0.5 * D * jar * jar
  lin = floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, 1e-15)
  s_one = jnp.where(jar < 0, quad, 0.0)
  s_fric = jnp.where(jnp.abs(D * jar) < floss, quad, lin)
  s = jnp.where(oneside, s_one, jnp.where(is_fric, s_fric, 0.0))
  s = jnp.where(efc['active'], s, 0.0)
  dx = x - a0
  return 0.5 * dx @ (M @ dx) + jnp.sum(s)


@functools.lru_cache(maxsize=None)
def _newton_fn(iterations: int):
  """custom_vmap Newton solve: the vmapped TPU path runs the whole solver
  as one Pallas kernel (ops/newton.py); unbatched / non-TPU calls use the
  pure jax.numpy implementation below."""

  @jax.custom_batching.custom_vmap
  def fn(M, a0, ws, J, aref, D, floss, active, oneside):
    return _newton_jax(M, a0, ws, J, aref, D, floss, active, oneside,
                       iterations)

  @fn.def_vmap
  def _rule(axis_size, in_batched, *args):  # noqa: ANN001
    args = tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched))
    M = args[0]
    if (M.ndim == 3 and jax.default_backend() == 'tpu'
        and M.dtype == jnp.float32 and _MEGA_KERNEL):
      # whole-solver Pallas kernel: measured slightly slower than the
      # vmapped path + fused pd-solve below at 4096 G1 envs (VMEM
      # bandwidth on Hessian-assembly transients); kept selectable via
      # MJLAB_NEWTON_KERNEL=1 for larger models where it wins
      from mjlab_tpu.ops.newton import newton_solve_tpu
      out = newton_solve_tpu(*args, iterations=iterations)
    else:
      out = jax.vmap(lambda *a: _newton_jax(*a, iterations))(*args)
    return out, (True, True)

  return fn


def _newton_jax(M, a0, ws, J, aref, D, floss, active, oneside, iterations):
  """Single-env Newton solve -> (qacc, efc_force). Reference jax.numpy
  path (used by the float64 CPU oracle tests and as the custom_vmap
  fallback)."""
  efc = {'J': J, 'aref': aref, 'D': D, 'frictionloss': floss,
         'active': active, 'oneside': oneside}

  def cost_of(x):
    return _cost(x, a0, M, J @ x - aref, efc)

  x0 = jnp.where(cost_of(ws) < cost_of(a0), ws, a0)

  def newton_step(_, x):
    jar = J @ x - aref
    f, quad = _forces(jar, efc)
    grad = M @ (x - a0) - J.T @ f
    Dq = jnp.where(quad, efc['D'], 0.0)
    H = M + (J.T * Dq[None, :]) @ J
    # regularize lightly for numerical safety; M's armature keeps this PD
    H = H + 1e-12 * jnp.eye(H.shape[0], dtype=H.dtype)
    # one fused Pallas op when vmapped on TPU (ops/pd_solve.py);
    # unrolled jax.numpy path elsewhere (CPU float64 oracle tests)
    dx = _solve_pd(H, -grad)

    # exact linesearch: phi(a) = C(x + a dx); 1D Newton with static count
    jd = J @ dx
    Md = M @ dx
    dMd = dx @ Md
    xMd = (x - a0) @ Md

    def phi_grad_hess(alpha):
      """phi'(alpha), phi''(alpha) for scalar or (K,) alpha; phi is convex
      piecewise-quadratic so phi' is increasing piecewise-linear."""
      jar_a = jar[..., None, :] * jnp.ones_like(alpha)[..., None] \
          + alpha[..., None] * jd[..., None, :] \
          if alpha.ndim else jar + alpha * jd
      f_a, quad_a = _forces(jar_a, efc)
      g = alpha * dMd + xMd - jnp.sum(f_a * jd, axis=-1)
      Dq_a = jnp.where(quad_a, efc['D'], 0.0)
      h = dMd + jnp.sum(Dq_a * jd * jd, axis=-1)
      return g, h

    # Parallel linesearch (the TPU analog of mjwarp's ls_parallel,
    # reference src/mjlab/sim/sim.py:89): phi' is increasing and piecewise
    # linear, so (1) take the unconstrained Newton step from 0, (2) probe a
    # geometric grid around it IN ONE vectorized evaluation, (3) secant
    # between the bracketing grid points (exact within a linear piece),
    # (4) a couple of scalar Newton polish steps. Sequential depth ~5
    # instead of ls_iterations(=20) dependent steps.
    g0, h0 = phi_grad_hess(jnp.zeros((), x.dtype))
    a1 = -g0 / jnp.maximum(h0, 1e-15)
    scales = jnp.asarray([0.0, 0.125, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 4.0,
                          8.0], x.dtype)
    grid = a1 * scales
    gg, _ = phi_grad_hess(grid)
    # largest grid point with g<=0 (root lies at or right of it)
    neg = gg <= 0.0
    lo_idx = jnp.argmax(jnp.where(neg, scales, -1.0))
    lo = grid[lo_idx]
    g_lo = gg[lo_idx]
    # smallest grid point with g>0
    pos = gg > 0.0
    hi_idx = jnp.argmin(jnp.where(pos, scales, jnp.inf))
    any_pos = jnp.any(pos)
    hi = jnp.where(any_pos, grid[hi_idx], grid[-1])
    g_hi = jnp.where(any_pos, gg[hi_idx], gg[-1])
    denom = g_hi - g_lo
    alpha = jnp.where(jnp.abs(denom) > 1e-15,
                      lo - g_lo * (hi - lo) / jnp.where(
                          jnp.abs(denom) > 1e-15, denom, 1.0),
                      lo)
    # when even 8x overshoot stays descent, accept the farthest point
    alpha = jnp.where(any_pos, alpha, grid[-1])

    def polish(_, a):
      g, h = phi_grad_hess(a)
      return a - g / jnp.maximum(h, 1e-15)

    alpha = jax.lax.fori_loop(0, 2, polish, alpha)
    alpha = jnp.maximum(alpha, 0.0)
    return x + alpha * dx

  x = jax.lax.fori_loop(0, iterations, newton_step, x0)

  jar = J @ x - aref
  f, _ = _forces(jar, efc)
  return x, f


def solve(m: Model, d: Data, efc) -> Data:
  """Run the Newton solver; returns Data with qacc/qfrc_constraint/efc_force."""
  s = m.stat
  fn = _newton_fn(int(s.iterations))
  x, f = fn(d.qM, d.qacc_smooth, d.qacc_warmstart, efc['J'], efc['aref'],
            efc['D'], efc['frictionloss'], efc['active'], efc['oneside'])
  qfrc_constraint = efc['J'].T @ f
  return d.replace(
      qacc=x,
      qfrc_constraint=qfrc_constraint,
      efc_force=f,
      solver_niter=jnp.asarray(s.iterations, jnp.int32))
