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

import jax
import jax.numpy as jnp

from mjlab_tpu.physics import linalg
from mjlab_tpu.physics.types import Data, Model


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


def solve(m: Model, d: Data, efc) -> Data:
  """Run the Newton solver; returns Data with qacc/qfrc_constraint/efc_force."""
  s = m.stat
  M = d.qM
  a0 = d.qacc_smooth
  J = efc['J']
  aref = efc['aref']

  def cost_of(x):
    return _cost(x, a0, M, J @ x - aref, efc)

  # init: better of warmstart and smooth acceleration
  x_ws = d.qacc_warmstart
  x0 = jnp.where(cost_of(x_ws) < cost_of(a0), x_ws, a0)

  def newton_step(_, x):
    jar = J @ x - aref
    f, quad = _forces(jar, efc)
    grad = M @ (x - a0) - J.T @ f
    Dq = jnp.where(quad, efc['D'], 0.0)
    H = M + (J.T * Dq[None, :]) @ J
    # regularize lightly for numerical safety; M's armature keeps this PD
    H = H + 1e-12 * jnp.eye(H.shape[0], dtype=H.dtype)
    dx = linalg.solve_pd(H, -grad)

    # exact linesearch: phi(a) = C(x + a dx); 1D Newton with static count
    jd = J @ dx
    Md = M @ dx
    dMd = dx @ Md
    xMd = (x - a0) @ Md

    def phi_grad_hess(alpha):
      jar_a = jar + alpha * jd
      f_a, quad_a = _forces(jar_a, efc)
      g = alpha * dMd + xMd - jnp.sum(f_a * jd)
      Dq_a = jnp.where(quad_a, efc['D'], 0.0)
      h = dMd + jnp.sum(Dq_a * jd * jd)
      return g, h

    def ls_body(_, alpha):
      g, h = phi_grad_hess(alpha)
      return alpha - g / jnp.maximum(h, 1e-15)

    alpha = jax.lax.fori_loop(0, s.ls_iterations, ls_body,
                              jnp.zeros((), x.dtype))
    return x + alpha * dx

  x = jax.lax.fori_loop(0, s.iterations, newton_step, x0)

  jar = J @ x - aref
  f, _ = _forces(jar, efc)
  qfrc_constraint = J.T @ f
  return d.replace(
      qacc=x,
      qfrc_constraint=qfrc_constraint,
      efc_force=f,
      solver_niter=jnp.asarray(s.iterations, jnp.int32))
