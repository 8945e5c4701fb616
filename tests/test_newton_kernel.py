"""Whole-solver Pallas kernel vs XLA-path equivalence (interpret mode).

The mega-kernel (ops/newton.py) normally runs only on real TPUs; Pallas
interpret mode executes the same kernel body as pure JAX on CPU, so the
structured-block math — including the lower-triangle-only Hessian build
and Cholesky — is regression-tested against the vmapped reference path
(physics/solver.py) at small shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mjlab_tpu.ops.newton import newton_solve_tpu
from mjlab_tpu.physics import solver as S


def _random_problem(B, n, ncr, nl, seed=0, dtype=np.float32):
  rng = np.random.default_rng(seed)
  A = rng.normal(size=(B, n, n)).astype(dtype) * 0.1
  M = A @ np.transpose(A, (0, 2, 1)) + np.eye(n, dtype=dtype) * 2.0
  a0 = rng.normal(size=(B, n)).astype(dtype)
  ws = a0 + 0.01 * rng.normal(size=(B, n)).astype(dtype)
  cJ = rng.normal(size=(B, ncr, n)).astype(dtype) * 0.5
  c_aref = rng.normal(size=(B, ncr)).astype(dtype)
  cD = np.abs(rng.normal(size=(B, ncr))).astype(dtype) * 20
  c_act = (rng.random(size=(B, ncr)) < 0.5).astype(dtype)
  l_sign = np.sign(rng.normal(size=(B, nl))).astype(dtype)
  l_aref = rng.normal(size=(B, nl)).astype(dtype)
  lD = np.abs(rng.normal(size=(B, nl))).astype(dtype) * 50
  l_act = (rng.random(size=(B, nl)) < 0.4).astype(dtype)
  f_aref = rng.normal(size=(B, n)).astype(dtype) * 0.1
  fD = np.abs(rng.normal(size=(B, n))).astype(dtype) * 30
  floss = np.abs(rng.normal(size=(B, n))).astype(dtype) * 2
  f_act = (rng.random(size=(B, n)) < 0.5).astype(dtype)
  return tuple(jnp.asarray(x) for x in
               (M, a0, ws, cJ, c_aref, cD, c_act, l_sign, l_aref, lD,
                l_act, f_aref, fD, floss, f_act))


@pytest.mark.parametrize('seed', [0, 3])
def test_kernel_matches_xla_path(seed):
  B, n, ncr, nl = 128, 9, 12, 4
  ldof = (2, 4, 6, 8)
  args = _random_problem(B, n, ncr, nl, seed=seed)
  # 12 Newton iterations converge this well-conditioned synthetic to
  # f32 roundoff (was 25; trimmed for suite wall time, VERDICT r4 #7)
  iters, polish = 12, 3

  outk = newton_solve_tpu(*args, iterations=iters, ls_polish=polish,
                          ldof=ldof, interpret=True)
  ldof_np = np.asarray(ldof, np.int32)
  # XLA path takes boolean activity masks (kernel takes float 0/1)
  xargs = list(args)
  for i in (6, 10, 14):
    xargs[i] = args[i].astype(bool)
  xfn = jax.jit(jax.vmap(
      lambda *a: S._newton_jax(*a, iters, polish, ldof_np, 0)))
  outx = xfn(*xargs)

  # both paths minimize the same strictly convex objective; near
  # convergence the iterates agree to f32 roundoff amplified by the
  # conditioning, not bitwise
  for name, k, x in zip(('qacc', 'ff', 'fl', 'fc'), outk, outx):
    k, x = np.asarray(k), np.asarray(x)
    scale = np.max(np.abs(x)) + 1.0
    np.testing.assert_allclose(k / scale, x / scale, atol=2e-4,
                               err_msg=name)


def test_kernel_early_exit_matches_full_run():
  """grad_th > 0 (MuJoCo-style convergence termination + per-lane freeze)
  must return the same minimizer as the full fixed-iteration run: frozen
  lanes stop exactly at the tolerance, so differences are bounded by it."""
  B, n, ncr, nl = 128, 9, 12, 4
  ldof = (2, 4, 6, 8)
  args = _random_problem(B, n, ncr, nl, seed=1)
  full = newton_solve_tpu(*args, iterations=8, ls_polish=3, ldof=ldof,
                          interpret=True)
  early = newton_solve_tpu(*args, iterations=8, ls_polish=3, ldof=ldof,
                           interpret=True, grad_th=1e-5)
  for name, f, e in zip(('qacc', 'ff', 'fl', 'fc'), full, early):
    f, e = np.asarray(f), np.asarray(e)
    scale = np.max(np.abs(f)) + 1.0
    np.testing.assert_allclose(e / scale, f / scale, atol=1e-4,
                               err_msg=name)


def test_kernel_pads_ragged_batch():
  """B not a multiple of the 128-lane block: padded lanes must not
  corrupt real outputs."""
  B, n, ncr, nl = 100, 7, 8, 3
  ldof = (1, 3, 5)
  args_full = _random_problem(128, n, ncr, nl, seed=7)
  args = tuple(a[:B] for a in args_full)
  # padding correctness is iteration-count independent; keep it cheap
  out_small = newton_solve_tpu(*args, iterations=4, ls_polish=1,
                               ldof=ldof, interpret=True)
  out_full = newton_solve_tpu(*args_full, iterations=4, ls_polish=1,
                              ldof=ldof, interpret=True)
  for k, x in zip(out_small, out_full):
    np.testing.assert_allclose(np.asarray(k), np.asarray(x)[:B],
                               rtol=0, atol=0)
