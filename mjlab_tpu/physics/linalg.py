"""Small dense linear algebra, unrolled for XLA/TPU.

XLA's LAPACK-style `jnp.linalg.cholesky` / `solve_triangular` lower to
blocked while-loops that are extremely slow for many tiny matrices (the
nv x nv mass/Hessian systems here, nv ~ 12-40, batched over thousands of
envs). These unrolled column-wise implementations compile to straight-line
elementwise/matvec code the TPU vectorizes across the batch - the single
biggest throughput lever in the engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky(a: jax.Array) -> jax.Array:
  """Lower Cholesky factor of SPD matrix a: (..., n, n), unrolled over n."""
  n = a.shape[-1]
  L = jnp.zeros_like(a)
  for j in range(n):
    row = L[..., j, :]  # columns < j are filled, rest zeros
    d = jnp.sqrt(jnp.maximum(a[..., j, j] - jnp.sum(row * row, -1), 1e-12))
    L = L.at[..., j, j].set(d)
    if j + 1 < n:
      below = (a[..., j + 1:, j]
               - jnp.einsum('...ik,...k->...i', L[..., j + 1:, :], row))
      L = L.at[..., j + 1:, j].set(below / d[..., None])
  return L


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
  """Solve L x = b with lower-triangular L, unrolled forward substitution."""
  n = L.shape[-1]
  x = jnp.zeros_like(b)
  for i in range(n):
    xi = (b[..., i] - jnp.sum(L[..., i, :] * x, -1)) / L[..., i, i]
    x = x.at[..., i].set(xi)
  return x


def solve_upper_t(L: jax.Array, b: jax.Array) -> jax.Array:
  """Solve L^T x = b (back substitution with the lower factor)."""
  n = L.shape[-1]
  x = jnp.zeros_like(b)
  for i in range(n - 1, -1, -1):
    xi = (b[..., i] - jnp.sum(L[..., :, i] * x, -1)) / L[..., i, i]
    x = x.at[..., i].set(xi)
  return x


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b given lower Cholesky factor L of A."""
  return solve_upper_t(L, solve_lower(L, b))


def solve_pd(a: jax.Array, b: jax.Array) -> jax.Array:
  """Solve SPD system a x = b via unrolled Cholesky."""
  return cho_solve(cholesky(a), b)
