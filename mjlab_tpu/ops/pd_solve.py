"""Batched small-SPD solve as one Pallas TPU kernel.

The Newton contact solver factors a per-env (nv x nv) Hessian every
iteration (nv ~ 12-40). Expressed in jax.numpy this unrolls to ~400 tiny
HLO ops whose fixed per-op overhead dominates the substep (measured:
~3.3 ms per Newton iteration at 4096 G1 envs, ~80%% of the physics step).
This kernel runs the whole Cholesky factorization + two triangular solves
as ONE fused op with a structure-of-arrays layout: the batch lives on the
128-lane axis, so every scalar of the n^2 recursion is a 128-wide VPU
vector op and all intermediates stay in VMEM/registers.

Layout: H is passed as (n, n, B) and g as (n, B); the wrapper transposes
from the engine's (B, n, n) and pads B to the 128-lane block size.

The public entry `solve_pd` is a jax.custom_batching.custom_vmap wrapper:
unbatched calls (and non-TPU backends, e.g. the float64 CPU oracle tests)
fall back to the unrolled jax.numpy path in physics/linalg.py; a vmapped
call on TPU dispatches here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mjlab_tpu.physics import linalg as _linalg

_LANES = 128
_EPS = 1e-12


def _pd_solve_kernel(h_ref, g_ref, x_ref, l_ref):
  """h_ref: (n, n, BB) SPD matrices; g_ref: (n, BB); x_ref out (n, BB);
  l_ref: (n, n, BB) VMEM scratch for the Cholesky factor."""
  n = h_ref.shape[0]

  # --- Cholesky, column by column (unrolled; all ops are (*, BB) vectors)
  for j in range(n):
    if j:
      acc = jnp.sum(l_ref[:, :j, :] * l_ref[j, :j, :][None, :, :], axis=1)
      col = h_ref[:, j, :] - acc
    else:
      col = h_ref[:, j, :]
    d = jnp.sqrt(jnp.maximum(col[j, :], _EPS))  # (BB,)
    l_ref[:, j, :] = col / d[None, :]

  # --- forward solve L y = g (y_k kept in registers)
  ys = []
  for j in range(n):
    acc = g_ref[j, :]
    for k in range(j):
      acc = acc - l_ref[j, k, :] * ys[k]
    ys.append(acc / l_ref[j, j, :])

  # --- back solve L^T x = y
  xs = [None] * n
  for j in range(n - 1, -1, -1):
    acc = ys[j]
    for k in range(j + 1, n):
      acc = acc - l_ref[k, j, :] * xs[k]
    xs[j] = acc / l_ref[j, j, :]

  x_ref[:, :] = jnp.stack(xs, axis=0)


@functools.partial(jax.jit, static_argnames=('block_b',))
def _pd_solve_tpu(H: jax.Array, g: jax.Array, block_b: int = _LANES):
  """H: (B, n, n) SPD, g: (B, n) -> x: (B, n) with H x = g."""
  B, n, _ = H.shape
  pad = (-B) % block_b
  if pad:
    H = jnp.concatenate(
        [H, jnp.broadcast_to(jnp.eye(n, dtype=H.dtype), (pad, n, n))], 0)
    g = jnp.concatenate([g, jnp.zeros((pad, n), g.dtype)], 0)
  Bp = B + pad
  Ht = jnp.transpose(H, (1, 2, 0))  # (n, n, Bp)
  gt = jnp.transpose(g, (1, 0))  # (n, Bp)

  xt = pl.pallas_call(
      _pd_solve_kernel,
      grid=(Bp // block_b,),
      in_specs=[
          pl.BlockSpec((n, n, block_b), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, block_b), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((n, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, Bp), H.dtype),
      scratch_shapes=[pltpu.VMEM((n, n, block_b), H.dtype)],
  )(Ht, gt)
  return jnp.transpose(xt, (1, 0))[:B]


def _use_pallas(dtype) -> bool:
  return (jax.default_backend() == 'tpu'
          and dtype in (jnp.float32, jnp.dtype('float32')))


@jax.custom_batching.custom_vmap
def solve_pd(H: jax.Array, g: jax.Array) -> jax.Array:
  """Solve H x = g for SPD H (n, n). Batched calls on TPU run the Pallas
  kernel; everything else uses the unrolled jax.numpy path."""
  return _linalg.solve_pd(H, g)


@solve_pd.def_vmap
def _solve_pd_vmap(axis_size, in_batched, H, g):
  h_b, g_b = in_batched
  if not h_b or not g_b:
    # model batched but not data (or vice versa) — broadcast and recurse
    H = H if h_b else jnp.broadcast_to(H, (axis_size,) + H.shape)
    g = g if g_b else jnp.broadcast_to(g, (axis_size,) + g.shape)
  if H.ndim == 3 and _use_pallas(H.dtype):
    return _pd_solve_tpu(H, g), True
  return jax.vmap(_linalg.solve_pd)(H, g), True
