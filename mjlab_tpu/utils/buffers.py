"""Functional circular buffer for observation history.

The reference's CircularBuffer (reference
src/mjlab/utils/buffers/circular_buffer.py) is a stateful torch ring
buffer; here it is a pytree state + pure functions, jit/vmap friendly.
Semantics preserved: per-env reset, first-append backfill (after a reset,
the first appended frame fills the whole history), LIFO ordering on read
(index 0 = newest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CircularBuffer:
  buf: jax.Array  # (num_envs, max_len, dim)
  ptr: jax.Array  # (num_envs,) int32: index of most recent write
  count: jax.Array  # (num_envs,) int32: number of appends since reset


def create(num_envs: int, max_len: int, dim: int,
           dtype=jnp.float32) -> CircularBuffer:
  return CircularBuffer(
      buf=jnp.zeros((num_envs, max_len, dim), dtype),
      ptr=jnp.zeros(num_envs, jnp.int32),
      count=jnp.zeros(num_envs, jnp.int32),
  )


def reset(cb: CircularBuffer, mask: jax.Array) -> CircularBuffer:
  """Reset envs where mask is True."""
  zero = jnp.zeros_like(cb.ptr)
  return cb.replace(
      ptr=jnp.where(mask, zero, cb.ptr),
      count=jnp.where(mask, zero, cb.count))


def append(cb: CircularBuffer, value: jax.Array) -> CircularBuffer:
  """Append one frame (num_envs, dim). Backfills history on first append."""
  max_len = cb.buf.shape[1]
  new_ptr = jnp.where(cb.count == 0, 0, (cb.ptr + 1) % max_len)
  first = cb.count == 0
  # backfill: first append after reset fills all slots
  filled = jnp.where(first[:, None, None],
                     jnp.broadcast_to(value[:, None, :], cb.buf.shape),
                     cb.buf)
  buf = jax.vmap(lambda b, p, v: b.at[p].set(v))(filled, new_ptr, value)
  return cb.replace(buf=buf, ptr=new_ptr, count=cb.count + 1)


def all_frames(cb: CircularBuffer) -> jax.Array:
  """(num_envs, max_len, dim), ordered oldest -> newest."""
  max_len = cb.buf.shape[1]
  # index j -> (ptr + 1 + j) mod L gives oldest..newest
  idx = (cb.ptr[:, None] + 1 + jnp.arange(max_len)[None, :]) % max_len
  return jax.vmap(lambda b, i: b[i])(cb.buf, idx)


def lag(cb: CircularBuffer, lags: jax.Array) -> jax.Array:
  """LIFO read: lags[i] = 0 is newest frame for env i."""
  max_len = cb.buf.shape[1]
  idx = (cb.ptr - lags) % max_len
  return jax.vmap(lambda b, i: b[i])(cb.buf, idx)
