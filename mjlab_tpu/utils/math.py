"""Task-level batched math utilities (quaternions, frames, samplers).

JAX re-implementation of the math surface the reference vendors from Isaac
Lab (reference src/mjlab/third_party/isaaclab/isaaclab/utils/math.py) and
uses in every MDP term. Quaternions are (w, x, y, z); all functions are
batched over leading axes. Samplers take explicit PRNG keys (the TPU-native
replacement for torch's global RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.physics.math import (  # noqa: F401  (re-exported)
    axis_angle_to_quat,
    mat_to_quat,
    mul_quat as quat_mul,
    neg_quat as quat_conjugate,
    normalize_quat as quat_normalize,
    quat_to_mat as matrix_from_quat,
    rot_vec_quat,
    rot_vec_quat_inv,
)


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector(s) v by quaternion(s) q (isaaclab argument order)."""
  return rot_vec_quat(v, q)


def quat_apply_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
  return rot_vec_quat_inv(v, q)


# aliases matching the reference naming
quat_rotate = quat_apply
quat_rotate_inverse = quat_apply_inverse


def quat_inv(q: jax.Array) -> jax.Array:
  return quat_conjugate(quat_normalize(q))


def quat_from_euler_xyz(roll, pitch, yaw) -> jax.Array:
  """Intrinsic XYZ euler angles -> quaternion."""
  cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
  cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
  cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
  return jnp.stack([
      cy * cp * cr + sy * sp * sr,
      cy * cp * sr - sy * sp * cr,
      cy * sp * cr + sy * cp * sr,
      sy * cp * cr - cy * sp * sr,
  ], axis=-1)


def euler_xyz_from_quat(q: jax.Array):
  """Quaternion -> (roll, pitch, yaw) intrinsic XYZ."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
  pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
  yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
  return roll, pitch, yaw


def yaw_quat(q: jax.Array) -> jax.Array:
  """Extract the yaw-only component of a quaternion."""
  w, z = q[..., 0], q[..., 3]
  norm = jnp.sqrt(jnp.maximum(w * w + z * z, 1e-12))
  out = jnp.zeros_like(q)
  out = out.at[..., 0].set(w / norm)
  out = out.at[..., 3].set(z / norm)
  return out


def quat_error_magnitude(q1: jax.Array, q2: jax.Array) -> jax.Array:
  """Rotation angle between two quaternions."""
  dq = quat_mul(q1, quat_conjugate(q2))
  sin_half = jnp.linalg.norm(dq[..., 1:], axis=-1)
  cos_half = jnp.abs(dq[..., 0])
  return 2.0 * jnp.arctan2(sin_half, cos_half)


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
  """Spherical interpolation, shortest arc."""
  d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
  q1 = jnp.where(d < 0, -q1, q1)
  d = jnp.abs(d)
  theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
  sin_t = jnp.sin(theta)
  t = jnp.asarray(t)[..., None] if jnp.ndim(t) else t
  w0 = jnp.where(sin_t > 1e-6, jnp.sin((1 - t) * theta) / jnp.maximum(sin_t, 1e-12), 1 - t)
  w1 = jnp.where(sin_t > 1e-6, jnp.sin(t * theta) / jnp.maximum(sin_t, 1e-12), t)
  return quat_normalize(w0 * q0 + w1 * q1)


def quat_box_minus(q1: jax.Array, q2: jax.Array) -> jax.Array:
  """3D rotation vector taking q2 to q1 (log map)."""
  dq = quat_mul(quat_conjugate(q2), q1)
  dq = jnp.where(dq[..., :1] < 0, -dq, dq)
  sin_half = jnp.linalg.norm(dq[..., 1:], axis=-1)
  angle = 2.0 * jnp.arctan2(sin_half, dq[..., 0])
  axis = dq[..., 1:] / jnp.maximum(sin_half, 1e-12)[..., None]
  return jnp.where((sin_half > 1e-7)[..., None], axis * angle[..., None],
                   2.0 * dq[..., 1:])


def combine_frame_transforms(p1, q1, p2=None, q2=None):
  """T_world = T1 * T2: compose (p1, q1) with child offset (p2, q2)."""
  if p2 is None:
    p = p1
  else:
    p = p1 + quat_apply(q1, p2)
  if q2 is None:
    q = q1
  else:
    q = quat_mul(q1, q2)
  return p, q


def subtract_frame_transforms(p1, q1, p2=None, q2=None):
  """T_12 = T1^-1 * T2: express frame 2 in frame 1."""
  q1_inv = quat_conjugate(q1)
  if p2 is None:
    p = quat_apply(q1_inv, -p1)
  else:
    p = quat_apply(q1_inv, p2 - p1)
  if q2 is None:
    q = q1_inv
  else:
    q = quat_mul(q1_inv, q2)
  return p, q


def wrap_to_pi(angle: jax.Array) -> jax.Array:
  return jnp.mod(angle + jnp.pi, 2 * jnp.pi) - jnp.pi


def sample_uniform(key, lo, hi, shape, dtype=jnp.float32):
  return jax.random.uniform(key, shape, dtype=dtype,
                            minval=lo, maxval=hi)


def sample_log_uniform(key, lo, hi, shape, dtype=jnp.float32):
  llo, lhi = jnp.log(lo), jnp.log(hi)
  return jnp.exp(jax.random.uniform(key, shape, dtype=dtype,
                                    minval=llo, maxval=lhi))


def sample_gaussian(key, mean, std, shape, dtype=jnp.float32):
  return mean + std * jax.random.normal(key, shape, dtype=dtype)
