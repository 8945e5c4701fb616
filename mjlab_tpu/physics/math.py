"""Quaternion and spatial-vector math for the batched TPU physics engine.

Conventions follow MuJoCo: quaternions are (w, x, y, z); spatial motion
vectors are 6-vectors (angular[3], linear[3]); spatial force vectors are
(torque[3], force[3]). All functions are written for single (unbatched)
inputs and rely on `jax.vmap` for batching, but most are shape-polymorphic
over leading axes anyway.

This module replaces the role of mujoco's mju_* math utilities in the
reference stack (see reference src/mjlab/third_party/isaaclab/utils/math.py
for the task-level math, which lives in mjlab_tpu/utils/math.py instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion ops (w, x, y, z)
# ---------------------------------------------------------------------------


def mul_quat(a: jax.Array, b: jax.Array) -> jax.Array:
  """Hamilton product a*b. Supports leading batch dims."""
  aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
  bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
  return jnp.stack(
      [
          aw * bw - ax * bx - ay * by - az * bz,
          aw * bx + ax * bw + ay * bz - az * by,
          aw * by - ax * bz + ay * bw + az * bx,
          aw * bz + ax * by - ay * bx + az * bw,
      ],
      axis=-1,
  )


def neg_quat(q: jax.Array) -> jax.Array:
  """Conjugate (inverse for unit quaternions)."""
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize_quat(q: jax.Array) -> jax.Array:
  norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
  return jnp.where(norm > 1e-12, q / jnp.maximum(norm, 1e-12),
                   jnp.zeros_like(q).at[..., 0].set(1.0))


def rot_vec_quat(v: jax.Array, q: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (active rotation)."""
  w = q[..., :1]
  u = q[..., 1:]
  # v' = v + 2*w*(u x v) + 2*u x (u x v)
  uv = jnp.cross(u, v)
  return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rot_vec_quat_inv(v: jax.Array, q: jax.Array) -> jax.Array:
  """Rotate vector v by the inverse of quaternion q."""
  return rot_vec_quat(v, neg_quat(q))


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix. Batched over leading dims."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
      [
          1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
          2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
          2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
      ],
      axis=-1,
  )
  return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> unit quaternion (w,x,y,z). Branchless."""
  tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
  # Four candidate constructions; pick numerically-best via argmax.
  qw = jnp.stack(
      [
          1.0 + tr,
          1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
          1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
          1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
      ],
      axis=-1,
  )
  case = jnp.argmax(qw, axis=-1)
  s = jnp.sqrt(jnp.maximum(jnp.take_along_axis(qw, case[..., None], -1)[..., 0], 1e-12)) * 2.0

  def build(i):
    if i == 0:
      return jnp.stack([
          0.25 * s,
          (m[..., 2, 1] - m[..., 1, 2]) / s,
          (m[..., 0, 2] - m[..., 2, 0]) / s,
          (m[..., 1, 0] - m[..., 0, 1]) / s,
      ], axis=-1)
    if i == 1:
      return jnp.stack([
          (m[..., 2, 1] - m[..., 1, 2]) / s,
          0.25 * s,
          (m[..., 0, 1] + m[..., 1, 0]) / s,
          (m[..., 0, 2] + m[..., 2, 0]) / s,
      ], axis=-1)
    if i == 2:
      return jnp.stack([
          (m[..., 0, 2] - m[..., 2, 0]) / s,
          (m[..., 0, 1] + m[..., 1, 0]) / s,
          0.25 * s,
          (m[..., 1, 2] + m[..., 2, 1]) / s,
      ], axis=-1)
    return jnp.stack([
        (m[..., 1, 0] - m[..., 0, 1]) / s,
        (m[..., 0, 2] + m[..., 2, 0]) / s,
        (m[..., 1, 2] + m[..., 2, 1]) / s,
        0.25 * s,
    ], axis=-1)

  cands = jnp.stack([build(i) for i in range(4)], axis=-2)
  q = jnp.take_along_axis(cands, case[..., None, None], axis=-2)[..., 0, :]
  # Canonical sign: w >= 0.
  q = jnp.where(q[..., :1] < 0, -q, q)
  return normalize_quat(q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Axis (unit) + angle -> quaternion."""
  half = angle * 0.5
  s = jnp.sin(half)
  return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_integrate(q: jax.Array, vel: jax.Array, dt) -> jax.Array:
  """Integrate unit quaternion by angular velocity (local frame), mimicking
  mju_quatIntegrate: q <- q * exp(vel*dt/2)."""
  angle = jnp.linalg.norm(vel, axis=-1)
  # Safe axis.
  axis = vel / jnp.maximum(angle, 1e-12)[..., None]
  dq = axis_angle_to_quat(axis, angle * dt)
  dq = jnp.where((angle > 1e-12)[..., None], dq,
                 jnp.zeros_like(dq).at[..., 0].set(1.0))
  return normalize_quat(mul_quat(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity-space difference: 3D rotational velocity that takes qb to qa
  in unit time (mju_subQuat semantics, expressed in qb's local frame)."""
  q = mul_quat(neg_quat(qb), qa)
  q = jnp.where(q[..., :1] < 0, -q, q)
  sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
  angle = 2.0 * jnp.arctan2(sin_half, q[..., 0])
  axis = q[..., 1:] / jnp.maximum(sin_half, 1e-12)[..., None]
  return jnp.where((sin_half > 1e-12)[..., None], axis * angle[..., None],
                   2.0 * q[..., 1:])


# ---------------------------------------------------------------------------
# Spatial algebra (MuJoCo 6-vector layout: [angular, linear])
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
  """Spatial motion cross product v x u (mju_crossMotion).

  v, u: (..., 6) motion vectors (ang, lin).
  """
  vang, vlin = v[..., :3], v[..., 3:]
  uang, ulin = u[..., :3], u[..., 3:]
  ang = jnp.cross(vang, uang)
  lin = jnp.cross(vang, ulin) + jnp.cross(vlin, uang)
  return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial force cross product v x* f (mju_crossForce).

  v: (..., 6) motion, f: (..., 6) force (torque, force).
  """
  vang, vlin = v[..., :3], v[..., 3:]
  ftrq, ffrc = f[..., :3], f[..., 3:]
  trq = jnp.cross(vang, ftrq) + jnp.cross(vlin, ffrc)
  frc = jnp.cross(vang, ffrc)
  return jnp.concatenate([trq, frc], axis=-1)


def transform_motion(vec: jax.Array, offset: jax.Array,
                     rotnew2old: jax.Array | None = None) -> jax.Array:
  """Transform a motion vector between frames (mju_transformSpatial, force=0).

  offset: newpos - oldpos (in the common orientation frame). If rotnew2old is
  given (3x3), also rotate from old to new frame.
  """
  ang, lin = vec[..., :3], vec[..., 3:]
  # Translate: lin_new = lin - offset x ang; ang unchanged.
  lin = lin - jnp.cross(offset, ang)
  if rotnew2old is not None:
    ang = jnp.einsum('...ji,...j->...i', rotnew2old, ang)
    lin = jnp.einsum('...ji,...j->...i', rotnew2old, lin)
  return jnp.concatenate([ang, lin], axis=-1)


def transform_force(vec: jax.Array, offset: jax.Array) -> jax.Array:
  """Translate a spatial force vector: trq_new = trq - offset x frc."""
  trq, frc = vec[..., :3], vec[..., 3:]
  trq = trq - jnp.cross(offset, frc)
  return jnp.concatenate([trq, frc], axis=-1)


def inert_mul(inert_mat: jax.Array, v: jax.Array) -> jax.Array:
  """Multiply 6x6 spatial inertia by motion vector -> force vector."""
  return jnp.einsum('...ij,...j->...i', inert_mat, v)


def spatial_inertia(mass: jax.Array, inertia_mat: jax.Array,
                    com_offset: jax.Array) -> jax.Array:
  """Build 6x6 spatial inertia about a frame displaced by -com_offset from
  the COM, with rotational inertia `inertia_mat` (3x3, about COM, in the
  frame's orientation) and mass.

  Layout matches the (ang, lin) motion convention:
    f = [I*w + h x v ; m*v - h x w],  h = m * com_offset.
  """
  m = mass[..., None, None]
  h = mass[..., None] * com_offset
  hhat = hat(h)
  eye = jnp.broadcast_to(jnp.eye(3, dtype=h.dtype), hhat.shape)
  icom = inertia_mat + (hhat @ hhat.swapaxes(-1, -2)) / jnp.maximum(m, 1e-12)
  top = jnp.concatenate([icom, hhat], axis=-1)
  bot = jnp.concatenate([-hhat, m * eye], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


def hat(v: jax.Array) -> jax.Array:
  """Skew-symmetric cross-product matrix."""
  x, y, z = v[..., 0], v[..., 1], v[..., 2]
  zero = jnp.zeros_like(x)
  m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
  return m.reshape(v.shape[:-1] + (3, 3))


def closest_segment_point(a: jax.Array, b: jax.Array, pt: jax.Array) -> jax.Array:
  """Closest point on segment [a,b] to pt."""
  ab = b - a
  t = jnp.dot(pt - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
  return a + jnp.clip(t, 0.0, 1.0) * ab


def closest_segment_segment(a0, a1, b0, b1):
  """Closest points between two segments. Returns (pa, pb)."""
  d1 = a1 - a0
  d2 = b1 - b0
  r = a0 - b0
  A = jnp.dot(d1, d1)
  e = jnp.dot(d2, d2)
  f = jnp.dot(d2, r)
  c = jnp.dot(d1, r)
  b = jnp.dot(d1, d2)
  denom = A * e - b * b
  s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0, 1), 0.0)
  t = (b * s + f) / jnp.maximum(e, 1e-12)
  t_clamped = jnp.clip(t, 0.0, 1.0)
  s = jnp.clip((b * t_clamped - c) / jnp.maximum(A, 1e-12), 0.0, 1.0)
  pa = a0 + d1 * s
  pb = b0 + d2 * t_clamped
  return pa, pb


def make_tangent_frame(normal: jax.Array) -> jax.Array:
  """Build contact frame rows (normal, tangent1, tangent2) from a unit
  normal, matching mju_makeFrame: y-candidate is (0,1,0) when |n_z|>0.9
  else (0,0,1), Gram-Schmidt orthogonalized, then t2 = n x t1."""
  n = normal
  near_z = jnp.abs(n[..., 2]) > 0.9
  ref = jnp.where(near_z[..., None],
                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape))
  t1 = ref - n * jnp.sum(n * ref, axis=-1, keepdims=True)
  t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2], axis=-2)
