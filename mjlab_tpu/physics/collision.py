"""Narrowphase collision over a static pair table.

Broadphase is resolved at model-build time (contype/conaffinity + body
exclusion rules -> static pair lists grouped by collider function, see
io._build_pairs). At runtime each group is processed as one vectorized
narrowphase call producing a fixed number of candidate contacts per pair;
inactive candidates keep dist > includemargin and are masked out of the
constraint assembly. This is the TPU analog of the reference's
nconmax-padded contact buffers (reference src/mjlab/sim/sim.py:87-88) with
the broad phase hoisted to compile time.

Contact conventions match MuJoCo: normal points from geom1 into geom2,
dist < 0 means penetration, pos is the midpoint between surfaces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics import math as pmath
from mjlab_tpu.physics.types import Data, GeomType, Model

_MJMINVAL = 1e-15


# ---------------------------------------------------------------------------
# Primitive narrowphase functions. Each takes per-pair geometry arrays and
# returns (dist, pos, normal) with a fixed number of points per pair:
# shapes (n, k), (n, k, 3), (n, k, 3).
# ---------------------------------------------------------------------------


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  r = s2[..., 0]
  cdist = jnp.sum((p2 - p1) * n, axis=-1)
  dist = cdist - r
  pos = p2 - n * (r + 0.5 * dist)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  r, hl = s2[..., 0], s2[..., 1]
  axis = m2[..., :, 2]
  ends = jnp.stack([p2 + axis * hl[..., None], p2 - axis * hl[..., None]], -2)
  cdist = jnp.sum((ends - p1[..., None, :]) * n[..., None, :], axis=-1)
  dist = cdist - r[..., None]
  pos = ends - n[..., None, :] * (r[..., None] + 0.5 * dist)[..., None]
  nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
  # MuJoCo aligns the first tangent with the capsule axis projected onto
  # the plane (oracle parity: pyramidal cone facets follow the capsule);
  # fall back to the generic frame for a near-vertical capsule.
  proj = axis - n * jnp.sum(axis * n, axis=-1, keepdims=True)
  pn = jnp.linalg.norm(proj, axis=-1, keepdims=True)
  generic = pmath.make_tangent_frame(n)[..., 1, :]
  t1 = jnp.where(pn > 1e-9, proj / jnp.maximum(pn, 1e-12), generic)
  t1 = jnp.broadcast_to(t1[..., None, :], pos.shape)
  return dist, pos, nrm, t1


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  # 8 corners in world frame
  signs = jnp.asarray(
      [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
      dtype=p2.dtype)  # (8, 3)
  corners_local = signs * s2[..., None, :3]
  corners = p2[..., None, :] + jnp.einsum('...ij,...kj->...ki', m2,
                                          corners_local)
  cdist = jnp.sum((corners - p1[..., None, :]) * n[..., None, :], -1)  # (n,8)
  # keep the 4 deepest corners
  idx = jnp.argsort(cdist, axis=-1)[..., :4]
  dist = jnp.take_along_axis(cdist, idx, axis=-1)
  pts = jnp.take_along_axis(corners, idx[..., None], axis=-2)
  pos = pts - n[..., None, :] * (0.5 * dist)[..., None]
  nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
  return dist, pos, nrm


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  # support point in -n direction: x = -diag(s)^2 R^T n / |diag(s) R^T n|
  nl = jnp.einsum('...ji,...j->...i', m2, n)  # normal in ellipsoid frame
  sn = s2[..., :3] * nl
  denom = jnp.maximum(jnp.linalg.norm(sn, axis=-1), _MJMINVAL)
  xl = -(s2[..., :3] ** 2) * nl / denom[..., None]
  x = p2 + jnp.einsum('...ij,...j->...i', m2, xl)
  dist = jnp.sum((x - p1) * n, axis=-1)
  pos = x - n * (0.5 * dist)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _plane_cylinder(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  r, hl = s2[..., 0], s2[..., 1]
  axis = m2[..., :, 2]
  # rim direction: project -n onto disc plane
  pn = jnp.sum(n * axis, axis=-1)
  rim = -(n - axis * pn[..., None])
  rimn = jnp.linalg.norm(rim, axis=-1)
  rim = rim / jnp.maximum(rimn, _MJMINVAL)[..., None]
  # choose near end cap (sign of axis.n)
  sgn = jnp.where(pn > 0, -1.0, 1.0)
  cap = p2 + axis * (sgn * hl)[..., None]
  # candidate points: rim point on near cap, 2 perpendicular rim points,
  # and opposite rim point (covers flat-lying and edge-standing cases)
  t = jnp.cross(axis, rim)
  pts = jnp.stack([
      cap + rim * r[..., None],
      cap + t * r[..., None] * 0.7071 + rim * r[..., None] * 0.7071,
      cap - t * r[..., None] * 0.7071 + rim * r[..., None] * 0.7071,
      p2 - axis * (sgn * hl)[..., None] + rim * r[..., None],
  ], axis=-2)
  cdist = jnp.sum((pts - p1[..., None, :]) * n[..., None, :], -1)
  pos = pts - n[..., None, :] * (0.5 * cdist)[..., None]
  nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
  return cdist, pos, nrm


def _sphere_sphere_raw(p1, r1, p2, r2):
  delta = p2 - p1
  cd = jnp.linalg.norm(delta, axis=-1)
  n = delta / jnp.maximum(cd, _MJMINVAL)[..., None]
  # degenerate: coincident centers -> z axis
  n = jnp.where((cd > _MJMINVAL)[..., None], n,
                jnp.broadcast_to(jnp.array([0., 0., 1.], p1.dtype), n.shape))
  dist = cd - r1 - r2
  pos = p1 + n * (r1 + 0.5 * dist)[..., None]
  return dist, pos, n


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  dist, pos, n = _sphere_sphere_raw(p1, s1[..., 0], p2, s2[..., 0])
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_ends(p, m, hl):
  axis = m[..., :, 2]
  return p - axis * hl[..., None], p + axis * hl[..., None]


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  a, b = _capsule_ends(p2, m2, s2[..., 1])
  closest = jax.vmap(pmath.closest_segment_point)(a, b, p1)
  dist, pos, n = _sphere_sphere_raw(p1, s1[..., 0], closest, s2[..., 0])
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  a0, a1 = _capsule_ends(p1, m1, s1[..., 1])
  b0, b1 = _capsule_ends(p2, m2, s2[..., 1])
  pa, pb = jax.vmap(pmath.closest_segment_segment)(a0, a1, b0, b1)
  dist, pos, n = _sphere_sphere_raw(pa, s1[..., 0], pb, s2[..., 0])
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_box_raw(center, r, pb, mb, sb):
  """Sphere (center, r) vs box (pb, mb rotation, sb half-sizes)."""
  local = jnp.einsum('...ji,...j->...i', mb, center - pb)
  clamped = jnp.clip(local, -sb[..., :3], sb[..., :3])
  inside = jnp.all(jnp.abs(local) < sb[..., :3], axis=-1)
  # outside: closest point on surface
  delta_out = local - clamped
  d_out = jnp.linalg.norm(delta_out, axis=-1)
  n_out = delta_out / jnp.maximum(d_out, _MJMINVAL)[..., None]
  # inside: push out through nearest face
  face_d = sb[..., :3] - jnp.abs(local)
  ax = jnp.argmin(face_d, axis=-1)
  sgn = jnp.sign(jnp.take_along_axis(local, ax[..., None], -1)[..., 0])
  sgn = jnp.where(sgn == 0, 1.0, sgn)
  n_in = jax.nn.one_hot(ax, 3, dtype=center.dtype) * sgn[..., None]
  d_in = -jnp.take_along_axis(face_d, ax[..., None], -1)[..., 0]
  surf_in = jnp.where(
      jax.nn.one_hot(ax, 3, dtype=center.dtype) > 0.5,
      sb[..., :3] * sgn[..., None], local)

  dist_l = jnp.where(inside, d_in - r, d_out - r)
  n_l = jnp.where(inside[..., None], n_in, n_out)
  surf_l = jnp.where(inside[..., None], surf_in, clamped)
  # world frame; normal points from sphere into box = -n_l (n_l points from
  # box surface toward sphere center)
  n_w = -jnp.einsum('...ij,...j->...i', mb, n_l)
  surf_w = pb + jnp.einsum('...ij,...j->...i', mb, surf_l)
  pos = surf_w + n_w * (0.5 * dist_l)[..., None]
  return dist_l, pos, n_w


def _sphere_box(p1, m1, s1, p2, m2, s2):
  dist, pos, n = _sphere_box_raw(p1, s1[..., 0], p2, m2, s2)
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_cylinder(p1, m1, s1, p2, m2, s2):
  """Approximate: treat cylinder as a box only along its axis + radial clamp."""
  r1 = s1[..., 0]
  r2, hl = s2[..., 0], s2[..., 1]
  axis = m2[..., :, 2]
  rel = p1 - p2
  z = jnp.sum(rel * axis, axis=-1)
  radial = rel - axis * z[..., None]
  rn = jnp.linalg.norm(radial, axis=-1)
  zc = jnp.clip(z, -hl, hl)
  rc = jnp.minimum(rn, r2)
  rdir = radial / jnp.maximum(rn, _MJMINVAL)[..., None]
  closest = p2 + axis * zc[..., None] + rdir * rc[..., None]
  dist, pos, n = _sphere_sphere_raw(closest, jnp.zeros_like(r1), p1, r1)
  # normal from cylinder-surface point toward sphere -> flip (geom1=sphere)
  return dist[..., None], pos[..., None, :], (-n)[..., None, :]


def _capsule_box(p1, m1, s1, p2, m2, s2):
  a, b = _capsule_ends(p1, m1, s1[..., 1])
  r = s1[..., 0]
  d1, pos1, n1 = _sphere_box_raw(a, r, p2, m2, s2)
  d2, pos2, n2 = _sphere_box_raw(b, r, p2, m2, s2)
  dist = jnp.stack([d1, d2], -1)
  pos = jnp.stack([pos1, pos2], -2)
  nrm = jnp.stack([n1, n2], -2)
  return dist, pos, nrm


def _box_box(p1, m1, s1, p2, m2, s2):
  """Approximate box-box: corners of each box vs the other box's faces
  (8 candidates: 4 deepest corners of box1 in box2 + 4 of box2 in box1)."""
  signs = jnp.asarray(
      [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
      dtype=p1.dtype)

  def corners_vs_box(pa, ma, sa, pb, mb, sb, flip):
    corners = pa[..., None, :] + jnp.einsum(
        '...ij,...kj->...ki', ma, signs * sa[..., None, :3])
    d, pos, n = jax.vmap(
        lambda c: _sphere_box_raw(c, jnp.zeros(c.shape[:-1], c.dtype), pb, mb, sb),
        in_axes=-2, out_axes=(-1, -2, -2))(corners)
    idx = jnp.argsort(d, axis=-1)[..., :4]
    d = jnp.take_along_axis(d, idx, -1)
    pos = jnp.take_along_axis(pos, idx[..., None], -2)
    n = jnp.take_along_axis(n, idx[..., None], -2)
    return d, pos, jnp.where(flip, -n, n)

  d1, pos1, n1 = corners_vs_box(p1, m1, s1, p2, m2, s2, False)
  d2, pos2, n2 = corners_vs_box(p2, m2, s2, p1, m1, s1, True)
  return (jnp.concatenate([d1, d2], -1), jnp.concatenate([pos1, pos2], -2),
          jnp.concatenate([n1, n2], -2))


# ---------------------------------------------------------------------------
# Heightfield narrowphase. The terrain raster lives in Model.hfield_data
# (meters, (nrow, ncol)); each query geom tests the two triangles of every
# cell in a fixed 3x3 neighborhood of its footprint — O(1) gathers with
# static shapes, the TPU replacement for the reference's box-grid terrain
# + mjwarp broadphase (reference src/mjlab/terrains/primitive_terrains.py).
# ---------------------------------------------------------------------------


def _closest_on_triangle(p, a, b, c):
  """Vectorized closest point on triangle abc to point p (Ericson 5.1.5).
  All inputs (..., 3); returns (..., 3)."""
  dot = lambda x, y: jnp.sum(x * y, axis=-1)
  eps = 1e-12
  ab = b - a
  ac = c - a
  ap = p - a
  d1 = dot(ab, ap)
  d2 = dot(ac, ap)
  bp = p - b
  d3 = dot(ab, bp)
  d4 = dot(ac, bp)
  cp = p - c
  d5 = dot(ab, cp)
  d6 = dot(ac, cp)
  va = d3 * d6 - d5 * d4
  vb = d5 * d2 - d1 * d6
  vc = d1 * d4 - d3 * d2

  # interior
  denom = va + vb + vc
  denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
  v_in = vb / denom
  w_in = vc / denom
  res = a + ab * v_in[..., None] + ac * w_in[..., None]
  # edge BC
  t_bc = (d4 - d3) / jnp.where(
      jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps, (d4 - d3) + (d5 - d6))
  on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
  res = jnp.where(on_bc[..., None], b + (c - b) * t_bc[..., None], res)
  # edge AC
  t_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6)
  on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
  res = jnp.where(on_ac[..., None], a + ac * t_ac[..., None], res)
  # vertex C
  on_c = (d6 >= 0) & (d5 <= d6)
  res = jnp.where(on_c[..., None], c, res)
  # edge AB
  t_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3)
  on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
  res = jnp.where(on_ab[..., None], a + ab * t_ab[..., None], res)
  # vertex B
  on_b = (d3 >= 0) & (d4 <= d3)
  res = jnp.where(on_b[..., None], b, res)
  # vertex A
  on_a = (d1 <= 0) & (d2 <= 0)
  res = jnp.where(on_a[..., None], a, res)
  return res


def _hf_point_candidates(hf, size, nrow, ncol, pts, radius):
  """Candidate contacts for query spheres vs the heightfield.

  hf: (nrow, ncol) meters. pts: (..., 3) local-frame sphere centers,
  radius: (...) sphere radii. Returns (dist, pos, normal) with a trailing
  candidate axis of 18 (3x3 cells x 2 triangles); invalid candidates have
  dist = 1e10. All local-frame."""
  # static numpy float64 scalars must enter the math as WEAK Python
  # floats, else they promote the whole f32 collider to f64 under
  # standard dtype promotion (future JAX errors on the f64->f32 scatter
  # writing results back into the contact set)
  rx, ry = float(size[0]), float(size[1])
  cx = 2.0 * rx / (ncol - 1)
  cy = 2.0 * ry / (nrow - 1)
  u = (pts[..., 0] + rx) / cx  # continuous col coord
  v = (pts[..., 1] + ry) / cy  # continuous row coord
  j0 = jnp.floor(u).astype(jnp.int32)
  i0 = jnp.floor(v).astype(jnp.int32)

  offs = jnp.arange(-1, 2)
  di = jnp.repeat(offs, 3)  # (9,)
  dj = jnp.tile(offs, 3)
  i = i0[..., None] + di  # (..., 9)
  j = j0[..., None] + dj
  valid = (i >= 0) & (i < nrow - 1) & (j >= 0) & (j < ncol - 1)
  ic = jnp.clip(i, 0, nrow - 2)
  jc = jnp.clip(j, 0, ncol - 2)

  x0 = -rx + jc * cx
  x1 = x0 + cx
  y0 = -ry + ic * cy
  y1 = y0 + cy
  z00 = hf[ic, jc]
  z10 = hf[ic, jc + 1]
  z01 = hf[ic + 1, jc]
  z11 = hf[ic + 1, jc + 1]
  p00 = jnp.stack([x0, y0, z00], -1)  # (..., 9, 3)
  p10 = jnp.stack([x1, y0, z10], -1)
  p01 = jnp.stack([x0, y1, z01], -1)
  p11 = jnp.stack([x1, y1, z11], -1)

  # two triangles per cell: (p00, p10, p11) and (p00, p11, p01)
  a = jnp.concatenate([p00, p00], -2)  # (..., 18, 3)
  b = jnp.concatenate([p10, p11], -2)
  c = jnp.concatenate([p11, p01], -2)
  valid2 = jnp.concatenate([valid, valid], -1)

  pe = pts[..., None, :]  # (..., 1, 3)
  cp = _closest_on_triangle(pe, a, b, c)
  n_tri = jnp.cross(b - a, c - a)
  n_tri = n_tri / jnp.maximum(
      jnp.linalg.norm(n_tri, axis=-1, keepdims=True), 1e-12)
  delta = pe - cp
  d = jnp.linalg.norm(delta, axis=-1)
  sd = jnp.sum(delta * n_tri, axis=-1)
  # projection inside the triangle -> signed plane distance (handles deep
  # penetration); edge/corner -> unsigned euclidean
  inside = (d - jnp.abs(sd)) < 1e-9
  r = radius[..., None]
  dist = jnp.where(inside, sd, d) - r
  n_edge = delta / jnp.maximum(d, 1e-12)[..., None]
  normal = jnp.where(inside[..., None], n_tri, n_edge)
  # pos = midpoint between surfaces
  pos = 0.5 * (cp + pe - normal * r[..., None])
  dist = jnp.where(valid2, dist, 1e10)
  return dist, pos, normal


def _dedup_candidates(dist, pos):
  """Invalidate candidates whose contact pos duplicates a deeper one
  (adjacent triangles sharing an edge produce identical closest points)."""
  k = dist.shape[-1]
  d2 = jnp.sum(
      jnp.square(pos[..., :, None, :] - pos[..., None, :, :]), -1)
  same = d2 < 1e-10
  # candidate i is a duplicate if some j with (dist_j, j) < (dist_i, i)
  # lexicographic (depth first, index as tiebreak) has same pos
  di = dist[..., :, None]
  dj = dist[..., None, :]
  idx = jnp.arange(k)
  better = (dj < di) | ((dj == di) & (idx[None, :] < idx[:, None]))
  dup = jnp.any(same & better, axis=-1)
  return jnp.where(dup, 1e10, dist)


def _hf_select(m: Model, d: Data, g1s, g2s, dist, pos, normal, npts):
  """Top-npts deepest candidates; local->world transform."""
  dist = _dedup_candidates(dist, pos)
  neg = -dist
  _, top = jax.lax.top_k(neg, npts)
  tk = lambda x: jnp.take_along_axis(x, top[..., None], axis=-2) \
      if x.ndim == dist.ndim + 1 else jnp.take_along_axis(x, top, axis=-1)
  dist = tk(dist)
  pos = tk(pos)
  normal = tk(normal)
  gh = g1s[0]
  ph = d.geom_xpos[gh]
  rh = d.geom_xmat[gh]
  pos = ph + jnp.einsum('ab,nkb->nka', rh, pos)
  normal = jnp.einsum('ab,nkb->nka', rh, normal)
  return dist, pos, normal


def _hfield_sphere(m: Model, d: Data, g1s, g2s, npts):
  s = m.stat
  gh = g1s[0]
  ph, rh = d.geom_xpos[gh], d.geom_xmat[gh]
  c_w = d.geom_xpos[g2s]  # (n, 3)
  c_l = jnp.einsum('ba,nb->na', rh, c_w - ph)
  r = m.geom_size[g2s, 0]
  dist, pos, normal = _hf_point_candidates(
      m.hfield_data, s.hfield_size, s.hfield_nrow, s.hfield_ncol, c_l, r)
  return _hf_select(m, d, g1s, g2s, dist, pos, normal, npts)


def _hfield_capsule(m: Model, d: Data, g1s, g2s, npts):
  s = m.stat
  gh = g1s[0]
  ph, rh = d.geom_xpos[gh], d.geom_xmat[gh]
  p = d.geom_xpos[g2s]
  mat = d.geom_xmat[g2s]
  r = m.geom_size[g2s, 0]
  hl = m.geom_size[g2s, 1]
  axis = mat[..., :, 2]
  # 3 sample spheres along the segment (dtype follows the data: jnp
  # float literals default to f64 when x64 is on, which would promote
  # the whole collider)
  ts = jnp.array([-1.0, 0.0, 1.0], p.dtype)
  cs = p[:, None, :] + axis[:, None, :] * (ts[None, :, None] * hl[:, None, None])
  c_l = jnp.einsum('ba,nsb->nsa', rh, cs - ph)  # (n, 3, 3)
  dist, pos, normal = _hf_point_candidates(
      m.hfield_data, s.hfield_size, s.hfield_nrow, s.hfield_ncol, c_l,
      jnp.broadcast_to(r[:, None], c_l.shape[:2]))
  n = dist.shape[0]
  dist = dist.reshape(n, -1)
  pos = pos.reshape(n, -1, 3)
  normal = normal.reshape(n, -1, 3)
  return _hf_select(m, d, g1s, g2s, dist, pos, normal, npts)


def _hfield_box(m: Model, d: Data, g1s, g2s, npts):
  s = m.stat
  gh = g1s[0]
  ph, rh = d.geom_xpos[gh], d.geom_xmat[gh]
  p = d.geom_xpos[g2s]
  mat = d.geom_xmat[g2s]
  size = m.geom_size[g2s]
  sign = jnp.array([[sx, sy, sz] for sx in (-1., 1.) for sy in (-1., 1.)
                    for sz in (-1., 1.)], p.dtype)  # (8, 3)
  corners = p[:, None, :] + jnp.einsum(
      'nab,nkb->nka', mat, sign[None] * size[:, None, :])
  c_l = jnp.einsum('ba,nkb->nka', rh, corners - ph)  # (n, 8, 3)
  dist, pos, normal = _hf_point_candidates(
      m.hfield_data, s.hfield_size, s.hfield_nrow, s.hfield_ncol, c_l,
      jnp.zeros(c_l.shape[:2], p.dtype))
  n = dist.shape[0]
  dist = dist.reshape(n, -1)
  pos = pos.reshape(n, -1, 3)
  normal = normal.reshape(n, -1, 3)
  return _hf_select(m, d, g1s, g2s, dist, pos, normal, npts)


_HF_COLLIDERS = {
    (GeomType.HFIELD, GeomType.SPHERE): _hfield_sphere,
    (GeomType.HFIELD, GeomType.CAPSULE): _hfield_capsule,
    (GeomType.HFIELD, GeomType.BOX): _hfield_box,
}


# ---------------------------------------------------------------------------
# Generic convex-solid pairs (ellipsoid/cylinder combinations).
#
# MuJoCo routes these through its general convex collider (MPR); here the
# closest-point pair is found by fixed-iteration alternating projection
# between the two solids (projection onto a cylinder/box/ellipsoid solid
# is analytic), with a directional-support estimate for the (shallow)
# penetration case. Documented approximation: distances agree with the
# oracle to ~1e-3 near contact (tests/test_collision_pairs.py), not to
# machine precision like the dedicated primitive pairs above.
# ---------------------------------------------------------------------------


def _to_local(p, mat, x):
  return jnp.einsum('...ji,...j->...i', mat, x - p)


def _to_world(p, mat, x):
  return p + jnp.einsum('...ij,...j->...i', mat, x)


def _proj_ellipsoid_local(x, radii, iters: int = 12):
  """Project a point onto a solid axis-aligned ellipsoid (local frame)."""
  r2 = radii * radii
  inside = jnp.sum((x / radii) ** 2, axis=-1) <= 1.0

  t = jnp.maximum(jnp.linalg.norm(x, axis=-1) - jnp.min(radii, -1),
                  0.0) * jnp.max(radii, -1)
  for _ in range(iters):
    denom = r2 + t[..., None]
    f = jnp.sum(r2 * x * x / (denom * denom), axis=-1) - 1.0
    df = -2.0 * jnp.sum(r2 * x * x / (denom ** 3), axis=-1)
    t = jnp.maximum(t - f / jnp.where(jnp.abs(df) > _MJMINVAL, df, -1.0), 0.0)
  y = r2 * x / (r2 + t[..., None])
  return jnp.where(inside[..., None], x, y)


def _proj_cylinder_local(x, r, hl):
  """Project onto a solid z-aligned cylinder (local frame)."""
  z = jnp.clip(x[..., 2], -hl, hl)
  rad = x[..., :2]
  rn = jnp.linalg.norm(rad, axis=-1)
  scale = jnp.minimum(rn, r) / jnp.maximum(rn, _MJMINVAL)
  return jnp.concatenate([rad * scale[..., None], z[..., None]], -1)


def _proj_box_local(x, half):
  return jnp.clip(x, -half, half)


def _supp_ellipsoid_local(n, radii):
  """Support point of an ellipsoid in local direction n."""
  v = radii * radii * n
  return v / jnp.maximum(
      jnp.linalg.norm(v / jnp.maximum(radii, _MJMINVAL), axis=-1,
                      keepdims=True), _MJMINVAL)


def _supp_cylinder_local(n, r, hl):
  rad = n[..., :2]
  rn = jnp.maximum(jnp.linalg.norm(rad, axis=-1, keepdims=True), _MJMINVAL)
  return jnp.concatenate(
      [r[..., None] * rad / rn,
       jnp.sign(n[..., 2:3]) * hl[..., None]], -1)


def _supp_box_local(n, half):
  return jnp.where(n >= 0, half, -half)


def _solid_ops(gtype: int):
  """(project(p, mat, size, x_world), support(p, mat, size, n_world))."""
  if gtype == GeomType.ELLIPSOID:
    proj = lambda p, mt, s, x: _to_world(
        p, mt, _proj_ellipsoid_local(_to_local(p, mt, x), s[..., :3]))
    supp = lambda p, mt, s, nw: _to_world(
        p, mt, _supp_ellipsoid_local(
            jnp.einsum('...ji,...j->...i', mt, nw), s[..., :3]))
  elif gtype == GeomType.CYLINDER:
    proj = lambda p, mt, s, x: _to_world(
        p, mt, _proj_cylinder_local(_to_local(p, mt, x), s[..., 0],
                                    s[..., 1]))
    supp = lambda p, mt, s, nw: _to_world(
        p, mt, _supp_cylinder_local(
            jnp.einsum('...ji,...j->...i', mt, nw), s[..., 0], s[..., 1]))
  elif gtype == GeomType.BOX:
    proj = lambda p, mt, s, x: _to_world(
        p, mt, _proj_box_local(_to_local(p, mt, x), s[..., :3]))
    supp = lambda p, mt, s, nw: _to_world(
        p, mt, _supp_box_local(
            jnp.einsum('...ji,...j->...i', mt, nw), s[..., :3]))
  else:
    raise NotImplementedError(gtype)
  return proj, supp


def _shrink_size(gtype: int, s, delta):
  """Erode a solid's size parameters by delta (Minkowski erosion; exact
  for box/cylinder, close for mildly anisotropic ellipsoids)."""
  if gtype == GeomType.ELLIPSOID:
    return s.at[..., :3].set(s[..., :3] - delta[..., None])
  if gtype == GeomType.CYLINDER:
    return s.at[..., :2].set(s[..., :2] - delta[..., None])
  if gtype == GeomType.BOX:
    return s.at[..., :3].set(s[..., :3] - delta[..., None])
  raise NotImplementedError(gtype)


def _min_extent(gtype: int, s):
  if gtype == GeomType.CYLINDER:
    return jnp.minimum(s[..., 0], s[..., 1])
  return jnp.min(s[..., :3], axis=-1)


class _ConvexOps:
  """Support/projection interface of one convex shape family. `s` is an
  opaque per-pair shape parameter: geom_size for analytic solids, a
  scalar scale factor for mesh hulls (shrinking a polytope about its
  center is exact erosion up to face-distance anisotropy)."""

  def __init__(self, proj, supp, shrink, minext):
    self.proj = proj        # (p, mat, s, x_world) -> closest point in solid
    self.supp = supp        # (p, mat, s, n_world) -> support point
    self.shrink = shrink    # (s, delta) -> eroded shape param
    self.minext = minext    # (s,) -> smallest half-extent


def _ops_of(gtype: int) -> _ConvexOps:
  proj, supp = _solid_ops(gtype)
  return _ConvexOps(proj, supp,
                    lambda s, dlt: _shrink_size(gtype, s, dlt),
                    lambda s: _min_extent(gtype, s))


def _convex_core(ops1: _ConvexOps, ops2: _ConvexOps):
  """Collider for two convex shapes: erode both by ~a quarter of their
  smallest extent, find the closest pair of the eroded (now disjoint for
  any shallow penetration) shapes by alternating projection, and add the
  erosion back into the distance. Deeper overlap (beyond the erosion
  budget) falls back to a directional-support depth estimate."""
  proj1, supp1 = ops1.proj, ops1.supp
  proj2, supp2 = ops2.proj, ops2.supp

  def collide(p1, m1, s1, p2, m2, s2):
    d1 = 0.25 * ops1.minext(s1)
    d2 = 0.25 * ops2.minext(s2)
    s1s = ops1.shrink(s1, d1)
    s2s = ops2.shrink(s2, d2)
    a = p1
    b = p2
    for _ in range(48):
      a = proj1(p1, m1, s1s, b)
      b = proj2(p2, m2, s2s, a)
    delta = b - a
    dn = jnp.linalg.norm(delta, axis=-1)
    n_sep = delta / jnp.maximum(dn, _MJMINVAL)[..., None]
    # add the erosion back as the exact support-plane displacement of
    # each shrunk shape along the found normal (erosion-by-scaling moves
    # faces far from the center by more than the nominal delta; the
    # support gap measures the true displacement — exact for polytopes,
    # and sharper than the nominal delta for scaled boxes/ellipsoids)
    e1 = jnp.sum((supp1(p1, m1, s1, n_sep)
                  - supp1(p1, m1, s1s, n_sep)) * n_sep, axis=-1)
    e2 = jnp.sum((supp2(p2, m2, s2, -n_sep)
                  - supp2(p2, m2, s2s, -n_sep)) * (-n_sep), axis=-1)
    e1 = jnp.clip(e1, 0.0, None)
    e2 = jnp.clip(e2, 0.0, None)
    dist_sep = dn - e1 - e2
    pos_sep = 0.5 * (a + n_sep * e1[..., None] + b - n_sep * e2[..., None])
    # eroded solids still overlap: deep penetration, support fallback
    in_b = jnp.linalg.norm(proj2(p2, m2, s2s, a) - a, axis=-1) < 1e-9
    in_a = jnp.linalg.norm(proj1(p1, m1, s1s, b) - b, axis=-1) < 1e-9
    deep = in_a | in_b | (dn <= 1e-9)
    cdir = p2 - p1
    cn = jnp.linalg.norm(cdir, axis=-1)
    n_ov = cdir / jnp.maximum(cn, _MJMINVAL)[..., None]
    n_ov = jnp.where((cn > _MJMINVAL)[..., None], n_ov,
                     jnp.broadcast_to(
                         jnp.asarray([0.0, 0.0, 1.0], p1.dtype), p1.shape))
    sa = supp1(p1, m1, s1, n_ov)
    sb = supp2(p2, m2, s2, -n_ov)
    depth = jnp.sum((sa - sb) * n_ov, axis=-1)
    n = jnp.where(deep[..., None], n_ov, n_sep)
    dist = jnp.where(deep, -jnp.maximum(depth, d1 + d2), dist_sep)
    pos = jnp.where(deep[..., None], 0.5 * (a + b), pos_sep)
    return dist[..., None], pos[..., None, :], n[..., None, :]

  return collide


def _convex_pair(t1: int, t2: int):
  return _convex_core(_ops_of(t1), _ops_of(t2))


def _capsule_convex_core(ops2: _ConvexOps):
  """Capsule (rounded segment) vs a convex shape."""
  proj2, supp2 = ops2.proj, ops2.supp

  def collide(p1, m1, s1, p2, m2, s2):
    r = s1[..., 0]
    a0, a1 = _capsule_ends(p1, m1, s1[..., 1])
    d2 = 0.25 * ops2.minext(s2)
    s2s = ops2.shrink(s2, d2)

    def proj_seg(x):
      ab = a1 - a0
      t = jnp.sum((x - a0) * ab, -1) / jnp.maximum(
          jnp.sum(ab * ab, -1), _MJMINVAL)
      return a0 + jnp.clip(t, 0.0, 1.0)[..., None] * ab

    a = p1
    b = p2
    for _ in range(48):
      a = proj_seg(b)
      b = proj2(p2, m2, s2s, a)
    delta = b - a
    dn = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(dn, _MJMINVAL)[..., None]
    # exact support-plane displacement of the eroded shape along the
    # found normal (see _convex_core)
    e2 = jnp.sum((supp2(p2, m2, s2, -n)
                  - supp2(p2, m2, s2s, -n)) * (-n), axis=-1)
    e2 = jnp.clip(e2, 0.0, None)
    dist = dn - r - e2
    pos = a + n * (r + 0.5 * dist)[..., None]
    # segment core inside the ERODED solid: deep penetration fallback —
    # center-direction normal + support depth past the near surface
    deep = (jnp.linalg.norm(proj2(p2, m2, s2s, a) - a, axis=-1) < 1e-9) \
        | (dn <= 1e-9)
    cdir = p2 - p1
    cn = jnp.linalg.norm(cdir, axis=-1)
    n_ov = cdir / jnp.maximum(cn, _MJMINVAL)[..., None]
    near = supp2(p2, m2, s2, -n_ov)
    delta_core = jnp.sum((a - near) * n_ov, axis=-1)
    n = jnp.where(deep[..., None], n_ov, n)
    dist = jnp.where(deep, -(r + jnp.maximum(delta_core, d2)), dist)
    pos = jnp.where(deep[..., None], a, pos)
    return dist[..., None], pos[..., None, :], n[..., None, :]

  return collide


def _capsule_convex(t2: int):
  return _capsule_convex_core(_ops_of(t2))


def _sphere_ellipsoid(p1, m1, s1, p2, m2, s2):
  """Sphere vs ellipsoid: Newton projection of the center."""
  r = s1[..., 0]
  c = _proj_ellipsoid_local(_to_local(p2, m2, p1), s2[..., :3])
  cw = _to_world(p2, m2, c)
  dist, pos, n = _sphere_sphere_raw(p1, r, cw, jnp.zeros_like(r))
  return dist[..., None], pos[..., None, :], n[..., None, :]


# ---------------------------------------------------------------------------
# Mesh (convex hull) narrowphase. Hull data is static (physics/mesh.py,
# built at put_model); per pair group the hulls of the participating
# geoms are gathered host-side into (n, V/F, ...) constants, so support
# and exact point-to-hull projection vectorize over the pair axis with
# static shapes. Mesh pairs plug into the same erode + alternating-
# projection convex core as ellipsoid/cylinder pairs (same documented
# ~1e-3 near-contact accuracy); mesh-plane and mesh-sphere are exact.
# MuJoCo parity target: the general convex collider (mjc_Convex/MPR).
# ---------------------------------------------------------------------------


def _mesh_proj_local(x, k, H):
  """Closest point of the k-scaled hull to local point x; x itself when
  inside. x (n, 3), k (n,)."""
  ctr = H['center']
  kk = jnp.maximum(k, _MJMINVAL)[..., None]
  xu = ctr + (x - ctr) / kk  # unscale the query instead of the hull
  pl = jnp.sum(H['fnorm'] * xu[:, None, :], -1) - H['foff']  # (n, F)
  inside = jnp.all(jnp.where(H['fmask'] > 0, pl, -1.0) <= 0, axis=-1)
  tri = H['tri']
  cand = _closest_on_triangle(xu[:, None, :], tri[..., 0, :],
                              tri[..., 1, :], tri[..., 2, :])  # (n, F, 3)
  d2 = jnp.sum((cand - xu[:, None, :]) ** 2, -1)
  d2 = jnp.where(H['fmask'] > 0, d2, jnp.inf)
  best = jnp.take_along_axis(
      cand, jnp.argmin(d2, -1)[:, None, None], axis=1)[:, 0]
  y = jnp.where(inside[..., None], xu, best)
  return ctr + (y - ctr) * k[..., None]


def _mesh_supp_local(nl, k, H):
  """Hull support point in local direction nl, scaled by k."""
  dots = jnp.sum(H['vert'] * nl[:, None, :], -1)
  dots = jnp.where(H['vmask'] > 0, dots, -jnp.inf)
  v = jnp.take_along_axis(
      H['vert'], jnp.argmax(dots, -1)[:, None, None], axis=1)[:, 0]
  return H['center'] + (v - H['center']) * k[..., None]


def _mesh_ops(H) -> _ConvexOps:
  """ConvexOps for a hull group; the shape param is a scale factor about
  the hull center (1.0 = full size), making polytope erosion affine."""
  proj = lambda p, mt, k, x: _to_world(
      p, mt, _mesh_proj_local(_to_local(p, mt, x), k, H))
  supp = lambda p, mt, k, nw: _to_world(
      p, mt, _mesh_supp_local(
          jnp.einsum('...ji,...j->...i', mt, nw), k, H))
  shrink = lambda k, dlt: jnp.maximum(
      k - dlt / jnp.maximum(H['rin'], _MJMINVAL), 0.05)
  minext = lambda k: k * H['rin']
  return _ConvexOps(proj, supp, shrink, minext)


def _plane_mesh_fn(H):
  """Plane vs hull: signed plane distance of every hull vertex, keep the
  4 deepest (the resting-face manifold, mirroring _plane_box)."""

  def collide(p1, m1, s1, p2, m2, s2):
    n = m1[..., :, 2]
    vw = p2[:, None, :] + jnp.einsum('nij,nvj->nvi', m2, H['vert'])
    cdist = jnp.sum((vw - p1[:, None, :]) * n[:, None, :], -1)
    cdist = jnp.where(H['vmask'] > 0, cdist, jnp.inf)
    idx = jnp.argsort(cdist, axis=-1)[:, :4]
    dist = jnp.take_along_axis(cdist, idx, axis=-1)
    pts = jnp.take_along_axis(vw, idx[..., None], axis=1)
    pos = pts - n[:, None, :] * (0.5 * dist)[..., None]
    nrm = jnp.broadcast_to(n[:, None, :], pos.shape)
    return dist, pos, nrm

  return collide


def _sphere_mesh_fn(H):
  """Sphere vs hull: exact (projection of the center onto the hull
  surface); center-inside uses the nearest-exit direction."""

  def collide(p1, m1, s1, p2, m2, s2):
    r = s1[..., 0]
    cl = _to_local(p2, m2, p1)
    tri = H['tri']
    cand = _closest_on_triangle(cl[:, None, :], tri[..., 0, :],
                                tri[..., 1, :], tri[..., 2, :])
    d2 = jnp.sum((cand - cl[:, None, :]) ** 2, -1)
    d2 = jnp.where(H['fmask'] > 0, d2, jnp.inf)
    sp = jnp.take_along_axis(
        cand, jnp.argmin(d2, -1)[:, None, None], axis=1)[:, 0]
    pl = jnp.sum(H['fnorm'] * cl[:, None, :], -1) - H['foff']
    inside = jnp.all(jnp.where(H['fmask'] > 0, pl, -1.0) <= 0, axis=-1)
    pw = _to_world(p2, m2, sp)
    delta = pw - p1
    dn = jnp.linalg.norm(delta, axis=-1)
    nd = delta / jnp.maximum(dn, _MJMINVAL)[..., None]
    nd = jnp.where((dn > _MJMINVAL)[..., None], nd,
                   jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], p1.dtype),
                                    nd.shape))
    n = jnp.where(inside[..., None], -nd, nd)
    dist = jnp.where(inside, -(r + dn), dn - r)
    pos = p1 + n * (r + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]

  return collide


def _hull_group(m: Model, gids: np.ndarray):
  """Gather the static hulls of geoms `gids` into (n, ...) constants."""
  s = m.stat
  h = s.mesh_hulls
  if h is None:
    raise ValueError('mesh pair group but model has no mesh hulls')
  mid = s.geom_dataid[gids]
  dt = m.geom_size.dtype
  f = lambda arr: jnp.asarray(arr[mid], dtype=dt)
  return {'vert': f(h.vert), 'vmask': f(h.vmask), 'tri': f(h.tri),
          'fnorm': f(h.fnorm), 'foff': f(h.foff), 'fmask': f(h.fmask),
          'center': f(h.center), 'rin': f(h.rin)}


def _mesh_collider(m: Model, key, g1s, g2s):
  """Build the (collider, s1, s2) triple for a pair group whose second
  (or both) geom type is MESH — GeomType ordering puts MESH last."""
  t1 = key[0]
  H2 = _hull_group(m, g2s)
  ones2 = jnp.ones(len(g2s), m.geom_size.dtype)
  if t1 == GeomType.PLANE:
    return _plane_mesh_fn(H2), m.geom_size[g1s], ones2
  if t1 == GeomType.SPHERE:
    return _sphere_mesh_fn(H2), m.geom_size[g1s], ones2
  if t1 == GeomType.CAPSULE:
    return _capsule_convex_core(_mesh_ops(H2)), m.geom_size[g1s], ones2
  if t1 == GeomType.MESH:
    H1 = _hull_group(m, g1s)
    return (_convex_core(_mesh_ops(H1), _mesh_ops(H2)),
            jnp.ones(len(g1s), m.geom_size.dtype), ones2)
  return _convex_core(_ops_of(t1), _mesh_ops(H2)), m.geom_size[g1s], ones2


_COLLIDERS = {
    (GeomType.PLANE, GeomType.SPHERE): _plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): _plane_capsule,
    (GeomType.PLANE, GeomType.BOX): _plane_box,
    (GeomType.PLANE, GeomType.ELLIPSOID): _plane_ellipsoid,
    (GeomType.PLANE, GeomType.CYLINDER): _plane_cylinder,
    (GeomType.SPHERE, GeomType.SPHERE): _sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): _sphere_capsule,
    (GeomType.SPHERE, GeomType.CYLINDER): _sphere_cylinder,
    (GeomType.SPHERE, GeomType.BOX): _sphere_box,
    (GeomType.CAPSULE, GeomType.CAPSULE): _capsule_capsule,
    (GeomType.CAPSULE, GeomType.BOX): _capsule_box,
    (GeomType.BOX, GeomType.BOX): _box_box,
    # convex-solid pairs (alternating-projection approximation; see above)
    (GeomType.SPHERE, GeomType.ELLIPSOID): _sphere_ellipsoid,
    (GeomType.CAPSULE, GeomType.ELLIPSOID): _capsule_convex(
        GeomType.ELLIPSOID),
    (GeomType.CAPSULE, GeomType.CYLINDER): _capsule_convex(
        GeomType.CYLINDER),
    (GeomType.ELLIPSOID, GeomType.ELLIPSOID): _convex_pair(
        GeomType.ELLIPSOID, GeomType.ELLIPSOID),
    (GeomType.ELLIPSOID, GeomType.CYLINDER): _convex_pair(
        GeomType.ELLIPSOID, GeomType.CYLINDER),
    (GeomType.ELLIPSOID, GeomType.BOX): _convex_pair(
        GeomType.ELLIPSOID, GeomType.BOX),
    (GeomType.CYLINDER, GeomType.CYLINDER): _convex_pair(
        GeomType.CYLINDER, GeomType.CYLINDER),
    (GeomType.CYLINDER, GeomType.BOX): _convex_pair(
        GeomType.CYLINDER, GeomType.BOX),
}


def _mix_params(m: Model, g1: np.ndarray, g2: np.ndarray,
                pairids: np.ndarray):
  """Contact parameter combination, mirroring mj_contactParam; explicit
  <pair> slots (pairids >= 0, static) take the pair_* fields verbatim."""
  s = m.stat
  p1 = s.geom_priority[g1]
  p2 = s.geom_priority[g2]
  f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
  sr1, sr2 = m.geom_solref[g1], m.geom_solref[g2]
  si1, si2 = m.geom_solimp[g1], m.geom_solimp[g2]
  mix1, mix2 = m.geom_solmix[g1], m.geom_solmix[g2]

  # equal priority: solmix-weighted average / max friction
  denom = mix1 + mix2
  w1 = jnp.where(denom > _MJMINVAL, mix1 / jnp.maximum(denom, _MJMINVAL), 0.5)
  w1 = jnp.where((mix1 < _MJMINVAL) & (mix2 < _MJMINVAL), 0.5, w1)
  w1 = jnp.where((mix1 < _MJMINVAL) & (mix2 >= _MJMINVAL), 0.0, w1)
  w1 = jnp.where((mix1 >= _MJMINVAL) & (mix2 < _MJMINVAL), 1.0, w1)
  w2 = 1.0 - w1
  solref_mix = jnp.where(
      (sr1[:, :1] > 0) & (sr2[:, :1] > 0),
      w1[:, None] * sr1 + w2[:, None] * sr2,
      jnp.minimum(sr1, sr2))
  solimp_mix = w1[:, None] * si1 + w2[:, None] * si2
  fric_mix = jnp.maximum(f1, f2)

  # priority override (static selection)
  use1 = (p1 > p2)[:, None]
  use2 = (p2 > p1)[:, None]
  eq = ~(use1 | use2)
  use1 = jnp.asarray(use1)
  use2 = jnp.asarray(use2)
  eq = jnp.asarray(eq)
  solref = jnp.where(eq, solref_mix, jnp.where(use1, sr1, sr2))
  solimp = jnp.where(eq, solimp_mix, jnp.where(use1, si1, si2))
  fric3 = jnp.where(eq, fric_mix, jnp.where(use1, f1, f2))
  friction = jnp.stack(
      [fric3[:, 0], fric3[:, 0], fric3[:, 1], fric3[:, 2], fric3[:, 2]], -1)

  # includemargin == margin: MuJoCo 3.10's gap attribute is parsed but
  # has no observable effect on contact inclusion, efc reference, or
  # accelerations (verified empirically vs mj_forward) — mirror that.
  margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])

  if (pairids >= 0).any():  # static: free when the group has no <pair>s
    is_pair = jnp.asarray(pairids >= 0)
    pid = jnp.asarray(np.maximum(pairids, 0))
    friction = jnp.where(is_pair[:, None], m.pair_friction[pid], friction)
    solref = jnp.where(is_pair[:, None], m.pair_solref[pid], solref)
    solimp = jnp.where(is_pair[:, None], m.pair_solimp[pid], solimp)
    margin = jnp.where(is_pair, m.pair_margin[pid], margin)
  return friction, solref, solimp, margin


def collision(m: Model, d: Data) -> Data:
  """Run all narrowphase groups; fill the fixed-capacity Contact set."""
  s = m.stat
  if s.pairs.ncon_max == 0:
    return d
  con = d.contact
  dist = con.dist
  pos = con.pos
  frame = con.frame
  friction = con.friction
  solref = con.solref
  solimp = con.solimp
  includemargin = con.includemargin

  for key, (g1s, g2s, pids, base, npts) in s.pairs.groups.items():
    n = len(g1s)
    ct1 = None
    if key in _HF_COLLIDERS:
      cd, cp, cn = _HF_COLLIDERS[key](m, d, g1s, g2s, npts)
    else:
      if GeomType.MESH in key:
        fn, s1_, s2_ = _mesh_collider(m, key, g1s, g2s)
      else:
        fn = _COLLIDERS[key]
        s1_, s2_ = m.geom_size[g1s], m.geom_size[g2s]
      p1, m1_ = d.geom_xpos[g1s], d.geom_xmat[g1s]
      p2, m2_ = d.geom_xpos[g2s], d.geom_xmat[g2s]
      out = fn(p1, m1_, s1_, p2, m2_, s2_)
      cd, cp, cn = out[:3]
      ct1 = out[3] if len(out) > 3 else None
    cd = cd.reshape(n * npts)
    cp = cp.reshape(n * npts, 3)
    cn = cn.reshape(n * npts, 3)
    if ct1 is None:
      fr = pmath.make_tangent_frame(cn)
    else:
      # collider-provided first tangent (MuJoCo geometry-derived frames)
      ct1 = ct1.reshape(n * npts, 3)
      fr = jnp.stack([cn, ct1, jnp.cross(cn, ct1)], axis=-2)

    fric, sr, si, inc = _mix_params(m, g1s, g2s, pids)
    rep = lambda x: jnp.repeat(x, npts, axis=0)
    # includemargin (== margin) is both the activation threshold
    # (dist < includemargin) and the efc penetration reference
    sl = slice(base, base + n * npts)
    dist = dist.at[sl].set(cd)
    pos = pos.at[sl].set(cp)
    frame = frame.at[sl].set(fr)
    friction = friction.at[sl].set(rep(fric))
    solref = solref.at[sl].set(rep(sr))
    solimp = solimp.at[sl].set(rep(si))
    includemargin = includemargin.at[sl].set(rep(inc))

  con = con.replace(dist=dist, pos=pos, frame=frame, friction=friction,
                    solref=solref, solimp=solimp, includemargin=includemargin)
  ncon_active = jnp.sum((dist < includemargin).astype(jnp.int32))
  return d.replace(contact=con, ncon_active=ncon_active)
