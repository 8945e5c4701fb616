"""Convex-hull data for mesh geoms (host-side, model-build time).

MuJoCo collides mesh geoms against their convex hulls (its general
convex collider, engine mjc_Convex via libccd MPR, operates on support
functions of the hull). The TPU engine precomputes each mesh's hull as
static model constants — vertices for support lookups, outward face
planes and triangles for exact point-to-hull projection — padded to one
fixed (Vmax, Fmax) so every mesh pair group is a single vectorized
narrowphase call with static shapes. Hulls are built with qhull
(scipy.spatial.ConvexHull) at put_model time; runtime code never touches
mesh topology.

Reference parity: the reference delegates mesh narrowphase to
mujoco_warp's convex collider (reference src/mjlab/sim/sim.py put_model;
mesh assets appear in e.g. the robot XMLs as visual group-2 geoms and in
user MJCF as collision geoms).
"""

from __future__ import annotations

from typing import NamedTuple

import mujoco
import numpy as np

# Hull size cap: qhull output is re-reduced by mujoco's maxhullvert
# compiler setting (default 64 in recent MuJoCo); meshes beyond the cap
# should be decimated at authoring time.
MAX_HULL_VERT = 64
# Euler: a convex polytope with V vertices has at most 2V - 4 triangles.
MAX_HULL_FACE = 2 * MAX_HULL_VERT - 4


class MeshHulls(NamedTuple):
  """Per-mesh padded hull arrays (all np.ndarray, static constants)."""

  vert: np.ndarray    # (nmesh, V, 3) hull vertices, mesh frame
  vmask: np.ndarray   # (nmesh, V) 1.0 for real vertices, 0.0 padding
  tri: np.ndarray     # (nmesh, F, 3, 3) face triangle corner coords
  fnorm: np.ndarray   # (nmesh, F, 3) outward unit face normals
  foff: np.ndarray    # (nmesh, F) plane offsets: inside <=> n.x <= off
  fmask: np.ndarray   # (nmesh, F) 1.0 for real faces
  center: np.ndarray  # (nmesh, 3) interior point (vertex centroid)
  rin: np.ndarray     # (nmesh,) inradius about center (min face margin)


def build_hulls(m: mujoco.MjModel) -> MeshHulls | None:
  """Extract padded convex hulls for every COLLIDABLE mesh asset.

  Meshes referenced only by visual geoms (contype == conaffinity == 0,
  e.g. the asset-zoo robots' STL shells) are skipped — their rows stay
  zero-masked and are never touched by the narrowphase, which only runs
  on candidate pairs of collidable geoms. This also exempts them from
  the MAX_HULL_VERT cap, which exists to bound the vectorized support
  search, not to restrict render geometry."""
  if m.nmesh == 0:
    return None
  from scipy.spatial import ConvexHull

  collidable = set()
  for g in range(m.ngeom):
    if (m.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH
        and (m.geom_contype[g] or m.geom_conaffinity[g])):
      collidable.add(int(m.geom_dataid[g]))

  vert = np.zeros((m.nmesh, MAX_HULL_VERT, 3))
  vmask = np.zeros((m.nmesh, MAX_HULL_VERT))
  tri = np.zeros((m.nmesh, MAX_HULL_FACE, 3, 3))
  fnorm = np.zeros((m.nmesh, MAX_HULL_FACE, 3))
  foff = np.zeros((m.nmesh, MAX_HULL_FACE))
  fmask = np.zeros((m.nmesh, MAX_HULL_FACE))
  center = np.zeros((m.nmesh, 3))
  rin = np.zeros(m.nmesh)

  for i in range(m.nmesh):
    if i not in collidable:
      continue
    adr, num = int(m.mesh_vertadr[i]), int(m.mesh_vertnum[i])
    pts = np.asarray(m.mesh_vert[adr:adr + num], dtype=np.float64)
    hull = ConvexHull(pts)
    hv = pts[hull.vertices]
    if len(hv) > MAX_HULL_VERT:
      raise NotImplementedError(
          f'mesh {i} convex hull has {len(hv)} vertices '
          f'(> {MAX_HULL_VERT}); decimate the collision mesh or set '
          f'compiler maxhullvert')
    c = hv.mean(axis=0)
    # qhull equations: n.x + d <= 0 inside, n outward unit
    eq = hull.equations  # (F, 4)
    faces = pts[hull.simplices]  # (F, 3, 3)
    nf = len(faces)
    if nf > MAX_HULL_FACE:  # cannot happen for V <= cap, guard anyway
      raise NotImplementedError(f'mesh {i} hull has {nf} faces')

    nv = len(hv)
    vert[i, :nv] = hv
    vert[i, nv:] = hv[0]
    vmask[i, :nv] = 1.0
    tri[i, :nf] = faces
    tri[i, nf:] = faces[0]
    fnorm[i, :nf] = eq[:, :3]
    fnorm[i, nf:] = eq[0, :3]
    foff[i, :nf] = -eq[:, 3]
    foff[i, nf:] = -eq[0, 3]
    fmask[i, :nf] = 1.0
    center[i] = c
    rin[i] = float(np.min(foff[i, :nf] - fnorm[i, :nf] @ c))
    if rin[i] <= 0:
      raise ValueError(f'mesh {i}: degenerate (flat) convex hull')

  return MeshHulls(vert=vert, vmask=vmask, tri=tri, fnorm=fnorm,
                   foff=foff, fmask=fmask, center=center, rin=rin)
