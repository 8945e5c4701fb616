"""Viewer-support tests: primitive triangulation (viser conversions
analog, reference tests/test_viser_conversions.py) and the debug
visualizer's scene-geom drawing."""

import mujoco
import numpy as np
import pytest

from mjlab_tpu.viewer import primitives


def _closed_mesh_checks(verts, faces, radius_bound):
  assert verts.ndim == 2 and verts.shape[1] == 3
  assert faces.ndim == 2 and faces.shape[1] == 3
  assert faces.min() >= 0 and faces.max() < len(verts)
  assert np.linalg.norm(verts, axis=1).max() <= radius_bound + 1e-9
  # every edge of a closed orientable mesh appears exactly twice,
  # in opposite directions
  edges = {}
  for f in faces:
    for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
      edges[(a, b)] = edges.get((a, b), 0) + 1
  for (a, b), count in edges.items():
    assert count == 1, 'duplicate directed edge'
    assert (b, a) in edges, 'boundary edge in closed mesh'


def test_sphere_mesh_closed():
  v, f = primitives.uv_sphere(0.3)
  assert np.allclose(np.linalg.norm(v, axis=1), 0.3, atol=1e-9)


def test_capsule_mesh():
  r, hl = 0.05, 0.2
  v, f = primitives.capsule_mesh(r, hl)
  assert np.abs(v[:, 2]).max() <= hl + r + 1e-9
  xy = np.linalg.norm(v[:, :2], axis=1)
  assert xy.max() <= r + 1e-9
  _closed_mesh_checks(v, f, hl + r)


def test_cylinder_mesh_closed():
  v, f = primitives.cylinder_shell(0.1, 0.3)
  _closed_mesh_checks(v, f, np.sqrt(0.1 ** 2 + 0.3 ** 2))


def test_box_mesh_closed():
  v, f = primitives.box_mesh((0.1, 0.2, 0.3))
  _closed_mesh_checks(v, f, np.linalg.norm([0.1, 0.2, 0.3]))
  assert len(v) == 8 and len(f) == 12


def test_geom_mesh_dispatch():
  for gtype, size in [
      (mujoco.mjtGeom.mjGEOM_SPHERE, [0.1, 0, 0]),
      (mujoco.mjtGeom.mjGEOM_CAPSULE, [0.05, 0.2, 0]),
      (mujoco.mjtGeom.mjGEOM_CYLINDER, [0.05, 0.2, 0]),
      (mujoco.mjtGeom.mjGEOM_BOX, [0.1, 0.1, 0.1]),
      (mujoco.mjtGeom.mjGEOM_ELLIPSOID, [0.1, 0.2, 0.3]),
      (mujoco.mjtGeom.mjGEOM_PLANE, [1.0, 1.0, 0.1]),
  ]:
    out = primitives.geom_mesh(int(gtype), size)
    assert out is not None, gtype
  assert primitives.geom_mesh(int(mujoco.mjtGeom.mjGEOM_MESH), [0, 0, 0]) \
      is None


def test_mujoco_mesh_extraction():
  """Mesh geoms render from the compiled model's mesh asset tables
  (reference renders via trimesh->GLB, ref viser_conversions.py)."""
  xml = """
  <mujoco>
    <asset>
      <mesh name="tet" vertex="0 0 0  1 0 0  0 1 0  0 0 1"/>
    </asset>
    <worldbody>
      <geom type="plane" size="1 1 0.1"/>
      <body><freejoint/>
        <geom type="mesh" mesh="tet" pos="0 0 1"/>
      </body>
    </worldbody>
  </mujoco>"""
  mj = mujoco.MjModel.from_xml_string(xml)
  got = None
  for g in range(mj.ngeom):
    out = primitives.mujoco_mesh(mj, g)
    if mj.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH:
      assert out is not None
      got = out
    else:
      assert out is None
  verts, faces = got
  assert verts.shape == (4, 3)
  assert faces.min() >= 0 and faces.max() < 4


def test_arrow_mesh():
  v, f = primitives.arrow_mesh(1.0, 0.02)
  assert v[:, 2].min() >= -1e-9 and v[:, 2].max() <= 1.0 + 1e-9


def test_scene_visualizer_ghost():
  """MujocoSceneVisualizer FK-ghost drawing into an mjvScene."""
  from mjlab_tpu.asset_zoo.unitree_go1 import GO1_ROBOT_CFG
  from mjlab_tpu.entity.entity import Entity
  from mjlab_tpu.viewer.debug_visualizer import MujocoSceneVisualizer

  mj = Entity(GO1_ROBOT_CFG).spec.compile()
  scn = mujoco.MjvScene(mj, maxgeom=200)
  vis = MujocoSceneVisualizer(scn, mj)
  vis.clear()
  kid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_KEY, 'init_state')
  vis.add_ghost_qpos(mj.key_qpos[kid], alpha=0.4)
  n_prims = sum(1 for g in range(mj.ngeom) if mj.geom_bodyid[g] != 0)
  assert scn.ngeom == n_prims
  vis.add_arrow([0, 0, 0], [0, 0, 1])
  vis.add_sphere([1, 0, 0])
  assert scn.ngeom == n_prims + 2
  vis.clear()
  assert scn.ngeom == 0
