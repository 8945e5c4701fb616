"""Mesh (convex hull) narrowphase oracle tests.

MuJoCo collides mesh geoms through its general convex collider; the
engine collides precomputed hulls (physics/mesh.py) with exact
plane/sphere paths and the erode + alternating-projection convex core
for the rest — same documented ~millimetre near-touch accuracy as the
ellipsoid/cylinder solid pairs (tests/test_collision_pairs.py).
Reference analog: mesh narrowphase lives in mujoco_warp, outside
/root/reference; the oracle is CPU mujoco.mj_forward.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io
from mjlab_tpu.physics.collision import collision

OCTA = '0.1 0 0  -0.1 0 0  0 0.12 0  0 -0.12 0  0 0 0.08  0 0 -0.08'
# an asymmetric 7-vertex convex solid
GEM = ('0.09 0.02 0  -0.07 0.05 0.01  0.01 -0.08 0.02  -0.02 0.07 -0.03  '
       '0.03 0.01 0.08  -0.01 -0.02 -0.09  0.08 -0.06 0.03')

_GEOM_XML = {
    'sphere': '<geom type="sphere" size="0.08" mass="0.2"/>',
    'capsule': '<geom type="capsule" size="0.05 0.12" mass="0.2"/>',
    'ellipsoid': '<geom type="ellipsoid" size="0.1 0.07 0.05" mass="0.2"/>',
    'cylinder': '<geom type="cylinder" size="0.07 0.1" mass="0.2"/>',
    'box': '<geom type="box" size="0.08 0.06 0.05" mass="0.2"/>',
    'mesh': '<geom type="mesh" mesh="octa" mass="0.2"/>',
    'mesh2': '<geom type="mesh" mesh="gem" mass="0.2"/>',
}

PARTNERS = ['sphere', 'capsule', 'ellipsoid', 'cylinder', 'box', 'mesh2']


def _scene(t1, pos2, euler2):
  xml = f"""
<mujoco>
  <asset>
    <mesh name="octa" vertex="{OCTA}"/>
    <mesh name="gem" vertex="{GEM}"/>
  </asset>
  <worldbody>
    <body name="b0" pos="0 0 0">
      {_GEOM_XML[t1]}
    </body>
    <body name="b1" pos="{pos2[0]} {pos2[1]} {pos2[2]}"
          euler="{euler2[0]} {euler2[1]} {euler2[2]}">
      <freejoint/>
      {_GEOM_XML['mesh']}
    </body>
  </worldbody>
</mujoco>"""
  return mujoco.MjModel.from_xml_string(xml)


def _mj_contact(mj):
  md = mujoco.MjData(mj)
  mujoco.mj_forward(mj, md)
  if md.ncon == 0:
    return None
  i = min(range(md.ncon), key=lambda i: md.contact[i].dist)
  return float(md.contact[i].dist), md.contact[i].frame[:3].copy()


def _fk(model, d, mj):
  from mjlab_tpu.physics import kinematics
  md = mujoco.MjData(mj)
  mujoco.mj_forward(mj, md)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()))
  return kinematics.kinematics(model, d)


def test_hull_build():
  # 'octa' is used by the colliding body-1 geom; 'gem' is declared but
  # referenced by NO geom in this scene, so (like a visual-only STL
  # shell) its hull row must be skipped: zero mask + rin == 0
  mj = _scene('sphere', (1, 0, 0), (0, 0, 0))
  model = io.put_model(mj, dtype=jnp.float64)
  h = model.stat.mesh_hulls
  assert h is not None and model.stat.nmesh == 2
  octa = int(mj.geom_dataid[mj.geom_dataid >= 0][0])
  gem = 1 - octa
  assert int(h.vmask[octa].sum()) == 6  # octahedron: all 6 verts on hull
  assert int(h.fmask[octa].sum()) == 8
  assert h.rin[octa] > 0
  # unreferenced/visual-only mesh: hull-build skipped entirely
  assert h.rin[gem] == 0 and int(h.vmask[gem].sum()) == 0
  # outward planes of the built hull: center strictly inside
  margins = h.foff[octa] - h.fnorm[octa] @ h.center[octa]
  assert (margins[h.fmask[octa] > 0] > 0).all()


def test_hull_build_all_colliding():
  # both meshes carried by colliding geoms -> both hulls built
  mj = _scene('mesh2', (1, 0, 0), (0, 0, 0))
  model = io.put_model(mj, dtype=jnp.float64)
  h = model.stat.mesh_hulls
  assert (h.rin > 0).all()
  for i in range(2):
    margins = h.foff[i] - h.fnorm[i] @ h.center[i]
    assert (margins[h.fmask[i] > 0] > 0).all()


@pytest.mark.parametrize('t1', PARTNERS)
def test_mesh_pair_near_touch_oracle(t1):
  import zlib
  rng = np.random.default_rng(zlib.crc32(f'{t1}-mesh'.encode()))
  checked = 0
  for trial in range(24):
    dirn = rng.normal(size=3)
    dirn /= np.linalg.norm(dirn)
    center_dist = rng.uniform(0.08, 0.16)
    pos2 = dirn * center_dist
    euler2 = rng.uniform(-40, 40, 3)
    mj = _scene(t1, pos2, euler2)
    c = _mj_contact(mj)
    if c is None or c[0] > 0.0 or c[0] < -0.02:
      continue
    c_dist, c_normal = c

    model = io.put_model(mj, dtype=jnp.float64)
    d = io.make_data(model, dtype=jnp.float64)
    d = _fk(model, d, mj)
    d = collision(model, d)
    dist = np.asarray(d.contact.dist)
    k = int(np.argmin(dist))
    assert dist[k] < 0.003, (t1, trial, dist[k], c_dist)
    assert abs(dist[k] - c_dist) < 8e-3, (t1, trial, dist[k], c_dist)
    ours_n = np.asarray(d.contact.frame[k, 0])
    # flat-flat (box/mesh face) configurations have genuinely ambiguous
    # normals between MPR's face pick and the closest-point direction;
    # slightly looser than the curved-solid pairs' 0.9
    assert abs(float(ours_n @ c_normal)) > 0.85, (t1, trial)
    checked += 1
  assert checked >= 3, f'too few contact configurations sampled ({checked})'


def test_mesh_plane_rollout_oracle():
  """Octahedron dropped on a plane: full-step trajectory tracks mj_step
  and both settle at the same rest height."""
  xml = f"""
<mujoco>
  <option timestep="0.002" iterations="30" ls_iterations="50">
    <flag eulerdamp="disable"/>
  </option>
  <asset><mesh name="octa" vertex="{OCTA}"/></asset>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.25"><freejoint/>
      <geom type="mesh" mesh="octa" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>"""
  mj = mujoco.MjModel.from_xml_string(xml)
  mj.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  model = io.put_model(mj, dtype=jnp.float64)
  from mjlab_tpu.physics.pipeline import step
  d = io.make_data(model, dtype=jnp.float64)
  md = mujoco.MjData(mj)
  jstep = jax.jit(lambda dd: step(model, dd))
  for i in range(200):
    d = jstep(d)
    mujoco.mj_step(mj, md)
    if i == 99:  # pre/early-contact: machine-precision agreement
      assert np.abs(np.asarray(d.qpos) - md.qpos).max() < 1e-6
  assert bool(jnp.isfinite(d.qpos).all())
  # settled to the same resting face/height (manifold transients may
  # differ at the documented approximation level)
  assert abs(float(d.qpos[2]) - float(md.qpos[2])) < 2e-3
  assert int(d.ncon_active) == md.ncon
