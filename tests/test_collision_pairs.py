"""Narrowphase oracle tests for the convex-solid pair approximations.

MuJoCo routes ellipsoid/cylinder solid pairs through its general convex
collider (MPR); the engine approximates them with alternating projection,
so the oracle comparison uses loose tolerances on contact distance and
normal alignment near touching configurations — documented approximation,
unlike the machine-precision dedicated primitive pairs.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io
from mjlab_tpu.physics.collision import collision
from mjlab_tpu.physics.pipeline import forward

_GEOM_XML = {
    'sphere': '<geom name="g{i}" type="sphere" size="0.08" mass="0.2"/>',
    'capsule': ('<geom name="g{i}" type="capsule" size="0.05 0.12" '
                'mass="0.2"/>'),
    'ellipsoid': ('<geom name="g{i}" type="ellipsoid" size="0.1 0.07 0.05" '
                  'mass="0.2"/>'),
    'cylinder': ('<geom name="g{i}" type="cylinder" size="0.07 0.1" '
                 'mass="0.2"/>'),
    'box': '<geom name="g{i}" type="box" size="0.08 0.06 0.05" mass="0.2"/>',
}

PAIRS = [
    ('sphere', 'ellipsoid'),
    ('capsule', 'ellipsoid'),
    ('capsule', 'cylinder'),
    ('ellipsoid', 'ellipsoid'),
    ('ellipsoid', 'cylinder'),
    ('ellipsoid', 'box'),
    ('cylinder', 'cylinder'),
    ('cylinder', 'box'),
]


def _scene(t1, t2, pos2, euler2):
  xml = f"""
<mujoco>
  <worldbody>
    <body name="b0" pos="0 0 0">
      {_GEOM_XML[t1].format(i=0)}
    </body>
    <body name="b1" pos="{pos2[0]} {pos2[1]} {pos2[2]}"
          euler="{euler2[0]} {euler2[1]} {euler2[2]}">
      <freejoint/>
      {_GEOM_XML[t2].format(i=1)}
    </body>
  </worldbody>
</mujoco>"""
  return mujoco.MjModel.from_xml_string(xml)


def _mj_contact(mj):
  """(dist, normal) of the deepest oracle contact — values copied out
  (contact views dangle once the MjData is collected)."""
  md = mujoco.MjData(mj)
  mujoco.mj_forward(mj, md)
  if md.ncon == 0:
    return None
  i = min(range(md.ncon), key=lambda i: md.contact[i].dist)
  return float(md.contact[i].dist), md.contact[i].frame[:3].copy()


@pytest.mark.parametrize('t1,t2', PAIRS)
def test_pair_near_touch_oracle(t1, t2):
  """Randomized nearly-touching placements: distance within ~2mm of the
  MuJoCo convex collider, normals aligned."""
  import zlib
  rng = np.random.default_rng(zlib.crc32(f'{t1}-{t2}'.encode()))
  checked = 0
  for trial in range(24):
    dirn = rng.normal(size=3)
    dirn /= np.linalg.norm(dirn)
    center_dist = rng.uniform(0.10, 0.18)
    pos2 = dirn * center_dist
    euler2 = rng.uniform(-40, 40, 3)
    mj = _scene(t1, t2, pos2, euler2)
    c = _mj_contact(mj)
    if c is None or c[0] > 0.0 or c[0] < -0.02:
      continue
    c_dist, c_normal = c

    model = io.put_model(mj, dtype=jnp.float64)
    d = io.make_data(model, dtype=jnp.float64)
    d = forward_kin(model, d, mj)
    d = collision(model, d)
    dist = np.asarray(d.contact.dist)
    k = int(np.argmin(dist))
    assert dist[k] < 0.003, (t1, t2, trial, dist[k], c_dist)
    # documented approximation: alternating projection + erosion agrees
    # with MPR to millimetres near touch, not machine precision
    assert abs(dist[k] - c_dist) < 8e-3, (t1, t2, trial, dist[k], c_dist)
    ours_n = np.asarray(d.contact.frame[k, 0])
    assert abs(float(ours_n @ c_normal)) > 0.9, (t1, t2, trial)
    checked += 1
  assert checked >= 3, f'too few contact configurations sampled ({checked})'


def forward_kin(model, d, mj):
  """Fill kinematics for the default qpos (matches mj_forward pose)."""
  from mjlab_tpu.physics import kinematics
  md = mujoco.MjData(mj)
  mujoco.mj_forward(mj, md)
  d = d.replace(qpos=jnp.asarray(md.qpos.copy()))
  d = kinematics.kinematics(model, d)
  return d


@pytest.mark.parametrize('t2', ['ellipsoid', 'cylinder'])
def test_pair_settles_on_floor(t2):
  """Dynamic sanity: the solid dropped onto a box floor settles finitely
  (exercises the convex pairs inside the full pipeline)."""
  xml = f"""
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body name="floor">
      <geom name="floorg" type="box" size="1 1 0.1" pos="0 0 -0.1"/>
    </body>
    <body name="b" pos="0.02 0.01 0.3" euler="20 15 5">
      <freejoint/>
      {_GEOM_XML[t2].format(i=1)}
    </body>
  </worldbody>
</mujoco>"""
  mj = mujoco.MjModel.from_xml_string(xml)
  model = io.put_model(mj, dtype=jnp.float64)
  from mjlab_tpu.physics.pipeline import step
  d = io.make_data(model, dtype=jnp.float64)
  jstep = jax.jit(lambda dd: step(model, dd))
  for _ in range(250):
    d = jstep(d)
  assert bool(jnp.isfinite(d.qpos).all())
  z = float(d.qpos[2])
  assert 0.0 < z < 0.2, z
