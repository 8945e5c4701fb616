"""Build an MjSpec from extracted robot description data tables.

Counterpart of tools/extract_robot_spec.py: reconstructs the real robot
(body tree, explicit inertials, joints, primitive collision geoms, sites,
cameras, contact excludes) from the data modules in
mjlab_tpu/asset_zoo/data/. Replaces the reference's MjSpec.from_file over
mesh-bearing XMLs (reference
src/mjlab/asset_zoo/robots/unitree_g1/g1_constants.py:32-35) with a
programmatic build. The visual mesh layer (massless, non-colliding
group-2 geoms over STL assets in asset_zoo/robots/) is attached when
visuals=True — physics is identical either way.
"""

from __future__ import annotations

import mujoco

_JOINT_TYPE = {
    'free': mujoco.mjtJoint.mjJNT_FREE,
    'ball': mujoco.mjtJoint.mjJNT_BALL,
    'slide': mujoco.mjtJoint.mjJNT_SLIDE,
    'hinge': mujoco.mjtJoint.mjJNT_HINGE,
}
_GEOM_TYPE = {
    'sphere': mujoco.mjtGeom.mjGEOM_SPHERE,
    'capsule': mujoco.mjtGeom.mjGEOM_CAPSULE,
    'cylinder': mujoco.mjtGeom.mjGEOM_CYLINDER,
    'box': mujoco.mjtGeom.mjGEOM_BOX,
    'ellipsoid': mujoco.mjtGeom.mjGEOM_ELLIPSOID,
}
_CAM_MODE = {
    'fixed': mujoco.mjtCamLight.mjCAMLIGHT_FIXED,
    'track': mujoco.mjtCamLight.mjCAMLIGHT_TRACK,
    'trackcom': mujoco.mjtCamLight.mjCAMLIGHT_TRACKCOM,
    'targetbody': mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODY,
    'targetbodycom': mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODYCOM,
}


def build_robot_spec(data: dict, visuals: bool = True,
                     assets_dir=None) -> mujoco.MjSpec:
  spec = mujoco.MjSpec()
  spec.modelname = data['modelname']
  spec.compiler.degree = False

  parents = {'world': spec.worldbody}
  for bd in data['bodies']:
    body = parents[bd['parent']].add_body(
        name=bd['name'], pos=list(bd['pos']), quat=list(bd['quat']))
    body.mass = bd['mass']
    body.ipos = list(bd['ipos'])
    body.iquat = list(bd['iquat'])
    body.inertia = list(bd['inertia'])
    body.explicitinertial = True
    parents[bd['name']] = body

    for jd in bd['joints']:
      jtype = _JOINT_TYPE[jd['type']]
      kwargs = {}
      if jtype not in (mujoco.mjtJoint.mjJNT_FREE, mujoco.mjtJoint.mjJNT_BALL):
        if jd['range'][0] != 0.0 or jd['range'][1] != 0.0:
          kwargs['range'] = list(jd['range'])
      body.add_joint(name=jd['name'], type=jtype, pos=list(jd['pos']),
                     axis=list(jd['axis']), **kwargs)

    for gd in bd['geoms']:
      body.add_geom(
          name=gd['name'], type=_GEOM_TYPE[gd['type']],
          size=list(gd['size']), pos=list(gd['pos']), quat=list(gd['quat']),
          contype=gd['contype'], conaffinity=gd['conaffinity'],
          condim=gd['condim'], group=gd['group'],
          friction=list(gd['friction']), rgba=list(gd['rgba']))

    for sd in bd['sites']:
      body.add_site(
          name=sd['name'], pos=list(sd['pos']), quat=list(sd['quat']),
          size=list(sd['size']), group=sd['group'], rgba=list(sd['rgba']))

    for cd in bd['cameras']:
      body.add_camera(name=cd['name'], pos=list(cd['pos']),
                      quat=list(cd['quat']), mode=_CAM_MODE[cd['mode']],
                      fovy=cd['fovy'])

  for b1, b2 in data['excludes']:
    exc = spec.add_exclude()
    exc.bodyname1 = b1
    exc.bodyname2 = b2

  vis = data.get('visuals')
  if vis and visuals and assets_dir is not None:
    _add_visuals(spec, parents, vis, assets_dir)
  return spec


def _add_visuals(spec: mujoco.MjSpec, bodies: dict, vis: dict,
                 assets_dir) -> None:
  """Attach the visual mesh layer: STL assets embedded as uservert (so
  MjSpec.attach during scene composition never resolves meshdir paths)
  plus massless contype=conaffinity=0 group-2 mesh geoms, mirroring the
  reference robots' visual class (reference
  src/mjlab/asset_zoo/robots/unitree_g1/xmls/g1.xml:7)."""
  from mjlab_tpu.asset_zoo.stl import load_stl

  for md in vis['meshes']:
    verts, faces = load_stl(str(assets_dir / md['file']))
    mesh = spec.add_mesh()
    mesh.name = md['name']
    mesh.uservert = verts.ravel().tolist()
    mesh.userface = faces.ravel().tolist()
  for i, gd in enumerate(vis['geoms']):
    g = bodies[gd['body']].add_geom(
        name=f"{gd['mesh']}_visual_{i}",
        type=mujoco.mjtGeom.mjGEOM_MESH, meshname=gd['mesh'],
        pos=list(gd['pos']), quat=list(gd['quat']),
        contype=0, conaffinity=0, group=2, rgba=list(gd['rgba']))
    g.density = 0.0
