"""One-time extraction of real robot description data from the reference.

Reads the reference Unitree G1/Go1 MJCF (compiling with mesh assets so
every attribute is resolved to canonical MuJoCo form), then emits Python
data tables holding only the *physical* description of the robot: body
tree with explicit inertials, joints, primitive collision geoms, sites,
cameras and contact excludes. Visual mesh geoms are density=0 /
contype=conaffinity=0 in the reference (g1.xml:7, go1.xml:7), so they
carry no physics and are dropped — the emitted model is physically
identical to the reference robot.

Run from repo root:  python tools/extract_robot_spec.py

Output: mjlab_tpu/asset_zoo/data/{g1,go1}_spec_data.py, then verifies the
round trip (build MjSpec from tables -> compile -> compare arrays vs the
reference-compiled model).
"""

from __future__ import annotations

import sys
from pathlib import Path

import mujoco
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = Path('/root/reference/src/mjlab/asset_zoo/robots')

_JOINT_TYPE = {
    mujoco.mjtJoint.mjJNT_FREE: 'free',
    mujoco.mjtJoint.mjJNT_BALL: 'ball',
    mujoco.mjtJoint.mjJNT_SLIDE: 'slide',
    mujoco.mjtJoint.mjJNT_HINGE: 'hinge',
}
_GEOM_TYPE = {
    mujoco.mjtGeom.mjGEOM_SPHERE: 'sphere',
    mujoco.mjtGeom.mjGEOM_CAPSULE: 'capsule',
    mujoco.mjtGeom.mjGEOM_CYLINDER: 'cylinder',
    mujoco.mjtGeom.mjGEOM_BOX: 'box',
    mujoco.mjtGeom.mjGEOM_ELLIPSOID: 'ellipsoid',
}
_CAM_MODE = {
    mujoco.mjtCamLight.mjCAMLIGHT_FIXED: 'fixed',
    mujoco.mjtCamLight.mjCAMLIGHT_TRACK: 'track',
    mujoco.mjtCamLight.mjCAMLIGHT_TRACKCOM: 'trackcom',
    mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODY: 'targetbody',
    mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODYCOM: 'targetbodycom',
}


def _t(a) -> tuple:
  return tuple(round(float(x), 12) for x in np.asarray(a).ravel())


def _load_ref_model(xml_path: Path) -> mujoco.MjModel:
  """Compile the reference XML with all mesh geoms stripped.

  Mesh geoms are visual-only (massless, contype=conaffinity=0) in both
  reference robots, so removing them changes nothing physical — and some
  STL files are absent from the reference checkout anyway."""
  spec = mujoco.MjSpec.from_file(str(xml_path))
  for g in list(spec.geoms):
    if g.type == mujoco.mjtGeom.mjGEOM_MESH:
      spec.delete(g)
  for m in list(spec.meshes):
    spec.delete(m)
  return spec.compile()


def extract(xml_path: Path, modelname: str) -> dict:
  model = _load_ref_model(xml_path)

  def name(adr_obj, i):
    return mujoco.mj_id2name(model, adr_obj, i) or ''

  bodies = []
  for b in range(1, model.nbody):
    joints = []
    for j in range(model.body_jntadr[b], model.body_jntadr[b] + model.body_jntnum[b]):
      joints.append({
          'name': name(mujoco.mjtObj.mjOBJ_JOINT, j),
          'type': _JOINT_TYPE[mujoco.mjtJoint(model.jnt_type[j])],
          'pos': _t(model.jnt_pos[j]),
          'axis': _t(model.jnt_axis[j]),
          'range': _t(model.jnt_range[j]),
      })
    geoms = []
    for g in range(model.body_geomadr[b], model.body_geomadr[b] + model.body_geomnum[b]):
      gt = mujoco.mjtGeom(model.geom_type[g])
      if gt == mujoco.mjtGeom.mjGEOM_MESH:
        continue  # visual-only in both reference robots
      geoms.append({
          'name': name(mujoco.mjtObj.mjOBJ_GEOM, g),
          'type': _GEOM_TYPE[gt],
          'size': _t(model.geom_size[g]),
          'pos': _t(model.geom_pos[g]),
          'quat': _t(model.geom_quat[g]),
          'contype': int(model.geom_contype[g]),
          'conaffinity': int(model.geom_conaffinity[g]),
          'condim': int(model.geom_condim[g]),
          'group': int(model.geom_group[g]),
          'friction': _t(model.geom_friction[g]),
          'rgba': _t(model.geom_rgba[g]),
      })
    sites = []
    for s in range(model.nsite):
      if model.site_bodyid[s] != b:
        continue
      sites.append({
          'name': name(mujoco.mjtObj.mjOBJ_SITE, s),
          'pos': _t(model.site_pos[s]),
          'quat': _t(model.site_quat[s]),
          'size': _t(model.site_size[s]),
          'group': int(model.site_group[s]),
          'rgba': _t(model.site_rgba[s]),
      })
    cams = []
    for c in range(model.ncam):
      if model.cam_bodyid[c] != b:
        continue
      cams.append({
          'name': name(mujoco.mjtObj.mjOBJ_CAMERA, c),
          'pos': _t(model.cam_pos[c]),
          'quat': _t(model.cam_quat[c]),
          'mode': _CAM_MODE[mujoco.mjtCamLight(model.cam_mode[c])],
          'fovy': float(model.cam_fovy[c]),
      })
    bodies.append({
        'name': name(mujoco.mjtObj.mjOBJ_BODY, b),
        'parent': name(mujoco.mjtObj.mjOBJ_BODY, model.body_parentid[b]),
        'pos': _t(model.body_pos[b]),
        'quat': _t(model.body_quat[b]),
        'mass': round(float(model.body_mass[b]), 12),
        'ipos': _t(model.body_ipos[b]),
        'iquat': _t(model.body_iquat[b]),
        'inertia': _t(model.body_inertia[b]),
        'joints': joints,
        'geoms': geoms,
        'sites': sites,
        'cameras': cams,
    })

  excludes = []
  for e in range(model.nexclude):
    sig = int(model.exclude_signature[e])
    b1, b2 = sig >> 16, sig & 0xFFFF
    excludes.append((name(mujoco.mjtObj.mjOBJ_BODY, b1),
                     name(mujoco.mjtObj.mjOBJ_BODY, b2)))

  return {'modelname': modelname, 'bodies': bodies, 'excludes': excludes,
          'visuals': extract_visuals(xml_path)}


def extract_visuals(xml_path: Path) -> dict:
  """Extract the visual mesh layer at SPEC level (pre-compile).

  Spec-level pos/quat are the raw XML values; mujoco's mesh processing
  (vertex recentering baked into compiled geom_pos/quat) is re-applied
  identically when OUR spec compiles the same STL data, so spec-level is
  the frame that round-trips. Mesh assets whose STL file is missing from
  the reference checkout (go1 trunk.stl) are skipped with their geoms.
  """
  spec = mujoco.MjSpec.from_file(str(xml_path))
  mats = {m.name: _t(m.rgba) for m in spec.materials}
  assets_dir = xml_path.parent / 'assets'
  meshes, have = [], set()
  for m in spec.meshes:
    fname = Path(m.file).name
    if not (assets_dir / fname).exists():
      print(f'  [visuals] skipping mesh {fname}: file absent from the '
            f'reference checkout')
      continue
    name = m.name or Path(fname).stem
    meshes.append({'name': name, 'file': fname})
    have.add(name)
  geoms = []
  for g in spec.geoms:
    if g.type != mujoco.mjtGeom.mjGEOM_MESH or g.meshname not in have:
      continue
    cls_mat = g.classname.geom.material if g.classname else ''
    mat = g.material or cls_mat
    geoms.append({
        'body': g.parent.name,
        'mesh': g.meshname,
        'pos': _t(g.pos),
        'quat': _t(g.quat),
        'rgba': mats.get(mat, (0.7, 0.7, 0.7, 1.0)),
    })
  return {'meshes': meshes, 'geoms': geoms}


def _fmt(obj, indent=0) -> str:
  pad = '    ' * indent
  if isinstance(obj, dict):
    items = ',\n'.join(f"{pad}    '{k}': {_fmt(v, indent + 1)}"
                       for k, v in obj.items())
    return '{\n' + items + f',\n{pad}}}'
  if isinstance(obj, list):
    if not obj:
      return '[]'
    items = ',\n'.join(f'{pad}    {_fmt(v, indent + 1)}' for v in obj)
    return '[\n' + items + f',\n{pad}]'
  if isinstance(obj, tuple):
    return '(' + ', '.join(repr(v) for v in obj) + ')'
  return repr(obj)


HEADER = '''"""Unitree {robot} physical description data (auto-generated).

Generated by tools/extract_robot_spec.py from the reference robot
description (reference {src}): the real
body tree, explicit link inertials, joint axes/ranges, primitive
collision geoms, sites, cameras and contact excludes, resolved to
canonical MuJoCo form — plus the visual mesh layer ('visuals': STL asset
file names under asset_zoo/robots/ and massless, non-colliding mesh
geom attachments; physics is unchanged with or without it).

Do not edit by hand; re-run the tool instead.
"""

# fmt: off
'''


def emit(data: dict, out: Path, robot: str, src: str) -> None:
  body = HEADER.format(robot=robot, src=src) + 'SPEC_DATA = ' + _fmt(data) + '\n'
  out.write_text(body)
  print(f'wrote {out} ({len(body.splitlines())} lines)')


def verify(xml_path: Path, data: dict) -> None:
  from mjlab_tpu.asset_zoo.spec_builder import build_robot_spec
  ref = _load_ref_model(xml_path)
  ours = build_robot_spec(data).compile()

  assert ours.nbody == ref.nbody, (ours.nbody, ref.nbody)
  assert ours.njnt == ref.njnt
  assert ours.nq == ref.nq and ours.nv == ref.nv
  worst = 0.0
  for f in ('body_pos', 'body_quat', 'body_ipos', 'body_iquat', 'body_mass',
            'body_inertia', 'jnt_axis', 'jnt_range', 'jnt_pos', 'qpos0'):
    d = float(np.abs(getattr(ours, f) - getattr(ref, f)).max())
    worst = max(worst, d)
    assert d < 1e-9, (f, d)

  def geom_table(m):
    out = {}
    for g in range(m.ngeom):
      if m.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH:
        continue
      n = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
      out[n] = np.concatenate([
          [m.geom_type[g], m.geom_contype[g], m.geom_conaffinity[g],
           m.geom_condim[g], m.geom_group[g]],
          m.geom_size[g], m.geom_pos[g], m.geom_quat[g], m.geom_friction[g]])
    return out

  gt_ref, gt_ours = geom_table(ref), geom_table(ours)
  assert set(gt_ref) == set(gt_ours), set(gt_ref) ^ set(gt_ours)
  for n in gt_ref:
    d = float(np.abs(gt_ref[n] - gt_ours[n]).max())
    worst = max(worst, d)
    assert d < 1e-9, (n, d)
  assert ours.nexclude == ref.nexclude
  print(f'  verified vs reference model: max abs diff {worst:.2e}, '
        f'{ours.nbody - 1} bodies, {ours.njnt} joints, '
        f'{len(gt_ours)} collision geoms, {ours.nexclude} excludes')


def main() -> None:
  outdir = REPO / 'mjlab_tpu' / 'asset_zoo' / 'data'
  outdir.mkdir(exist_ok=True)
  (outdir / '__init__.py').touch()

  for robot, sub in (('G1', 'unitree_g1'), ('Go1', 'unitree_go1')):
    xml = REF / sub / 'xmls' / ('g1.xml' if robot == 'G1' else 'go1.xml')
    src = f'src/mjlab/asset_zoo/robots/{sub}/xmls/{xml.name}'
    data = extract(xml, robot.lower())
    emit(data, outdir / f'{robot.lower()}_spec_data.py', robot, src)
    verify(xml, data)


if __name__ == '__main__':
  main()
