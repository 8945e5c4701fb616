"""MjModel -> TPU pytree conversion and Data allocation.

CPU MuJoCo stays the build-time authoring/compilation tool (as in the
reference, where MjSpec authoring happens on CPU and mujoco_warp consumes
the compiled model, reference src/mjlab/sim/sim.py:97-119). This module is
the TPU analog of `mjwarp.put_model` / `mjwarp.put_data`: it converts a
compiled `mujoco.MjModel` into the engine's `Model` pytree and allocates a
fresh `Data` pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.physics import mesh as _mesh
from mjlab_tpu.physics.types import (
    CollisionPairs,
    Contact,
    Data,
    GeomType,
    Model,
    ModelStatic,
    Option,
)

# Supported narrowphase collider keys -> max contact points per pair.
# Types are sorted (a <= b) using the GeomType enum ordering, which puts
# plane first (mirrors MuJoCo's collision table organization).
_COLLIDER_POINTS = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.PLANE, GeomType.ELLIPSOID): 1,
    (GeomType.PLANE, GeomType.CYLINDER): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.SPHERE, GeomType.CYLINDER): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 1,
    (GeomType.CAPSULE, GeomType.BOX): 2,
    (GeomType.BOX, GeomType.BOX): 8,
    (GeomType.SPHERE, GeomType.ELLIPSOID): 1,
    (GeomType.CAPSULE, GeomType.ELLIPSOID): 1,
    (GeomType.CAPSULE, GeomType.CYLINDER): 1,
    (GeomType.ELLIPSOID, GeomType.ELLIPSOID): 1,
    (GeomType.ELLIPSOID, GeomType.CYLINDER): 1,
    (GeomType.ELLIPSOID, GeomType.BOX): 1,
    (GeomType.CYLINDER, GeomType.CYLINDER): 1,
    (GeomType.CYLINDER, GeomType.BOX): 1,
    (GeomType.HFIELD, GeomType.SPHERE): 3,
    (GeomType.HFIELD, GeomType.CAPSULE): 3,
    (GeomType.HFIELD, GeomType.BOX): 4,
    # mesh pairs collide against precomputed convex hulls (physics/mesh.py);
    # plane-mesh yields a 4-point manifold (deepest hull vertices), the
    # convex pairs a single closest-point contact per pair
    (GeomType.PLANE, GeomType.MESH): 4,
    (GeomType.SPHERE, GeomType.MESH): 1,
    (GeomType.CAPSULE, GeomType.MESH): 1,
    (GeomType.ELLIPSOID, GeomType.MESH): 1,
    (GeomType.CYLINDER, GeomType.MESH): 1,
    (GeomType.BOX, GeomType.MESH): 1,
    (GeomType.MESH, GeomType.MESH): 1,
}


def _body_levels(parentid: np.ndarray) -> tuple:
  nbody = len(parentid)
  depth = np.zeros(nbody, dtype=np.int32)
  for b in range(1, nbody):
    depth[b] = depth[parentid[b]] + 1
  levels = []
  for d in range(1, depth.max() + 1 if nbody > 1 else 1):
    ids = np.nonzero(depth == d)[0].astype(np.int32)
    if len(ids):
      levels.append(ids)
  return tuple(levels)


def _ancestor_mask(m: mujoco.MjModel) -> np.ndarray:
  """mask[b, d] = 1 if dof d belongs to body b or one of its ancestors."""
  mask = np.zeros((m.nbody, m.nv), dtype=np.float64)
  for b in range(m.nbody):
    cur = b
    while cur != 0:
      adr, num = m.body_dofadr[cur], m.body_dofnum[cur]
      if num > 0:
        mask[b, adr:adr + num] = 1.0
      cur = m.body_parentid[cur]
  return mask


def _subtree_mask(parentid: np.ndarray) -> np.ndarray:
  nbody = len(parentid)
  mask = np.zeros((nbody, nbody), dtype=np.float64)
  for c in range(nbody):
    cur = c
    mask[cur, c] = 1.0
    while cur != 0:
      cur = parentid[cur]
      mask[cur, c] = 1.0
  return mask


def _dof_prefix_mask(m: mujoco.MjModel, ancestor: np.ndarray) -> np.ndarray:
  """prefix[d, e] = 1 if dof e contributes to the velocity 'seen' by dof d
  when computing cdof_dot (ancestor dofs of d's body, plus same-body dofs
  with smaller index). Mirrors the accumulation order of mj_comVel."""
  nv = m.nv
  prefix = np.zeros((nv, nv), dtype=np.float64)
  for d in range(nv):
    b = m.dof_bodyid[d]
    j = m.dof_jntid[d]
    prefix[d] = ancestor[b]
    # exclude all dofs of the owning joint (mj_comVel crosses every dof of a
    # multi-dof joint with the velocity accumulated before that joint), and
    # any later joints on the same body.
    # For free joints the 3 translational dofs do contribute to the
    # rotational dofs' cdof_dot.
    excl = m.jnt_dofadr[j]
    if m.jnt_type[j] == int(mujoco.mjtJoint.mjJNT_FREE):
      excl += 3
    adr, num = m.body_dofadr[b], m.body_dofnum[b]
    prefix[d, min(excl, d):adr + num] = 0.0
  return prefix


def _filter_pair(m: mujoco.MjModel, g1: int, g2: int) -> bool:
  """Static broadphase filter, mirroring MuJoCo's mj_filterPair logic on
  (contype, conaffinity), same-body and parent-child (weld) exclusion,
  plus the model's explicit <exclude> signature list."""
  b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
  if b1 == b2:
    return False
  if m.nexclude:
    sigs = m.exclude_signature
    if ((int(b1) << 16) + int(b2)) in sigs or \
       ((int(b2) << 16) + int(b1)) in sigs:
      return False
  w1, w2 = m.body_weldid[b1], m.body_weldid[b2]
  if w1 == w2:
    return False
  # parent-child exclusion (unless parent is world)
  wp1 = m.body_weldid[m.body_parentid[w1]]
  wp2 = m.body_weldid[m.body_parentid[w2]]
  if (w1 == wp2 and w1 != 0) or (w2 == wp1 and w2 != 0):
    return False
  ok = (m.geom_contype[g1] & m.geom_conaffinity[g2]) or \
       (m.geom_contype[g2] & m.geom_conaffinity[g1])
  return bool(ok)


def _build_pairs(m: mujoco.MjModel) -> CollisionPairs:
  groups: dict = {}

  def add(g1: int, g2: int, pairid: int) -> None:
    t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
    a, b = (g1, g2) if t1 <= t2 else (g2, g1)
    key = (min(t1, t2), max(t1, t2))
    if key not in _COLLIDER_POINTS:
      raise NotImplementedError(
          f'no collider for geom type pair {GeomType(key[0]).name}-'
          f'{GeomType(key[1]).name} (geoms {g1},{g2})')
    groups.setdefault(key, ([], [], []))
    groups[key][0].append(a)
    groups[key][1].append(b)
    groups[key][2].append(pairid)

  # explicit <pair> elements first: always collided, bypassing
  # contype/conaffinity and exclusion filters (mj_collision predefined
  # branch, MuJoCo computation docs "Collision detection")
  explicit = set()
  for p in range(m.npair):
    g1, g2 = int(m.pair_geom1[p]), int(m.pair_geom2[p])
    explicit.add((min(g1, g2), max(g1, g2)))
    add(g1, g2, p)
  # dynamic generation skips geom pairs already predefined (MuJoCo
  # dedups the same way)
  for g1 in range(m.ngeom):
    for g2 in range(g1 + 1, m.ngeom):
      if (g1, g2) in explicit or not _filter_pair(m, g1, g2):
        continue
      add(g1, g2, -1)
  ncon = 0
  final = {}
  for key in sorted(groups):
    g1s, g2s, pids = groups[key]
    final[key] = (np.asarray(g1s, np.int32), np.asarray(g2s, np.int32),
                  np.asarray(pids, np.int32), ncon, _COLLIDER_POINTS[key])
    ncon += len(g1s) * _COLLIDER_POINTS[key]
  return CollisionPairs(groups=final, ncon_max=ncon)


def contact_slot_meta(m: mujoco.MjModel, pairs: CollisionPairs):
  """Static per-contact-slot (geom1, geom2, condim) arrays."""
  geom1 = np.zeros(max(pairs.ncon_max, 1), np.int32)
  geom2 = np.zeros(max(pairs.ncon_max, 1), np.int32)
  dim = np.ones(max(pairs.ncon_max, 1), np.int32)
  for _, (g1s, g2s, pids, base, npts) in pairs.groups.items():
    for i, (g1, g2, pid) in enumerate(zip(g1s, g2s, pids)):
      if pid >= 0:
        condim = int(m.pair_dim[pid])
      else:
        p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
        if p1 != p2:
          condim = m.geom_condim[g1] if p1 > p2 else m.geom_condim[g2]
        else:
          condim = max(m.geom_condim[g1], m.geom_condim[g2])
      s = base + i * npts
      geom1[s:s + npts] = g1
      geom2[s:s + npts] = g2
      dim[s:s + npts] = condim
  return geom1, geom2, dim


def _names(m: mujoco.MjModel, obj: mujoco.mjtObj, n: int) -> tuple:
  return tuple(
      mujoco.mj_id2name(m, obj, i) or f'#{i}' for i in range(n))


_AUTO_NCON_CAP = 64


def _parse_tendons(m: mujoco.MjModel) -> dict:
  """Static tendon structure: fixed tendons (joint couplings) become
  constant length/Jacobian coefficient matrices; spatial tendons are
  straight site-to-site chains. Wrapping geoms, pulleys, and tendon
  frictionloss raise loudly (mjlab's robots use none of these;
  reference parity surface is limit/spring/damper/actuation)."""
  nt = int(m.ntendon)
  out = dict(ntendon=nt,
             ten_is_fixed=np.zeros(max(nt, 1), bool),
             ten_coef_q=np.zeros((max(nt, 1), m.nq)),
             ten_coef_v=np.zeros((max(nt, 1), m.nv)),
             ten_site_chains=(),
             ten_limited=np.zeros(max(nt, 1), bool))
  if not nt:
    return out
  if (np.asarray(m.tendon_frictionloss)[:nt] != 0).any():
    raise NotImplementedError('tendon frictionloss not supported')
  chains = []
  W_JOINT = int(mujoco.mjtWrap.mjWRAP_JOINT)
  W_SITE = int(mujoco.mjtWrap.mjWRAP_SITE)
  for t in range(nt):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    wt = m.wrap_type[adr:adr + num]
    if all(w == W_JOINT for w in wt):
      out['ten_is_fixed'][t] = True
      chains.append(())
      for w in range(adr, adr + num):
        j = int(m.wrap_objid[w])
        if m.jnt_type[j] not in (int(mujoco.mjtJoint.mjJNT_HINGE),
                                 int(mujoco.mjtJoint.mjJNT_SLIDE)):
          raise NotImplementedError(
              'fixed tendons support hinge/slide joints only')
        out['ten_coef_q'][t, int(m.jnt_qposadr[j])] += m.wrap_prm[w]
        out['ten_coef_v'][t, int(m.jnt_dofadr[j])] += m.wrap_prm[w]
    elif all(w == W_SITE for w in wt):
      if num < 2:
        raise NotImplementedError('spatial tendon needs >= 2 sites')
      chains.append(tuple(int(m.wrap_objid[w])
                          for w in range(adr, adr + num)))
    else:
      raise NotImplementedError(
          'tendon wrapping geoms / pulleys not supported (site chains '
          'and fixed joint couplings only)')
  out['ten_site_chains'] = tuple(chains)
  out['ten_limited'][:nt] = m.tendon_limited[:nt].astype(bool)
  return out


def _warn_elliptic_path(cone: int) -> int:
  """One-time perf note: cone=elliptic solves on the XLA Newton path —
  the whole-solver Pallas TPU kernel implements the pyramidal cost only
  (ops/newton.py), so elliptic configs forgo its ~2x step speedup.
  Correctness is identical (tests/test_elliptic.py)."""
  if cone == 1 and not getattr(_warn_elliptic_path, '_done', False):
    _warn_elliptic_path._done = True
    import warnings
    warnings.warn(
        'cone=elliptic uses the XLA solver path (the Pallas whole-solver '
        'kernel is pyramidal-only); expect lower TPU throughput than '
        "cone='pyramidal'. See docs/faq.md.", stacklevel=3)
  return cone


def put_model(m: mujoco.MjModel, dtype=jnp.float32,
              ncon_cap: 'int | None' = None) -> Model:
  """Convert a compiled mujoco.MjModel to the engine Model pytree.

  ncon_cap: per-env active-contact capacity for constraint assembly
  (runtime top-K compaction over the static pair table). None = auto:
  no compaction for small pair tables, 64 when the table is larger
  (self-collision models). 0 forces no compaction."""
  for e in range(m.neq):
    if m.eq_type[e] not in (int(mujoco.mjtEq.mjEQ_CONNECT),
                            int(mujoco.mjtEq.mjEQ_WELD),
                            int(mujoco.mjtEq.mjEQ_JOINT)):
      raise NotImplementedError(
          f'equality type {m.eq_type[e]} unsupported (connect/weld/joint '
          'are implemented)')
  ten_static = _parse_tendons(m)

  for j in range(m.njnt):
    if m.jnt_type[j] not in (int(mujoco.mjtJoint.mjJNT_FREE),
                             int(mujoco.mjtJoint.mjJNT_HINGE),
                             int(mujoco.mjtJoint.mjJNT_SLIDE),
                             int(mujoco.mjtJoint.mjJNT_BALL)):
      raise NotImplementedError(f'joint type {m.jnt_type[j]} unsupported')
  for b in range(m.nbody):
    jn = m.body_jntnum[b]
    if jn > 1:
      # multiple joints per body supported only if all are hinge/slide
      for j in range(m.body_jntadr[b], m.body_jntadr[b] + jn):
        if m.jnt_type[j] in (int(mujoco.mjtJoint.mjJNT_FREE),):
          raise NotImplementedError('free joint must be alone on its body')
  if m.na:
    ok_dyn = (int(mujoco.mjtDyn.mjDYN_NONE),
              int(mujoco.mjtDyn.mjDYN_INTEGRATOR),
              int(mujoco.mjtDyn.mjDYN_FILTER),
              int(mujoco.mjtDyn.mjDYN_FILTEREXACT))
    for u in range(m.nu):
      if int(m.actuator_dyntype[u]) not in ok_dyn:
        raise NotImplementedError(
            f'actuator dyntype {m.actuator_dyntype[u]} unsupported '
            '(none/integrator/filter/filterexact are implemented)')
      if int(m.actuator_actnum[u]) > 1:
        raise NotImplementedError('multi-state actuators not supported')
      if m.actuator_actearly[u]:
        raise NotImplementedError('actearly not supported')
  _TRN_J = int(mujoco.mjtTrn.mjTRN_JOINT)
  _TRN_T = int(mujoco.mjtTrn.mjTRN_TENDON)
  for u in range(m.nu):
    if int(m.actuator_trntype[u]) not in (_TRN_J, _TRN_T):
      raise NotImplementedError(
          f'actuator transmission {m.actuator_trntype[u]} unsupported '
          '(joint and tendon transmissions are implemented)')
  if m.ntendon and int(m.opt.integrator) in (
      int(mujoco.mjtIntegrator.mjINT_IMPLICIT),
      int(mujoco.mjtIntegrator.mjINT_IMPLICITFAST)):
    has_ten_act = any(int(t) == _TRN_T for t in m.actuator_trntype)
    if has_ten_act or (np.asarray(m.tendon_damping)[:m.ntendon] != 0).any():
      raise NotImplementedError(
          'implicit integrators with tendon damping/actuators not '
          'supported (their velocity derivative is non-diagonal); use '
          'integrator="Euler"')
  if m.nhfield > 1:
    raise NotImplementedError('at most one heightfield supported')
  if (m.opt.density != 0 or m.opt.viscosity != 0
      or np.any(np.asarray(m.opt.wind) != 0)):
    raise NotImplementedError(
        'fluid forces (option density/viscosity/wind) not supported')
  if m.opt.enableflags & int(mujoco.mjtEnableBit.mjENBL_OVERRIDE):
    raise NotImplementedError('contact override (o_margin etc) not '
                              'supported')
  if m.opt.noslip_iterations > 0:
    raise NotImplementedError('noslip post-solver not supported')
  if m.npair and (np.asarray(m.pair_solreffriction) != 0).any():
    raise NotImplementedError(
        'pair solreffriction (separate friction-row solref) not supported')
  pairs = _build_pairs(m)
  _, _, slot_dims = contact_slot_meta(m, pairs)
  n3_slots = int((slot_dims[:pairs.ncon_max] > 1).sum())
  n1_slots = int((slot_dims[:pairs.ncon_max] == 1).sum())
  auto = ncon_cap is None
  if auto:
    ncon_cap = _AUTO_NCON_CAP if pairs.ncon_max > _AUTO_NCON_CAP else 0
  ncon_cap = min(int(ncon_cap), pairs.ncon_max)
  if ncon_cap == pairs.ncon_max:
    ncon_cap = 0  # selecting everything = no compaction
  # split the total cap across the two pools: frictional slots carry
  # 2*(maxdim-1) rows each, frictionless a single row, so favor the
  # frictional pool (walking workloads are foot-contact dominated). The
  # auto split (32 frictional + 16 frictionless) keeps the whole-solver
  # Pallas kernel inside its VMEM budget for humanoid-scale nv.
  ncon_cap1 = 0
  if ncon_cap:
    if n1_slots == 0:
      ncon_cap = min(ncon_cap, n3_slots)
    elif n3_slots == 0:
      ncon_cap1, ncon_cap = min(ncon_cap, n1_slots), 0
    elif auto:
      ncon_cap, ncon_cap1 = min(32, n3_slots), min(16, n1_slots)
    else:
      ncon_cap1 = max(min(ncon_cap // 4, n1_slots), 1)
      ncon_cap = min(ncon_cap - ncon_cap1, n3_slots)

  if m.nhfield == 1:
    hf_nrow, hf_ncol = int(m.hfield_nrow[0]), int(m.hfield_ncol[0])
    hf_size = m.hfield_size[0].copy()
    # mjModel stores normalized [0,1] elevations scaled by size[2]; the
    # engine keeps the grid in meters.
    hf_data = m.hfield_data[:hf_nrow * hf_ncol].reshape(
        hf_nrow, hf_ncol) * hf_size[2]
    hf_geomid = -1
    for g in range(m.ngeom):
      if m.geom_type[g] == int(mujoco.mjtGeom.mjGEOM_HFIELD):
        hf_geomid = g
  else:
    hf_nrow = hf_ncol = 0
    hf_size = np.zeros(4)
    hf_data = np.zeros((1, 1))
    hf_geomid = -1

  stat = ModelStatic(
      nq=int(m.nq), nv=int(m.nv), nu=int(m.nu), nbody=int(m.nbody),
      njnt=int(m.njnt), ngeom=int(m.ngeom), nsite=int(m.nsite),
      nsensor=int(m.nsensor), nsensordata=int(m.nsensordata),
      body_parentid=m.body_parentid.copy(),
      body_rootid=m.body_rootid.copy(),
      body_jntadr=m.body_jntadr.copy(),
      body_jntnum=m.body_jntnum.copy(),
      body_dofadr=m.body_dofadr.copy(),
      body_dofnum=m.body_dofnum.copy(),
      body_geomadr=m.body_geomadr.copy(),
      body_geomnum=m.body_geomnum.copy(),
      body_levels=_body_levels(m.body_parentid),
      ancestor_mask=_ancestor_mask(m),
      subtree_mask=_subtree_mask(m.body_parentid),
      dof_prefix_mask=_dof_prefix_mask(m, _ancestor_mask(m)),
      jnt_type=m.jnt_type.copy(),
      jnt_qposadr=m.jnt_qposadr.copy(),
      jnt_dofadr=m.jnt_dofadr.copy(),
      jnt_bodyid=m.jnt_bodyid.copy(),
      jnt_limited=m.jnt_limited.copy(),
      jnt_actgravcomp=m.jnt_actgravcomp.copy(),
      dof_bodyid=m.dof_bodyid.copy(),
      dof_jntid=m.dof_jntid.copy(),
      geom_type=m.geom_type.copy(),
      geom_bodyid=m.geom_bodyid.copy(),
      geom_condim=m.geom_condim.copy(),
      geom_priority=m.geom_priority.copy(),
      site_bodyid=m.site_bodyid.copy(),
      actuator_trntype=m.actuator_trntype.copy(),
      actuator_trnid=m.actuator_trnid.copy(),
      actuator_gaintype=m.actuator_gaintype.copy(),
      actuator_biastype=m.actuator_biastype.copy(),
      actuator_ctrllimited=m.actuator_ctrllimited.copy(),
      actuator_forcelimited=m.actuator_forcelimited.copy(),
      sensor_type=m.sensor_type.copy(),
      sensor_datatype=m.sensor_datatype.copy(),
      sensor_objtype=m.sensor_objtype.copy(),
      sensor_objid=m.sensor_objid.copy(),
      sensor_reftype=m.sensor_reftype.copy(),
      sensor_refid=m.sensor_refid.copy(),
      sensor_adr=m.sensor_adr.copy(),
      sensor_dim=m.sensor_dim.copy(),
      sensor_intprm=m.sensor_intprm.copy(),
      con_geom1=contact_slot_meta(m, pairs)[0],
      con_geom2=contact_slot_meta(m, pairs)[1],
      con_dim=contact_slot_meta(m, pairs)[2],
      integrator=int(m.opt.integrator),
      cone=_warn_elliptic_path(int(m.opt.cone)),
      iterations=int(m.opt.iterations),
      ls_iterations=int(m.opt.ls_iterations),
      disableflags=int(m.opt.disableflags),
      newton_tolerance=float(m.opt.tolerance),
      meaninertia=float(m.stat.meaninertia),
      pairs=pairs,
      body_names=_names(m, mujoco.mjtObj.mjOBJ_BODY, m.nbody),
      jnt_names=_names(m, mujoco.mjtObj.mjOBJ_JOINT, m.njnt),
      geom_names=_names(m, mujoco.mjtObj.mjOBJ_GEOM, m.ngeom),
      site_names=_names(m, mujoco.mjtObj.mjOBJ_SITE, m.nsite),
      actuator_names=_names(m, mujoco.mjtObj.mjOBJ_ACTUATOR, m.nu),
      sensor_names=_names(m, mujoco.mjtObj.mjOBJ_SENSOR, m.nsensor),
      nhfield=int(m.nhfield),
      hfield_nrow=hf_nrow,
      hfield_ncol=hf_ncol,
      hfield_size=hf_size,
      hfield_geomid=hf_geomid,
      ncon_cap=ncon_cap,
      ncon_cap1=ncon_cap1,
      nmocap=int(m.nmocap),
      body_mocapid=m.body_mocapid.copy().astype(np.int32),
      na=int(m.na),
      actuator_dyntype=m.actuator_dyntype.copy().astype(np.int32),
      actuator_actadr=m.actuator_actadr.copy().astype(np.int32),
      actuator_actlimited=m.actuator_actlimited.copy().astype(bool),
      **ten_static,
      neq=int(m.neq),
      eq_type=m.eq_type.copy().astype(np.int32),
      eq_obj1=m.eq_obj1id.copy().astype(np.int32),
      eq_obj2=m.eq_obj2id.copy().astype(np.int32),
      nmesh=int(m.nmesh),
      geom_dataid=m.geom_dataid.copy().astype(np.int32),
      mesh_hulls=_mesh.build_hulls(m),
  )

  # Convert on the host and ship the whole pytree with ONE device_put at
  # the end: per-field jnp.asarray(x, dtype) emits a convert op whose
  # compilation is a remote round trip under tunneled TPU backends.
  np_dtype = np.dtype(jnp.dtype(dtype).name)
  a = lambda x: np.asarray(x, dtype=np_dtype)
  opt = Option(
      timestep=a(m.opt.timestep),
      gravity=a(m.opt.gravity),
      impratio=a(m.opt.impratio),
      tolerance=a(m.opt.tolerance),
      ls_tolerance=a(m.opt.ls_tolerance),
  )

  model = Model(
      stat=stat,
      opt=opt,
      qpos0=a(m.qpos0),
      qpos_spring=a(m.qpos_spring),
      body_pos=a(m.body_pos),
      body_quat=a(m.body_quat),
      body_ipos=a(m.body_ipos),
      body_iquat=a(m.body_iquat),
      body_mass=a(m.body_mass),
      body_subtreemass=a(m.body_subtreemass),
      body_inertia=a(m.body_inertia),
      body_invweight0=a(m.body_invweight0),
      body_gravcomp=a(m.body_gravcomp),
      jnt_pos=a(m.jnt_pos),
      jnt_axis=a(m.jnt_axis),
      jnt_range=a(m.jnt_range),
      jnt_stiffness=a(m.jnt_stiffness),
      jnt_solref=a(m.jnt_solref),
      jnt_solimp=a(m.jnt_solimp),
      jnt_margin=a(m.jnt_margin),
      dof_armature=a(m.dof_armature),
      dof_damping=a(m.dof_damping),
      dof_frictionloss=a(m.dof_frictionloss),
      dof_invweight0=a(m.dof_invweight0),
      dof_solref=a(m.dof_solref),
      dof_solimp=a(m.dof_solimp),
      geom_pos=a(m.geom_pos),
      geom_quat=a(m.geom_quat),
      geom_size=a(m.geom_size),
      geom_friction=a(m.geom_friction),
      geom_solref=a(m.geom_solref),
      geom_solimp=a(m.geom_solimp),
      geom_solmix=a(m.geom_solmix),
      geom_margin=a(m.geom_margin),
      geom_gap=a(m.geom_gap),
      geom_rgba=a(m.geom_rgba),
      site_pos=a(m.site_pos),
      site_quat=a(m.site_quat),
      actuator_gainprm=a(m.actuator_gainprm),
      actuator_biasprm=a(m.actuator_biasprm),
      actuator_gear=a(m.actuator_gear),
      actuator_ctrlrange=a(m.actuator_ctrlrange),
      actuator_forcerange=a(m.actuator_forcerange),
      hfield_data=a(hf_data),
      eq_data=a(m.eq_data if m.neq else np.zeros((1, 11))),
      eq_solref=a(m.eq_solref if m.neq else np.zeros((1, 2))),
      eq_solimp=a(m.eq_solimp if m.neq else np.zeros((1, 5))),
      eq_active0=a(m.eq_active0.astype(np.float64) if m.neq
                   else np.zeros(1)),
      actuator_dynprm=a(m.actuator_dynprm[:, :3] if m.nu
                        else np.zeros((1, 3))),
      actuator_actrange=a(m.actuator_actrange if m.nu
                          else np.zeros((1, 2))),
      tendon_stiffness=a(m.tendon_stiffness if m.ntendon else np.zeros(1)),
      tendon_damping=a(m.tendon_damping if m.ntendon else np.zeros(1)),
      tendon_lengthspring=a(m.tendon_lengthspring if m.ntendon
                            else np.zeros((1, 2))),
      tendon_range=a(m.tendon_range if m.ntendon else np.zeros((1, 2))),
      tendon_solref_lim=a(m.tendon_solref_lim if m.ntendon
                          else np.zeros((1, 2))),
      tendon_solimp_lim=a(m.tendon_solimp_lim if m.ntendon
                          else np.zeros((1, 5))),
      tendon_margin=a(m.tendon_margin if m.ntendon else np.zeros(1)),
      tendon_invweight0=a(m.tendon_invweight0 if m.ntendon
                          else np.ones(1)),
      pair_friction=a(m.pair_friction if m.npair else np.zeros((1, 5))),
      pair_solref=a(m.pair_solref if m.npair else np.zeros((1, 2))),
      pair_solimp=a(m.pair_solimp if m.npair else np.zeros((1, 5))),
      pair_margin=a(m.pair_margin if m.npair else np.zeros(1)),
  )
  return jax.device_put(model)


def nefc_max(stat: ModelStatic) -> int:
  """Static constraint row capacity:
  equality + friction + limits + contact rows."""
  from mjlab_tpu.physics.constraint import equality_rows_count
  nfric = int(stat.nv) + equality_rows_count(stat)
  nlimit = int(stat.jnt_limited.sum())
  if stat.ntendon:
    nlimit += int(stat.ten_limited[:stat.ntendon].sum())
  if stat.ncon_cap or stat.ncon_cap1:
    # compacted: pyramidal (or elliptic) rows for the frictional pool +
    # one normal row per frictionless-pool slot
    maxdim = int(stat.con_dim.max())
    k_rows = maxdim if stat.cone == 1 else 2 * max(maxdim - 1, 1)
    return nfric + nlimit + stat.ncon_cap * k_rows + stat.ncon_cap1
  ncontact_rows = 0
  for condim in stat.con_dim[:stat.pairs.ncon_max]:
    condim = int(condim)
    rows = 1 if condim == 1 else 2 * (condim - 1)
    if stat.cone == 1 and condim > 1:  # elliptic
      rows = condim
    ncontact_rows += rows
  return nfric + nlimit + ncontact_rows


def make_data(model: Model, dtype=jnp.float32) -> Data:
  """Allocate a single-env Data pytree at qpos0 (use jax.vmap to batch)."""
  s = model.stat
  z = lambda *shape: jnp.zeros(shape, dtype=dtype)
  ncon = max(s.pairs.ncon_max, 1)
  contact = Contact(
      dist=jnp.full((ncon,), 1e10, dtype=dtype),
      pos=z(ncon, 3),
      frame=jnp.tile(jnp.eye(3, dtype=dtype), (ncon, 1, 1)),
      friction=z(ncon, 5),
      solref=z(ncon, 2),
      solimp=z(ncon, 5),
      includemargin=z(ncon),
  )

  return Data(
      qpos=jnp.asarray(model.qpos0, dtype=dtype),
      qvel=z(s.nv),
      ctrl=z(s.nu),
      qacc=z(s.nv),
      qacc_warmstart=z(s.nv),
      time=jnp.zeros((), dtype=dtype),
      xfrc_applied=z(s.nbody, 6),
      qfrc_applied=z(s.nv),
      # mocap poses start at the bodies' model pose (mj_resetData parity);
      # static index gather so this traces inside jit
      mocap_pos=(model.body_pos[np.nonzero(s.body_mocapid >= 0)[0]]
                 .astype(dtype) if s.nmocap
                 else jnp.zeros((1, 3), dtype)),
      mocap_quat=(model.body_quat[np.nonzero(s.body_mocapid >= 0)[0]]
                  .astype(dtype) if s.nmocap
                  else jnp.asarray([[1.0, 0, 0, 0]], dtype)),
      ten_length=z(max(s.ntendon, 1)),
      ten_velocity=z(max(s.ntendon, 1)),
      ten_J=z(max(s.ntendon, 1), s.nv),
      act=z(max(s.na, 1)),
      act_dot=z(max(s.na, 1)),
      xpos=z(s.nbody, 3),
      xquat=z(s.nbody, 4).at[:, 0].set(1.0),
      xmat=jnp.tile(jnp.eye(3, dtype=dtype), (s.nbody, 1, 1)),
      xipos=z(s.nbody, 3),
      ximat=jnp.tile(jnp.eye(3, dtype=dtype), (s.nbody, 1, 1)),
      xanchor=z(max(s.njnt, 1), 3),
      xaxis=z(max(s.njnt, 1), 3),
      geom_xpos=z(s.ngeom, 3),
      geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (s.ngeom, 1, 1)),
      site_xpos=z(max(s.nsite, 1), 3),
      site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (max(s.nsite, 1), 1, 1)),
      subtree_com=z(s.nbody, 3),
      cinr=z(s.nbody, 6, 6),
      cdof=z(s.nv, 6),
      cdof_dot=z(s.nv, 6),
      cvel=z(s.nbody, 6),
      qM=z(s.nv, s.nv),
      qfrc_bias=z(s.nv),
      qfrc_passive=z(s.nv),
      qfrc_spring=z(s.nv),
      qfrc_damper=z(s.nv),
      qfrc_actuator=z(s.nv),
      qfrc_smooth=z(s.nv),
      qacc_smooth=z(s.nv),
      qfrc_constraint=z(s.nv),
      actuator_length=z(s.nu),
      actuator_velocity=z(s.nu),
      actuator_force=z(s.nu),
      contact=contact,
      efc_force=z(max(nefc_max(s), 1)),
      ncon_active=jnp.zeros((), dtype=jnp.int32),
      solver_niter=jnp.zeros((), dtype=jnp.int32),
      sensordata=z(max(s.nsensordata, 1)),
  )
