"""Smooth (unconstrained) dynamics: mass matrix, bias forces, passive
forces, actuation and smooth acceleration.

TPU-first formulation: instead of MuJoCo's sparse tree recursions (CRBA
backward pass, RNE two-pass), everything is expressed with dense masked
einsums over static ancestor/subtree masks. With nv ~ 10-40 and nbody ~
10-40 these are tiny dense ops that XLA batches into large GEMMs across the
env axis under vmap - exactly what the MXU wants.

Replaces the corresponding mujoco_warp kernels the reference drives through
`mjwarp.step` (reference src/mjlab/sim/sim.py:110-195).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics import math as pmath
from mjlab_tpu.physics.types import (
    BiasType,
    Data,
    DisableBit,
    GainType,
    JointType,
    Model,
)


def crb(m: Model, d: Data) -> Data:
  """Composite-rigid-body mass matrix (dense) + Cholesky factor."""
  s = m.stat
  dtype = d.qpos.dtype
  sub = jnp.asarray(s.subtree_mask, dtype)
  anc = jnp.asarray(s.ancestor_mask, dtype)

  # composite inertia per body: sum of cinr over subtree
  crb_flat = sub @ d.cinr.reshape(s.nbody, 36)
  crb_b = crb_flat.reshape(s.nbody, 6, 6)

  body_of_dof = s.dof_bodyid
  B = crb_b[body_of_dof]  # (nv, 6, 6)
  t = jnp.einsum('dij,dj->di', B, d.cdof)  # (nv, 6)
  raw = t @ d.cdof.T  # (nv, nv): raw[i, j] = t_i . cdof_j
  mask = anc[body_of_dof]  # (nv, nv): ancestor dofs of dof i's body
  tril = jnp.tril(jnp.ones((s.nv, s.nv), dtype))
  L = raw * mask * tril
  qM = L + L.T - jnp.diag(jnp.diag(L))
  qM = qM + jnp.diag(m.dof_armature)
  return d.replace(qM=qM)


def solve_m(d: Data, rhs: jax.Array) -> jax.Array:
  """Solve M x = rhs (fused Pallas kernel when vmapped on TPU; caching a
  Cholesky factor buys nothing when the whole solve is one fused op)."""
  from mjlab_tpu.ops.pd_solve import solve_pd
  return solve_pd(d.qM, rhs)


def rne(m: Model, d: Data) -> Data:
  """Recursive-Newton-Euler bias force C(q, qvel) as dense einsums."""
  s = m.stat
  dtype = d.qpos.dtype
  anc = jnp.asarray(s.ancestor_mask, dtype)

  # body acceleration with qacc = 0, world 'accelerating' upward at -g
  a0 = jnp.concatenate(
      [jnp.zeros(3, dtype), -m.opt.gravity.astype(dtype)])
  if s.disableflags & DisableBit.GRAVITY:
    a0 = jnp.zeros(6, dtype)
  cacc = a0[None, :] + anc @ (d.cdof_dot * d.qvel[:, None])  # (nbody, 6)

  cfrc = jnp.einsum('bij,bj->bi', d.cinr, cacc)
  cfrc = cfrc + pmath.force_cross(
      d.cvel, jnp.einsum('bij,bj->bi', d.cinr, d.cvel))

  # qfrc_bias[i] = sum_b anc[b, i] * (cdof_i . cfrc_b)
  qfrc_bias = jnp.einsum('ik,bk,bi->i', d.cdof, cfrc, anc)
  return d.replace(qfrc_bias=qfrc_bias)


def tendon(m: Model, d: Data) -> Data:
  """Tendon lengths, velocities, and (ntendon, nv) Jacobian rows.

  Fixed tendons are constant coefficient rows (compile-time matrices);
  spatial tendons are straight site-to-site chains: L = sum ||p_i+1 -
  p_i||, J = sum u^T (Jp_i+1 - Jp_i). MuJoCo mj_tendon parity for the
  supported surface (no wrapping geoms/pulleys, gated in io.put_model)."""
  s = m.stat
  if not s.ntendon:
    return d
  dtype = d.qpos.dtype
  Wq = jnp.asarray(s.ten_coef_q, dtype)
  Wv = jnp.asarray(s.ten_coef_v, dtype)
  lengths = Wq @ d.qpos
  J = jnp.broadcast_to(Wv, (s.ntendon, s.nv))
  anc = jnp.asarray(s.ancestor_mask, dtype)
  cdof_ang = d.cdof[:, :3]
  cdof_lin = d.cdof[:, 3:]

  def point_jac(body, p):
    croot = d.subtree_com[int(s.body_rootid[body])]
    col = cdof_lin + jnp.cross(cdof_ang, p[None, :] - croot[None, :])
    return col * anc[body][:, None]  # (nv, 3)

  for t, chain in enumerate(s.ten_site_chains):
    if not chain:
      continue
    L = jnp.zeros((), dtype)
    row = jnp.zeros(s.nv, dtype)
    for a, b in zip(chain[:-1], chain[1:]):
      pa, pb = d.site_xpos[a], d.site_xpos[b]
      seg = pb - pa
      ln = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg), 1e-24))
      u = seg / ln
      L = L + ln
      ja = point_jac(int(s.site_bodyid[a]), pa)
      jb = point_jac(int(s.site_bodyid[b]), pb)
      row = row + (jb - ja) @ u
    lengths = lengths.at[t].set(L)
    J = J.at[t].set(row)
  return d.replace(ten_length=lengths, ten_J=J,
                   ten_velocity=J @ d.qvel)


def passive(m: Model, d: Data) -> Data:
  """Spring and damper passive forces (fluid forces unsupported)."""
  s = m.stat
  dtype = d.qpos.dtype
  if s.disableflags & DisableBit.PASSIVE:
    z = jnp.zeros(s.nv, dtype)
    return d.replace(qfrc_passive=z, qfrc_spring=z, qfrc_damper=z)

  qfrc_spring = jnp.zeros(s.nv, dtype)
  for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE, JointType.HINGE):
    jsel = np.nonzero(s.jnt_type == int(jt))[0]
    if len(jsel) == 0:
      continue
    stiff = m.jnt_stiffness[jsel]
    qadr = s.jnt_qposadr[jsel]
    dadr = s.jnt_dofadr[jsel]
    if jt in (JointType.SLIDE, JointType.HINGE):
      frc = -stiff * (d.qpos[qadr] - m.qpos_spring[qadr])
      qfrc_spring = qfrc_spring.at[dadr].set(frc)
    elif jt == JointType.BALL:
      q = d.qpos[qadr[:, None] + np.arange(4)[None, :]]
      qs = m.qpos_spring[qadr[:, None] + np.arange(4)[None, :]]
      dif = pmath.quat_sub(q, qs)
      for i in range(3):
        qfrc_spring = qfrc_spring.at[dadr + i].set(-stiff * dif[:, i])
    else:  # FREE
      q = d.qpos[qadr[:, None] + np.arange(7)[None, :]]
      qs = m.qpos_spring[qadr[:, None] + np.arange(7)[None, :]]
      dpos = q[:, :3] - qs[:, :3]
      drot = pmath.quat_sub(q[:, 3:7], qs[:, 3:7])
      for i in range(3):
        qfrc_spring = qfrc_spring.at[dadr + i].set(-stiff * dpos[:, i])
        qfrc_spring = qfrc_spring.at[dadr + 3 + i].set(-stiff * drot[:, i])

  qfrc_damper = -m.dof_damping * d.qvel

  if s.ntendon:
    # deadband spring (mj_passive tendon semantics) + damper
    L = d.ten_length
    ls = m.tendon_lengthspring
    disp = jnp.where(L < ls[:, 0], ls[:, 0] - L,
                     jnp.where(L > ls[:, 1], ls[:, 1] - L, 0.0))
    f_spring = m.tendon_stiffness * disp
    f_damper = -m.tendon_damping * d.ten_velocity
    qfrc_spring = qfrc_spring + f_spring @ d.ten_J
    qfrc_damper = qfrc_damper + f_damper @ d.ten_J

  return d.replace(
      qfrc_passive=qfrc_spring + qfrc_damper,
      qfrc_spring=qfrc_spring,
      qfrc_damper=qfrc_damper)


_TRN_JOINT = 0
_TRN_TENDON = 3
_DYN_INTEGRATOR = 1
_DYN_FILTEREXACT = 3


def _act_groups(s):
  """Static (actuator ids with activation state, their act slots)."""
  actadr = np.asarray(s.actuator_actadr)
  asel = np.nonzero(actadr >= 0)[0]
  return asel, actadr[asel]


def _act_input(s, m, d, ctrl):
  """(actuator input vector with act substituted, act_dot (na,))."""
  asel, aidx = _act_groups(s)
  act_u = d.act[aidx]
  inp = ctrl.at[asel].set(act_u)
  dyn = np.asarray(s.actuator_dyntype)[asel]
  tau = jnp.maximum(m.actuator_dynprm[asel, 0], 1e-15)
  dot = jnp.where(jnp.asarray(dyn == _DYN_INTEGRATOR), ctrl[asel],
                  (ctrl[asel] - act_u) / tau)
  act_dot = jnp.zeros_like(d.act_dot).at[aidx].set(dot)
  return inp, act_dot


def _trn_groups(s):
  """Static actuator index groups by transmission type."""
  trn = np.asarray(s.actuator_trntype)
  return (np.nonzero(trn == _TRN_JOINT)[0],
          np.nonzero(trn == _TRN_TENDON)[0])


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths/velocities for joint and tendon transmissions
  (mjTRN_JOINT on hinge/slide — the reference's PD actuator synthesis,
  reference src/mjlab/utils/spec_config.py:400-453 — plus mjTRN_TENDON)."""
  s = m.stat
  if s.nu == 0:
    return d
  dtype = d.qpos.dtype
  gear = m.actuator_gear[:, 0]
  jsel, tsel = _trn_groups(s)
  length = jnp.zeros(s.nu, dtype)
  velocity = jnp.zeros(s.nu, dtype)
  if len(jsel):
    jid = s.actuator_trnid[jsel, 0]
    length = length.at[jsel].set(d.qpos[s.jnt_qposadr[jid]] * gear[jsel])
    velocity = velocity.at[jsel].set(d.qvel[s.jnt_dofadr[jid]] * gear[jsel])
  if len(tsel):
    tid = s.actuator_trnid[tsel, 0]
    length = length.at[tsel].set(d.ten_length[tid] * gear[tsel])
    velocity = velocity.at[tsel].set(d.ten_velocity[tid] * gear[tsel])
  return d.replace(actuator_length=length, actuator_velocity=velocity)


def actuation(m: Model, d: Data) -> Data:
  """Actuator force generation + mapping to joint space.

  Supports gaintype FIXED/AFFINE and biastype NONE/AFFINE, covering motor
  and position/velocity actuators (the PD semantics used by the reference's
  ActuatorSetCfg, reference src/mjlab/utils/spec_config.py:441-453)."""
  s = m.stat
  dtype = d.qpos.dtype
  if s.nu == 0 or (s.disableflags & DisableBit.ACTUATION):
    return d.replace(qfrc_actuator=jnp.zeros(s.nv, dtype))

  ctrl = d.ctrl
  if not (s.disableflags & DisableBit.CLAMPCTRL):
    limited = jnp.asarray(s.actuator_ctrllimited.astype(bool))
    clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                       m.actuator_ctrlrange[:, 1])
    ctrl = jnp.where(limited, clamped, ctrl)

  # activation dynamics: stateful actuators drive force from `act`,
  # with act_dot = ctrl (integrator) or (ctrl - act)/tau (filter[exact])
  inp = ctrl
  if s.na:
    inp, act_dot = _act_input(s, m, d, ctrl)
    d = d.replace(act_dot=act_dot)

  gain = jnp.where(
      jnp.asarray(s.actuator_gaintype == int(GainType.FIXED)),
      m.actuator_gainprm[:, 0],
      m.actuator_gainprm[:, 0] + m.actuator_gainprm[:, 1] * d.actuator_length
      + m.actuator_gainprm[:, 2] * d.actuator_velocity)
  bias = jnp.where(
      jnp.asarray(s.actuator_biastype == int(BiasType.AFFINE)),
      m.actuator_biasprm[:, 0] + m.actuator_biasprm[:, 1] * d.actuator_length
      + m.actuator_biasprm[:, 2] * d.actuator_velocity,
      0.0)
  force = gain * inp + bias
  limited_f = jnp.asarray(s.actuator_forcelimited.astype(bool))
  force = jnp.where(
      limited_f,
      jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]),
      force)

  # scalar transmissions: qfrc += J_trn^T (gear * force)
  jsel, tsel = _trn_groups(s)
  qfrc_actuator = jnp.zeros(s.nv, dtype)
  if len(jsel):
    jid = s.actuator_trnid[jsel, 0]
    qfrc_actuator = qfrc_actuator.at[s.jnt_dofadr[jid]].add(
        m.actuator_gear[jsel, 0] * force[jsel])
  if len(tsel):
    tid = s.actuator_trnid[tsel, 0]
    qfrc_actuator = qfrc_actuator + (
        m.actuator_gear[tsel, 0] * force[tsel]) @ d.ten_J[tid]
  return d.replace(actuator_force=force, qfrc_actuator=qfrc_actuator)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Map xfrc_applied ([force(3), torque(3)] at body CoM, world frame) to
  joint space via the dense body Jacobians."""
  s = m.stat
  dtype = d.qpos.dtype
  anc = jnp.asarray(s.ancestor_mask, dtype)
  frc = d.xfrc_applied[:, :3]
  trq = d.xfrc_applied[:, 3:]
  # spatial force at the c-frame (root subtree com): trq' = trq + r x frc
  r = d.xipos - d.subtree_com[s.body_rootid]
  cfrc = jnp.concatenate([trq + jnp.cross(r, frc), frc], axis=-1)
  return jnp.einsum('ik,bk,bi->i', d.cdof, cfrc, anc)


def fwd_smooth(m: Model, d: Data) -> Data:
  """qfrc_smooth and qacc_smooth (unconstrained acceleration)."""
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                 + d.qfrc_applied + xfrc_accumulate(m, d))
  qacc_smooth = solve_m(d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
