"""Forward kinematics and COM-frame quantities.

TPU-first structure: the kinematic tree is processed level-by-level (all
bodies at one depth in parallel, with static gather indices), and bodies
within a level are partitioned *statically* by joint layout so there is no
per-element branching under jit. Everything downstream (subtree COM, cdof,
spatial inertias, velocities) is expressed as dense masked einsums that XLA
maps onto the MXU, instead of the sequential tree recursions used by CPU
MuJoCo / mujoco_warp (the reference's physics backend; see reference
src/mjlab/sim/sim.py:110-195 for how that backend is driven).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics import math as pmath
from mjlab_tpu.physics.types import Data, JointType, Model


def kinematics(m: Model, d: Data) -> Data:
  """mj_kinematics analog: body/geom/site frames from qpos."""
  s = m.stat
  dtype = d.qpos.dtype

  xpos = jnp.zeros((s.nbody, 3), dtype)
  xquat = jnp.zeros((s.nbody, 4), dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((max(s.njnt, 1), 3), dtype)
  xaxis = jnp.zeros((max(s.njnt, 1), 3), dtype)

  for ids in s.body_levels:
    pid = s.body_parentid[ids]
    p_pos = xpos[pid]
    p_quat = xquat[pid]
    pos = p_pos + pmath.rot_vec_quat(m.body_pos[ids], p_quat)
    quat = pmath.mul_quat(p_quat, m.body_quat[ids])

    # mocap bodies take their pose from data.mocap_pos/quat (settable
    # from the host, mj_kinematics parity)
    if s.nmocap:
      msel = np.nonzero(s.body_mocapid[ids] >= 0)[0]
      if len(msel):
        mid = s.body_mocapid[ids][msel]
        pos = pos.at[msel].set(d.mocap_pos[mid])
        quat = quat.at[msel].set(pmath.normalize_quat(d.mocap_quat[mid]))

    max_jnt = int(s.body_jntnum[ids].max()) if len(ids) else 0
    for k in range(max_jnt):
      has = s.body_jntnum[ids] > k
      jid = np.where(has, s.body_jntadr[ids] + k, 0)
      # partition by joint type (static)
      for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE,
                 JointType.HINGE):
        sel = np.nonzero(has & (s.jnt_type[jid] == int(jt)))[0]
        if len(sel) == 0:
          continue
        jsel = jid[sel]
        qadr = s.jnt_qposadr[jsel]
        bsel = sel  # rows within the level

        if jt == JointType.FREE:
          q7 = d.qpos[qadr[:, None] + np.arange(7)[None, :]]
          new_pos = q7[:, :3]
          new_quat = pmath.normalize_quat(q7[:, 3:7])
          pos = pos.at[bsel].set(new_pos)
          quat = quat.at[bsel].set(new_quat)
          xanchor = xanchor.at[jsel].set(new_pos)
          xaxis = xaxis.at[jsel].set(
              jnp.broadcast_to(jnp.array([0., 0., 1.], dtype), (len(sel), 3)))
          continue

        jpos = m.jnt_pos[jsel]
        jaxis = m.jnt_axis[jsel]
        anchor = pos[bsel] + pmath.rot_vec_quat(jpos, quat[bsel])
        axis_w = pmath.rot_vec_quat(jaxis, quat[bsel])
        xanchor = xanchor.at[jsel].set(anchor)
        xaxis = xaxis.at[jsel].set(axis_w)

        if jt == JointType.SLIDE:
          delta = d.qpos[qadr] - m.qpos0[qadr]
          pos = pos.at[bsel].add(axis_w * delta[:, None])
        elif jt == JointType.HINGE:
          angle = d.qpos[qadr] - m.qpos0[qadr]
          qloc = pmath.axis_angle_to_quat(jaxis, angle)
          new_quat = pmath.mul_quat(quat[bsel], qloc)
          new_pos = anchor - pmath.rot_vec_quat(jpos, new_quat)
          quat = quat.at[bsel].set(new_quat)
          pos = pos.at[bsel].set(new_pos)
        else:  # BALL
          q4 = pmath.normalize_quat(d.qpos[qadr[:, None] + np.arange(4)[None, :]])
          new_quat = pmath.mul_quat(quat[bsel], q4)
          new_pos = anchor - pmath.rot_vec_quat(jpos, new_quat)
          quat = quat.at[bsel].set(new_quat)
          pos = pos.at[bsel].set(new_pos)

    xpos = xpos.at[ids].set(pos)
    xquat = xquat.at[ids].set(pmath.normalize_quat(quat))

  xmat = pmath.quat_to_mat(xquat)
  xipos = xpos + pmath.rot_vec_quat(m.body_ipos, xquat)
  ximat = pmath.quat_to_mat(pmath.mul_quat(xquat, m.body_iquat))

  gb = s.geom_bodyid
  geom_xpos = xpos[gb] + pmath.rot_vec_quat(m.geom_pos, xquat[gb])
  geom_xmat = pmath.quat_to_mat(pmath.mul_quat(xquat[gb], m.geom_quat))

  if s.nsite:
    sb = s.site_bodyid
    site_xpos = xpos[sb] + pmath.rot_vec_quat(m.site_pos, xquat[sb])
    site_xmat = pmath.quat_to_mat(pmath.mul_quat(xquat[sb], m.site_quat))
  else:
    site_xpos, site_xmat = d.site_xpos, d.site_xmat

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis, geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
  """mj_comPos analog: subtree_com, spatial inertias (cinr), cdof."""
  s = m.stat
  dtype = d.qpos.dtype
  anc = jnp.asarray(s.subtree_mask, dtype)

  # subtree center of mass
  mass = m.body_mass
  weighted = mass[:, None] * d.xipos  # (nbody, 3)
  subtree_mass = anc @ mass
  subtree_com = (anc @ weighted) / jnp.maximum(subtree_mass, 1e-12)[:, None]
  # world body: MuJoCo sets subtree_com[0] to com of everything (mass-weighted
  # over all bodies) which the formula already yields given mass[0] = 0.

  # spatial inertia of each body at its root's subtree com frame (c-frame)
  root = s.body_rootid
  croot = subtree_com[root]  # (nbody, 3)
  inert_world = jnp.einsum(
      'bij,bj,bkj->bik', d.ximat, m.body_inertia, d.ximat)
  offset = d.xipos - croot
  cinr = pmath.spatial_inertia(mass, inert_world, offset)

  # cdof
  cdof = jnp.zeros((s.nv, 6), dtype)
  jnt_body = s.jnt_bodyid
  for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE, JointType.HINGE):
    jsel = np.nonzero(s.jnt_type == int(jt))[0]
    if len(jsel) == 0:
      continue
    dadr = s.jnt_dofadr[jsel]
    b = jnt_body[jsel]
    if jt == JointType.SLIDE:
      ax = d.xaxis[jsel]
      cdof = cdof.at[dadr].set(
          jnp.concatenate([jnp.zeros_like(ax), ax], axis=-1))
    elif jt == JointType.HINGE:
      ax = d.xaxis[jsel]
      off = croot[b] - d.xanchor[jsel]
      cdof = cdof.at[dadr].set(jnp.concatenate([ax, jnp.cross(ax, off)], -1))
    elif jt == JointType.BALL:
      R = d.xmat[b]  # columns are body axes in world
      off = croot[b] - d.xanchor[jsel]
      for i in range(3):
        ax = R[:, :, i]
        cdof = cdof.at[dadr + i].set(
            jnp.concatenate([ax, jnp.cross(ax, off)], -1))
    else:  # FREE: 3 world-frame translations, then 3 body-frame rotations
      eye = jnp.eye(3, dtype=dtype)
      for i in range(3):
        tr = jnp.broadcast_to(eye[i], (len(jsel), 3))
        cdof = cdof.at[dadr + i].set(
            jnp.concatenate([jnp.zeros_like(tr), tr], -1))
      R = d.xmat[b]
      off = croot[b] - d.xanchor[jsel]
      for i in range(3):
        ax = R[:, :, i]
        cdof = cdof.at[dadr + 3 + i].set(
            jnp.concatenate([ax, jnp.cross(ax, off)], -1))

  return d.replace(subtree_com=subtree_com, cinr=cinr, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
  """mj_comVel analog: body spatial velocities and cdof time-derivatives."""
  s = m.stat
  dtype = d.qpos.dtype
  anc = jnp.asarray(s.ancestor_mask, dtype)
  prefix = jnp.asarray(s.dof_prefix_mask, dtype)

  dof_vel = d.cdof * d.qvel[:, None]  # (nv, 6)
  cvel = anc @ dof_vel  # (nbody, 6)
  prefix_vel = prefix @ dof_vel  # (nv, 6): velocity 'seen' by each dof
  cdof_dot = pmath.motion_cross(prefix_vel, d.cdof)
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)
