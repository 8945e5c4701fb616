"""Forward dynamics pipeline and integrators (the engine's `step`).

Single-env, pure function `step(model, data) -> data`; batching is
`jax.vmap` over Data (and optionally Model leaves for domain
randomization). This is the TPU equivalent of `mjwarp.step` driven through
CUDA graphs in the reference (reference src/mjlab/sim/sim.py:124-195) -
under `jax.jit` the whole pipeline is one fused XLA program, so the
reference's graph-capture machinery has no analog here.

Supported integrators: Euler (with implicit joint damping, matching
MuJoCo's eulerdamp behavior) and implicitfast (implicit in velocity via
the diagonal damping + actuator velocity-derivative terms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics import collision as _collision
from mjlab_tpu.physics import constraint as _constraint
from mjlab_tpu.physics import kinematics as _kinematics
from mjlab_tpu.physics import math as pmath
from mjlab_tpu.physics import sensor as _sensor
from mjlab_tpu.physics import smooth as _smooth
from mjlab_tpu.physics import smooth_fused as _smooth_fused
from mjlab_tpu.ops.pd_solve import solve_pd as _ops_solve_pd
from mjlab_tpu.physics import solver as _solver
from mjlab_tpu.physics.types import (
    Data,
    DisableBit,
    GainType,
    IntegratorType,
    JointType,
    Model,
)


def fwd_position(m: Model, d: Data) -> Data:
  if _smooth_fused.enabled(m.stat):
    # one fused stage: kinematics + com_pos + com_vel + crb + rne
    # (Pallas kernel under vmap on TPU; fwd_velocity then skips its
    # com_vel/rne calls — see physics/smooth_fused.py)
    d = _smooth_fused.smooth_all(m, d)
  else:
    d = _kinematics.kinematics(m, d)
    d = _kinematics.com_pos(m, d)
    d = _smooth.crb(m, d)
  d = _collision.collision(m, d)
  d = _smooth.tendon(m, d)
  d = _smooth.transmission(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  fused = _smooth_fused.enabled(m.stat)
  if not fused:
    d = _kinematics.com_vel(m, d)
  d = _smooth.passive(m, d)
  if not fused:
    d = _smooth.rne(m, d)
  return d


def forward(m: Model, d: Data) -> Data:
  """Full forward dynamics: position -> velocity -> actuation -> constraint."""
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = _smooth.actuation(m, d)
  d = _smooth.fwd_smooth(m, d)
  efc = _constraint.make_efc(m, d)
  d = _solver.solve(m, d, efc)
  d = d.replace(qacc_warmstart=d.qacc)
  d = _sensor.sensors(m, d)
  return d


def _actuator_vel_deriv(m: Model, d: Data) -> jax.Array:
  """d qfrc_actuator / d qvel (diagonal), for implicitfast."""
  s = m.stat
  dtype = d.qpos.dtype
  if s.nu == 0:
    return jnp.zeros(s.nv, dtype)
  ctrl = d.ctrl
  if not (s.disableflags & DisableBit.CLAMPCTRL):
    limited = jnp.asarray(s.actuator_ctrllimited.astype(bool))
    ctrl = jnp.where(
        limited,
        jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
        ctrl)
  if s.na:
    ctrl, _ = _smooth._act_input(s, m, d, ctrl)
  gain_vel = jnp.where(
      jnp.asarray(s.actuator_gaintype == int(GainType.FIXED)), 0.0,
      m.actuator_gainprm[:, 2])
  bias_vel = jnp.where(
      jnp.asarray(s.actuator_biastype == 1), m.actuator_biasprm[:, 2], 0.0)
  dforce_dvel = gain_vel * ctrl + bias_vel  # per actuator, w.r.t. act vel
  # saturated actuators have zero derivative
  gain = jnp.where(
      jnp.asarray(s.actuator_gaintype == int(GainType.FIXED)),
      m.actuator_gainprm[:, 0],
      m.actuator_gainprm[:, 0] + m.actuator_gainprm[:, 1] * d.actuator_length
      + m.actuator_gainprm[:, 2] * d.actuator_velocity)
  bias = jnp.where(
      jnp.asarray(s.actuator_biastype == 1),
      m.actuator_biasprm[:, 0] + m.actuator_biasprm[:, 1] * d.actuator_length
      + m.actuator_biasprm[:, 2] * d.actuator_velocity,
      0.0)
  force = gain * ctrl + bias
  limited_f = jnp.asarray(s.actuator_forcelimited.astype(bool))
  clamped = limited_f & ((force <= m.actuator_forcerange[:, 0]) |
                         (force >= m.actuator_forcerange[:, 1]))
  dforce_dvel = jnp.where(clamped, 0.0, dforce_dvel)
  gear = m.actuator_gear[:, 0]
  # joint transmissions only: tendon actuators are gated out of the
  # implicit integrators at put_model (non-diagonal velocity derivative)
  jsel, _ = _smooth._trn_groups(s)
  jid = s.actuator_trnid[jsel, 0]
  dadr = s.jnt_dofadr[jid]
  if s.disableflags & DisableBit.ACTUATION:
    return jnp.zeros(s.nv, dtype)
  return jnp.zeros(s.nv, dtype).at[dadr].add(
      gear[jsel] * gear[jsel] * dforce_dvel[jsel])


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                   dt) -> jax.Array:
  """mj_integratePos: joint-type-aware position integration."""
  s = m.stat
  out = qpos
  for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE, JointType.HINGE):
    jsel = np.nonzero(s.jnt_type == int(jt))[0]
    if len(jsel) == 0:
      continue
    qadr = s.jnt_qposadr[jsel]
    dadr = s.jnt_dofadr[jsel]
    if jt in (JointType.HINGE, JointType.SLIDE):
      out = out.at[qadr].add(dt * qvel[dadr])
    elif jt == JointType.BALL:
      q = qpos[qadr[:, None] + np.arange(4)[None, :]]
      w = qvel[dadr[:, None] + np.arange(3)[None, :]]
      newq = pmath.quat_integrate(q, w, dt)
      out = out.at[(qadr[:, None] + np.arange(4)[None, :]).ravel()].set(
          newq.ravel())
    else:  # FREE
      v = qvel[dadr[:, None] + np.arange(3)[None, :]]
      out = out.at[(qadr[:, None] + np.arange(3)[None, :]).ravel()].add(
          (dt * v).ravel())
      q = qpos[qadr[:, None] + 3 + np.arange(4)[None, :]]
      w = qvel[dadr[:, None] + 3 + np.arange(3)[None, :]]
      newq = pmath.quat_integrate(q, w, dt)
      out = out.at[(qadr[:, None] + 3 + np.arange(4)[None, :]).ravel()].set(
          newq.ravel())
  return out


def _advance_act(m: Model, d: Data, dt) -> Data:
  """Integrate actuator activation states: Euler for integrator/filter,
  exact exponential for filterexact; clamp to actrange (mj_advance)."""
  s = m.stat
  if not s.na:
    return d
  asel, aidx = _smooth._act_groups(s)
  dyn = np.asarray(s.actuator_dyntype)[asel]
  dot = d.act_dot[aidx]
  tau = jnp.maximum(m.actuator_dynprm[asel, 0], 1e-15)
  inc = jnp.where(jnp.asarray(dyn == _smooth._DYN_FILTEREXACT),
                  dot * tau * (1.0 - jnp.exp(-dt / tau)), dt * dot)
  act_u = d.act[aidx] + inc
  lim = np.asarray(s.actuator_actlimited)[asel]
  rng = m.actuator_actrange[asel]
  act_u = jnp.where(jnp.asarray(lim),
                    jnp.clip(act_u, rng[:, 0], rng[:, 1]), act_u)
  return d.replace(act=d.act.at[aidx].set(act_u))


def _euler(m: Model, d: Data) -> Data:
  s = m.stat
  dt = m.opt.timestep.astype(d.qpos.dtype)
  d = _advance_act(m, d, dt)
  qacc = d.qacc
  if not (s.disableflags & DisableBit.EULERDAMP):
    # implicit damping: (M + dt*diag(B)) a = qfrc_smooth + qfrc_constraint
    MhB = d.qM + dt * jnp.diag(m.dof_damping)
    rhs = d.qfrc_smooth + d.qfrc_constraint
    qacc = _ops_solve_pd(MhB, rhs)
    # match MuJoCo: only use the implicit solution when damping exists;
    # with zero damping the two coincide, so no branch is needed.
  qvel = d.qvel + dt * qacc
  qpos = _integrate_pos(m, d.qpos, qvel, dt)
  return d.replace(qpos=qpos, qvel=qvel, time=d.time + dt)


def _implicitfast(m: Model, d: Data) -> Data:
  dt = m.opt.timestep.astype(d.qpos.dtype)
  d = _advance_act(m, d, dt)
  deriv = m.dof_damping - _actuator_vel_deriv(m, d)  # -d qfrc/d qvel
  A = d.qM + dt * jnp.diag(deriv)
  rhs = d.qfrc_smooth + d.qfrc_constraint
  # A is SPD for PD actuators (positive damping derivative)
  qacc = _ops_solve_pd(A, rhs)
  qvel = d.qvel + dt * qacc
  qpos = _integrate_pos(m, d.qpos, qvel, dt)
  return d.replace(qpos=qpos, qvel=qvel, time=d.time + dt)


def step(m: Model, d: Data) -> Data:
  """forward + integrate (mj_step analog)."""
  d = forward(m, d)
  if m.stat.integrator == int(IntegratorType.EULER):
    return _euler(m, d)
  elif m.stat.integrator == int(IntegratorType.IMPLICITFAST):
    return _implicitfast(m, d)
  raise NotImplementedError(
      f'integrator {IntegratorType(m.stat.integrator).name} not supported; '
      'use Euler or implicitfast')
