"""Motion preprocessing pipeline: qpos trajectories -> motion npz.

Capability mirror of reference src/mjlab/scripts/csv_to_npz.py: input
trajectories (CSV base pose + joint positions, or programmatic qpos) are
resampled to the control rate (lerp + slerp), replayed through CPU MuJoCo
forward kinematics to extract world body poses, and differentiated
(finite differences; SO(3) log for angular velocity) into the npz schema
consumed by MotionLoader: joint_pos, joint_vel, body_pos_w, body_quat_w,
body_lin_vel_w, body_ang_vel_w.

Also provides a synthetic G1 motion generator used for tests/demos (no
external motion-capture download required in this environment).
"""

from __future__ import annotations

import numpy as np

# Bump when the G1 robot description or the synthetic-motion recipe
# changes: cached npz files embed robot body poses, so a stale cache
# against a new robot silently corrupts tracking training targets.
G1_MOTION_VERSION = 3


def _quat_slerp_np(q0, q1, t):
  d = np.sum(q0 * q1, axis=-1, keepdims=True)
  q1 = np.where(d < 0, -q1, q1)
  d = np.abs(d).clip(-1, 1)
  theta = np.arccos(d)
  sin_t = np.sin(theta)
  w0 = np.where(sin_t > 1e-6, np.sin((1 - t) * theta) / np.maximum(sin_t, 1e-12), 1 - t)
  w1 = np.where(sin_t > 1e-6, np.sin(t * theta) / np.maximum(sin_t, 1e-12), t)
  q = w0 * q0 + w1 * q1
  return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _quat_log(q):
  """Rotation vector of unit quaternion (w,x,y,z)."""
  q = np.where(q[..., :1] < 0, -q, q)
  sin_half = np.linalg.norm(q[..., 1:], axis=-1)
  angle = 2.0 * np.arctan2(sin_half, q[..., 0])
  axis = q[..., 1:] / np.maximum(sin_half, 1e-12)[..., None]
  return np.where((sin_half > 1e-8)[..., None], axis * angle[..., None],
                  2.0 * q[..., 1:])


def _quat_mul_np(a, b):
  aw, ax, ay, az = np.moveaxis(a, -1, 0)
  bw, bx, by, bz = np.moveaxis(b, -1, 0)
  return np.stack([
      aw * bw - ax * bx - ay * by - az * bz,
      aw * bx + ax * bw + ay * bz - az * by,
      aw * by - ax * bz + ay * bw + az * bx,
      aw * bz + ax * by - ay * bx + az * bw], -1)


def _quat_conj_np(q):
  return q * np.array([1.0, -1, -1, -1])


def resample_qpos(qpos: np.ndarray, in_fps: float, out_fps: float,
                  quat_cols: list[int]) -> np.ndarray:
  """Resample a (T, nq) trajectory to out_fps; slerp quaternion columns
  (reference csv_to_npz.py:98-121)."""
  T = qpos.shape[0]
  dur = (T - 1) / in_fps
  n_out = int(np.floor(dur * out_fps)) + 1
  t_out = np.arange(n_out) / out_fps * in_fps
  i0 = np.clip(np.floor(t_out).astype(int), 0, T - 1)
  i1 = np.clip(i0 + 1, 0, T - 1)
  a = (t_out - i0)[:, None]
  out = qpos[i0] * (1 - a) + qpos[i1] * a
  for qc in quat_cols:
    out[:, qc:qc + 4] = _quat_slerp_np(
        qpos[i0, qc:qc + 4], qpos[i1, qc:qc + 4], a)
  return out


def qpos_to_motion(mj_model, body_names_prefixed: list[str],
                   joint_q_adr: np.ndarray, free_q_adr: np.ndarray,
                   qpos_traj: np.ndarray, fps: float) -> dict:
  """Replay a qpos trajectory through FK; extract the motion npz arrays."""
  import mujoco
  md = mujoco.MjData(mj_model)
  body_ids = [mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_BODY, n)
              for n in body_names_prefixed]
  T = qpos_traj.shape[0]
  B = len(body_ids)
  body_pos = np.zeros((T, B, 3))
  body_quat = np.zeros((T, B, 4))
  for t in range(T):
    md.qpos[:] = qpos_traj[t]
    mujoco.mj_kinematics(mj_model, md)
    body_pos[t] = md.xpos[body_ids]
    body_quat[t] = md.xquat[body_ids]

  dt = 1.0 / fps
  joint_pos = qpos_traj[:, joint_q_adr]
  joint_vel = np.gradient(joint_pos, dt, axis=0)
  body_lin_vel = np.gradient(body_pos, dt, axis=0)
  # angular velocity via SO(3) log of relative rotation (world frame)
  dq = _quat_mul_np(body_quat[1:], _quat_conj_np(body_quat[:-1]))
  ang = _quat_log(dq) / dt
  body_ang_vel = np.concatenate([ang[:1], ang], axis=0)
  return dict(joint_pos=joint_pos.astype(np.float32),
              joint_vel=joint_vel.astype(np.float32),
              body_pos_w=body_pos.astype(np.float32),
              body_quat_w=body_quat.astype(np.float32),
              body_lin_vel_w=body_lin_vel.astype(np.float32),
              body_ang_vel_w=body_ang_vel.astype(np.float32))


def csv_to_npz(csv_path: str, robot_cfg, output_path: str,
               input_fps: float = 30.0, output_fps: float = 50.0):
  """CSV rows = [base_pos(3), base_quat(4, wxyz), joint_pos(nj)] -> npz."""
  from mjlab_tpu.entity.entity import Entity
  raw = np.loadtxt(csv_path, delimiter=',')
  ent = Entity(robot_cfg)
  mj = ent.spec.compile()
  idx = ent.compute_indexing(mj, '')
  nq = mj.nq
  qpos = np.zeros((raw.shape[0], nq))
  qpos[:, idx.free_q_adr] = raw[:, :7]
  qpos[:, idx.q_adr] = raw[:, 7:]
  qpos = resample_qpos(qpos, input_fps, output_fps,
                       quat_cols=[int(idx.free_q_adr[3])])
  motion = qpos_to_motion(mj, list(idx.body_names), idx.q_adr,
                          idx.free_q_adr, qpos, output_fps)
  np.savez(output_path, **motion)
  return output_path


def project_ground_clearance(mj_model, qpos: np.ndarray, root_z_adr: int,
                             clearance: float = 0.002) -> None:
  """Lift each frame's root so the lowest collision-geom surface point
  sits at ~`clearance` above z=0 (in place). Hand-authored kinematic
  motions do not keep the feet on the floor exactly; frames that dip
  collision geoms below the plane would make RSI resets start deeply
  penetrated (multi-cm), which explodes f32 contact forces."""
  import mujoco
  d = mujoco.MjData(mj_model)
  for fi in range(qpos.shape[0]):
    d.qpos[:] = qpos[fi]
    mujoco.mj_kinematics(mj_model, d)
    zmin = np.inf
    for g in range(mj_model.ngeom):
      if mj_model.geom_contype[g] == 0 and mj_model.geom_conaffinity[g] == 0:
        continue
      xz = d.geom_xpos[g][2]
      R = d.geom_xmat[g].reshape(3, 3)
      sz = mj_model.geom_size[g]
      typ = mj_model.geom_type[g]
      if typ == mujoco.mjtGeom.mjGEOM_SPHERE:
        z = xz - sz[0]
      elif typ == mujoco.mjtGeom.mjGEOM_CAPSULE:
        z = xz - abs(R[2, 2]) * sz[1] - sz[0]
      elif typ == mujoco.mjtGeom.mjGEOM_BOX:
        z = xz - float(np.abs(R[2, :]) @ sz)
      else:
        z = xz - mj_model.geom_rbound[g]  # conservative bound
      zmin = min(zmin, float(z))
    qpos[fi, root_z_adr] += max(0.0, clearance - zmin)


def generate_g1_walk_csv(csv_path: str, duration_s: float = 10.0,
                         fps: float = 30.0, gait_hz: float = 1.2,
                         turn_deg_s: float = 30.0) -> str:
  """Author a synthetic multi-second G1 walk-and-turn clip as a raw CSV
  in the retargeting-pipeline input format (rows = [base_pos(3),
  base_quat(4, wxyz), joint_pos(29)]) — the same schema the reference's
  csv_to_npz consumes for retargeted human mocap
  (reference src/mjlab/scripts/csv_to_npz.py:98-151). The clip walks
  straight, executes a 90-degree left turn, then walks straight again,
  with alternating leg swings, knee flexion during swing, ankle ground
  compensation and arm counter-swing. Feet are kept clear of the plane
  by project_ground_clearance before writing."""
  from mjlab_tpu.asset_zoo.unitree_g1 import G1_ROBOT_CFG, HOME_KEYFRAME
  from mjlab_tpu.entity.entity import Entity
  from mjlab_tpu.utils.string import resolve_matching_names_values

  ent = Entity(G1_ROBOT_CFG)
  mj = ent.spec.compile()
  idx = ent.compute_indexing(mj, '')
  names = list(idx.joint_names)
  nj = len(names)
  T = int(duration_s * fps)
  t = np.arange(T) / fps

  base_j = np.zeros(nj)
  ids, _, vals = resolve_matching_names_values(
      HOME_KEYFRAME.joint_pos, names)
  base_j[ids] = vals
  joint = np.tile(base_j, (T, 1))
  j = {n: i for i, n in enumerate(names)}

  # gait phases: left leg leads, right leg half a cycle behind
  phase = 2 * np.pi * gait_hz * t
  swing_amp, knee_amp = 0.22, 0.35
  for side, ph in (('left', phase), ('right', phase + np.pi)):
    s, c = np.sin(ph), np.cos(ph)
    # hip pitch swings the leg fore/aft about the crouched home pose
    joint[:, j[f'{side}_hip_pitch_joint']] = -0.1 - swing_amp * s
    # knee flexes while the leg swings forward (unloaded half-cycle)
    joint[:, j[f'{side}_knee_joint']] = 0.3 + knee_amp * np.maximum(c, 0.0)
    # ankle keeps the foot roughly level with the ground
    joint[:, j[f'{side}_ankle_pitch_joint']] = (
        -0.2 + swing_amp * s - knee_amp * np.maximum(c, 0.0) * 0.5)
  # arm counter-swing (opposite the ipsilateral leg)
  joint[:, j['left_shoulder_pitch_joint']] = 0.2 + 0.15 * np.sin(phase)
  joint[:, j['right_shoulder_pitch_joint']] = 0.2 - 0.15 * np.sin(phase)

  # heading: straight 40%, left turn to 90 deg, straight again
  turn_rate = np.zeros(T)
  t0, t1 = 0.4 * duration_s, 0.4 * duration_s + 90.0 / turn_deg_s
  turn_rate[(t >= t0) & (t < t1)] = np.deg2rad(turn_deg_s)
  yaw = np.cumsum(turn_rate) / fps

  # forward speed consistent with the leg swing (stride ~= 2 L sin(A))
  leg_len = 0.6
  speed = 2.0 * leg_len * np.sin(swing_amp) * gait_hz
  heading = np.stack([np.cos(yaw), np.sin(yaw)], -1)
  pos_xy = np.cumsum(speed * heading / fps, axis=0)

  qpos = np.zeros((T, mj.nq))
  qpos[:, idx.free_q_adr[0]:idx.free_q_adr[0] + 2] = pos_xy
  # slight vertical bob at twice the gait frequency
  qpos[:, idx.free_q_adr[2]] = HOME_KEYFRAME.pos[2] - 0.02 * (
      1 - np.cos(2 * phase)) * 0.5
  qpos[:, idx.free_q_adr[3]] = np.cos(yaw / 2)  # w
  qpos[:, idx.free_q_adr[6]] = np.sin(yaw / 2)  # z
  qpos[:, idx.q_adr] = joint
  project_ground_clearance(mj, qpos, int(idx.free_q_adr[2]))

  rows = np.concatenate([
      qpos[:, idx.free_q_adr[0]:idx.free_q_adr[0] + 3],
      qpos[:, idx.free_q_adr[3]:idx.free_q_adr[3] + 4],
      qpos[:, idx.q_adr]], axis=1)
  np.savetxt(csv_path, rows, delimiter=',')
  return csv_path


def generate_g1_squat_motion(output_path: str, duration_s: float = 8.0,
                             fps: float = 50.0) -> str:
  """Synthetic squat + arm-swing reference motion for the G1 (kinematic),
  used where motion-capture data is unavailable."""
  from mjlab_tpu.asset_zoo.unitree_g1 import G1_ROBOT_CFG, HOME_KEYFRAME
  from mjlab_tpu.entity.entity import Entity
  from mjlab_tpu.utils.string import resolve_matching_names_values

  ent = Entity(G1_ROBOT_CFG)
  mj = ent.spec.compile()
  idx = ent.compute_indexing(mj, '')
  nj = len(idx.joint_names)
  T = int(duration_s * fps)
  t = np.arange(T) / fps

  base = np.zeros(nj)
  ids, _, vals = resolve_matching_names_values(
      HOME_KEYFRAME.joint_pos, idx.joint_names)
  base[ids] = vals

  qpos = np.zeros((T, mj.nq))
  phase = 2 * np.pi * 0.5 * t  # 0.5 Hz squat
  # 0..0.22 m commanded dip; the ground-clearance projection below lifts
  # frames whose feet would sink, so the realized anchor oscillation is
  # set by the leg-bend kinematics (~0.1 m for this depth on the real G1)
  depth = 0.22 * 0.5 * (1 - np.cos(phase))
  qpos[:, idx.free_q_adr[0]] = 0.0
  qpos[:, idx.free_q_adr[2]] = HOME_KEYFRAME.pos[2] - depth
  qpos[:, idx.free_q_adr[3]] = 1.0  # identity quat

  joint = np.tile(base, (T, 1))

  def set_j(pattern, values):
    ids, _, _ = resolve_matching_names_values({pattern: 0.0},
                                              idx.joint_names)
    for i in ids:
      joint[:, i] = values

  # crouch kinematics: hip/knee/ankle follow the squat depth
  set_j('.*_hip_pitch_joint', -0.1 - 2.4 * depth)
  set_j('.*_knee_joint', 0.3 + 4.2 * depth)
  set_j('.*_ankle_pitch_joint', -0.2 - 1.8 * depth)
  # arm swing
  swing = 0.3 * np.sin(phase)
  ids, _, _ = resolve_matching_names_values(
      {'left_shoulder_pitch_joint': 0.0}, idx.joint_names)
  joint[:, ids[0]] = 0.2 + swing
  ids, _, _ = resolve_matching_names_values(
      {'right_shoulder_pitch_joint': 0.0}, idx.joint_names)
  joint[:, ids[0]] = 0.2 - swing

  qpos[:, idx.q_adr] = joint

  project_ground_clearance(mj, qpos, int(idx.free_q_adr[2]))

  motion = qpos_to_motion(mj, list(idx.body_names), idx.q_adr,
                          idx.free_q_adr, qpos, fps)
  np.savez(output_path, **motion)
  return output_path


def _render_motion(npz_path: str, robot_cfg, out_path: str, fps: float):
  """Kinematic replay of a motion npz to mp4 (reference csv_to_npz.py
  --render): root pose + joint_pos are reassembled into qpos and drawn
  with the offscreen renderer."""
  from mjlab_tpu.entity.entity import Entity
  blob = np.load(npz_path)
  ent = Entity(robot_cfg)
  mj = ent.spec.compile()
  idx = ent.compute_indexing(mj, '')
  T = blob['joint_pos'].shape[0]
  qpos = np.zeros((T, mj.nq))
  qpos[:, idx.free_q_adr[:3]] = blob['body_pos_w'][:, 0]
  qpos[:, idx.free_q_adr[3:]] = blob['body_quat_w'][:, 0]
  qpos[:, idx.q_adr] = blob['joint_pos']

  class _Env:  # render_trajectory only needs these two attributes
    scene = type('S', (), {'mj_model': mj})
    step_dt = 1.0 / fps
  from mjlab_tpu.viewer.offscreen import render_trajectory
  render_trajectory(_Env(), qpos, out_path, fps=int(fps))


def main(argv=None):
  """csv_to_npz CLI (reference scripts/csv_to_npz.py): CSV rows of
  [base_pos(3), base_quat(4 wxyz), joint_pos(nj)] -> MotionLoader npz,
  or --synthetic-squat for the built-in G1 test motion."""
  import argparse
  parser = argparse.ArgumentParser(description=main.__doc__)
  parser.add_argument('--csv', default=None, help='input CSV trajectory')
  parser.add_argument('--output', required=True, help='output npz path')
  parser.add_argument('--robot', default='g1', choices=('g1', 'go1'))
  parser.add_argument('--input-fps', type=float, default=30.0)
  parser.add_argument('--output-fps', type=float, default=50.0)
  parser.add_argument('--synthetic-squat', action='store_true',
                      help='generate the synthetic G1 squat instead of '
                      'reading a CSV')
  parser.add_argument('--synthetic-walk', action='store_true',
                      help='author the synthetic G1 walk-and-turn clip as '
                      'a CSV next to --output and run it through the full '
                      'csv_to_npz retargeting path')
  parser.add_argument('--render', default=None, metavar='MP4',
                      help='also render a kinematic replay video')
  args = parser.parse_args(argv)

  if args.robot == 'g1':
    from mjlab_tpu.asset_zoo.unitree_g1 import G1_ROBOT_CFG as robot_cfg
  else:
    from mjlab_tpu.asset_zoo.unitree_go1 import GO1_ROBOT_CFG as robot_cfg

  if args.synthetic_squat:
    if args.robot != 'g1':
      parser.error('--synthetic-squat generates a G1 motion; use --robot g1')
    generate_g1_squat_motion(args.output, fps=args.output_fps)
  elif args.synthetic_walk:
    if args.robot != 'g1':
      parser.error('--synthetic-walk generates a G1 motion; use --robot g1')
    import os
    csv_path = os.path.splitext(args.output)[0] + '.csv'
    generate_g1_walk_csv(csv_path, fps=args.input_fps)
    print(f'wrote {csv_path}')
    csv_to_npz(csv_path, robot_cfg, args.output,
               input_fps=args.input_fps, output_fps=args.output_fps)
  elif args.csv:
    csv_to_npz(args.csv, robot_cfg, args.output,
               input_fps=args.input_fps, output_fps=args.output_fps)
  else:
    parser.error('provide --csv or --synthetic-squat')
  print(f'wrote {args.output}')
  if args.render:
    _render_motion(args.output, robot_cfg, args.render,
                   fps=args.output_fps)
    print(f'rendered {args.render}')


if __name__ == '__main__':
  main()
