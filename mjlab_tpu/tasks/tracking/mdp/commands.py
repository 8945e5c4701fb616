"""Motion-tracking command: reference-motion playback with adaptive start
sampling and reference state initialization (RSI).

Functional port of the reference's BeyondMimic-style MotionCommand
(reference src/mjlab/tasks/tracking/mdp/commands.py): per-env time indices
into a motion library, EMA of per-bin failure counts smoothed with a
decaying kernel driving multinomial start-bin sampling, anchor-body
yaw-only alignment for relative body targets, and RSI pose/velocity/joint
randomization on resample. All state lives in a pytree dict; the motion
arrays ride along as (constant) leaves so they are program inputs rather
than baked-in HLO constants.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.term_cfg import CommandTermCfg
from mjlab_tpu.utils import math as tmath


class MotionLoader:
  """npz motion library (reference commands.py:30-66): arrays
  joint_pos/joint_vel (T, nj) and body_pos_w/body_quat_w/body_lin_vel_w/
  body_ang_vel_w (T, nbody_motion, ...)."""

  def __init__(self, motion_file: str, body_indexes: np.ndarray):
    data = np.load(motion_file)
    self.joint_pos = np.asarray(data['joint_pos'], np.float32)
    self.joint_vel = np.asarray(data['joint_vel'], np.float32)
    self.body_pos_w = np.asarray(data['body_pos_w'], np.float32)[:, body_indexes]
    self.body_quat_w = np.asarray(data['body_quat_w'], np.float32)[:, body_indexes]
    self.body_lin_vel_w = np.asarray(
        data['body_lin_vel_w'], np.float32)[:, body_indexes]
    self.body_ang_vel_w = np.asarray(
        data['body_ang_vel_w'], np.float32)[:, body_indexes]
    self.time_step_total = self.joint_pos.shape[0]


@dataclasses.dataclass
class MotionCommandCfg(CommandTermCfg):
  motion_file: str = ''
  anchor_body_name: str = ''
  body_names: tuple = ()
  asset_name: str = 'robot'
  pose_range: dict = dataclasses.field(default_factory=dict)
  velocity_range: dict = dataclasses.field(default_factory=dict)
  joint_position_range: tuple = (-0.52, 0.52)
  adaptive_kernel_size: int = 1
  adaptive_lambda: float = 0.8
  adaptive_uniform_ratio: float = 0.1
  adaptive_alpha: float = 0.001
  disable_adaptive_sampling: bool = False

  def __post_init__(self):
    if self.class_type is None:
      self.class_type = MotionCommand


class MotionCommand(CommandTerm):

  def __init__(self, cfg: MotionCommandCfg, scene, num_envs: int):
    super().__init__(cfg, scene, num_envs)
    view = scene[cfg.asset_name]
    self.view = view
    names = list(cfg.body_names)
    self.robot_anchor_idx = list(view.idx.body_names).index(
        cfg.anchor_body_name)
    self.motion_anchor_idx = names.index(cfg.anchor_body_name)
    from mjlab_tpu.utils.string import resolve_matching_names
    ids, _ = resolve_matching_names(names, view.idx.body_names,
                                    preserve_order=True)
    self.body_indexes = np.asarray(ids, np.int32)  # entity-local body ids
    # motion body columns assumed in entity body order (csv_to_npz writes
    # all robot bodies) -> select tracked subset
    self.motion = MotionLoader(cfg.motion_file, self.body_indexes)
    self.n_bodies = len(names)
    # static adaptive-sampling constants (must NOT be created inside
    # init_state: it runs under the env's jitted bootstrap, and jnp
    # constants made there are tracers that would leak via self)
    T = self.motion.time_step_total
    self.n_bins = int(T // 50) + 1  # ~1 bin/s at 50 Hz control
    lam = cfg.adaptive_lambda
    k = cfg.adaptive_kernel_size
    kern = np.asarray([lam ** i for i in range(k)], np.float32)
    self.kernel = kern / kern.sum()

  @property
  def dim(self):
    return 2 * self.motion.joint_pos.shape[1]

  # ------------------------------------------------------------------
  def init_state(self, key):
    n = self.num_envs
    st = {
        'time_steps': jnp.zeros(n, jnp.int32),
        'time_left': jnp.full((n,), 1e9, jnp.float32),
        'bin_failed': jnp.zeros(self.n_bins, jnp.float32),
        'current_bin_failed': jnp.zeros(self.n_bins, jnp.float32),
        'body_pos_relative_w': jnp.zeros((n, self.n_bodies, 3)),
        'body_quat_relative_w': jnp.zeros(
            (n, self.n_bodies, 4)).at[:, :, 0].set(1.0),
        'motion/joint_pos': jnp.asarray(self.motion.joint_pos),
        'motion/joint_vel': jnp.asarray(self.motion.joint_vel),
        'motion/body_pos_w': jnp.asarray(self.motion.body_pos_w),
        'motion/body_quat_w': jnp.asarray(self.motion.body_quat_w),
        'motion/body_lin_vel_w': jnp.asarray(self.motion.body_lin_vel_w),
        'motion/body_ang_vel_w': jnp.asarray(self.motion.body_ang_vel_w),
    }
    for k_ in ('error_anchor_pos', 'error_anchor_rot', 'error_body_pos',
               'error_body_rot', 'error_joint_pos', 'error_joint_vel',
               'sampling_entropy', 'sampling_top1_prob'):
      st[f'metric/{k_}'] = jnp.zeros(n, jnp.float32)
    return st

  # motion lookups -----------------------------------------------------
  def joint_pos_target(self, st):
    return st['motion/joint_pos'][st['time_steps']]

  def joint_vel_target(self, st):
    return st['motion/joint_vel'][st['time_steps']]

  def body_pos_w(self, st, ctx):
    return (st['motion/body_pos_w'][st['time_steps']]
            + ctx.env_origins[:, None, :])

  def body_quat_w(self, st):
    return st['motion/body_quat_w'][st['time_steps']]

  def body_lin_vel_w(self, st):
    return st['motion/body_lin_vel_w'][st['time_steps']]

  def body_ang_vel_w(self, st):
    return st['motion/body_ang_vel_w'][st['time_steps']]

  def anchor_pos_w(self, st, ctx):
    return self.body_pos_w(st, ctx)[:, self.motion_anchor_idx]

  def anchor_quat_w(self, st):
    return self.body_quat_w(st)[:, self.motion_anchor_idx]

  # robot lookups ------------------------------------------------------
  def robot_body_pos_w(self, ctx):
    return self.view.body_pos_w(ctx.data, self.body_indexes)

  def robot_body_quat_w(self, ctx):
    return self.view.body_quat_w(ctx.data, self.body_indexes)

  def robot_body_lin_vel_w(self, ctx):
    return self.view.body_lin_vel_w(ctx.data, self.body_indexes)

  def robot_body_ang_vel_w(self, ctx):
    return self.view.body_ang_vel_w(ctx.data, self.body_indexes)

  def robot_anchor_pos_w(self, ctx):
    return self.view.body_pos_w(ctx.data)[:, self.robot_anchor_idx]

  def robot_anchor_quat_w(self, ctx):
    return self.view.body_quat_w(ctx.data)[:, self.robot_anchor_idx]

  def value(self, st):
    jp = self.joint_pos_target(st)
    jv = self.joint_vel_target(st)
    return jnp.concatenate([jp, jv], axis=-1)

  # ------------------------------------------------------------------
  def _adaptive_probs(self, st):
    p = (st['bin_failed']
         + self.cfg.adaptive_uniform_ratio / float(self.n_bins))
    # non-causal smoothing with replicate right-padding
    k = self.cfg.adaptive_kernel_size
    padded = jnp.concatenate(
        [p, jnp.repeat(p[-1:], max(k - 1, 0), axis=0)])
    idx = jnp.arange(self.n_bins)[:, None] + jnp.arange(k)[None, :]
    p = jnp.sum(padded[idx] * self.kernel[None, :], axis=-1)
    return p / jnp.sum(p)

  def _sample_time_steps(self, st, mask, key):
    T = self.motion.time_step_total
    if self.cfg.disable_adaptive_sampling:
      new_ts = jnp.zeros(self.num_envs, jnp.int32)
      return new_ts, st
    probs = self._adaptive_probs(st)
    k1, k2 = jax.random.split(key)
    bins = jax.random.categorical(
        k1, jnp.log(probs + 1e-12), shape=(self.num_envs,))
    frac = jax.random.uniform(k2, (self.num_envs,))
    new_ts = (((bins + frac) / self.n_bins) * (T - 1)).astype(jnp.int32)
    # sampling metrics
    H = -jnp.sum(probs * jnp.log(probs + 1e-12)) / jnp.log(float(self.n_bins))
    st = dict(st)
    st['metric/sampling_entropy'] = jnp.full(
        (self.num_envs,), H, jnp.float32)
    st['metric/sampling_top1_prob'] = jnp.full(
        (self.num_envs,), jnp.max(probs), jnp.float32)
    return new_ts, st

  def _record_failures(self, st, ctx, mask):
    """Accumulate failure bins for terminated (not timed-out) envs."""
    T = self.motion.time_step_total
    bins = jnp.clip((st['time_steps'] * self.n_bins) // max(T, 1),
                    0, self.n_bins - 1)
    failed = mask & ctx.terminated
    counts = jnp.zeros(self.n_bins, jnp.float32).at[bins].add(
        failed.astype(jnp.float32))
    st = dict(st)
    st['current_bin_failed'] = st['current_bin_failed'] + counts
    return st

  def reset(self, state, ctx, mask, key):
    st = self._record_failures(state, ctx, mask)
    st = self._resample(st, ctx, mask, key)
    return st

  def _resample(self, st, ctx, mask, key):
    """Adaptive start sampling + RSI writes for masked envs. Note: the data
    writes happen through ctx.data mutation performed by the env's reset
    event `reset_to_motion` (events must own data writes in the functional
    split) - here we only resample time indices."""
    keys = jax.random.split(key, 2)
    new_ts, st = self._sample_time_steps(st, mask, keys[0])
    st = dict(st)
    st['time_steps'] = jnp.where(mask, new_ts, st['time_steps'])
    return st

  def compute(self, state, ctx, key, dt):
    """Per-step update: advance time, loop-resample finished motions,
    recompute anchor-aligned relative targets, EMA bin failures."""
    st = dict(state)
    st = self._update_metrics(st, ctx, dt)
    st['time_steps'] = st['time_steps'] + 1
    ended = st['time_steps'] >= self.motion.time_step_total
    new_ts, st = self._sample_time_steps(st, ended, key)
    st['time_steps'] = jnp.where(ended, new_ts, st['time_steps'])

    # anchor-aligned relative body targets (yaw-only delta,
    # reference commands.py:364-397)
    anchor_pos = self.anchor_pos_w(st, ctx)  # (N, 3)
    anchor_quat = self.anchor_quat_w(st)
    r_anchor_pos = self.robot_anchor_pos_w(ctx)
    r_anchor_quat = self.robot_anchor_quat_w(ctx)
    delta_pos = r_anchor_pos.at[:, 2].set(anchor_pos[:, 2])  # keep motion z
    delta_ori = tmath.yaw_quat(
        tmath.quat_mul(r_anchor_quat, tmath.quat_inv(anchor_quat)))
    bq = self.body_quat_w(st)
    bp = self.body_pos_w(st, ctx)
    st['body_quat_relative_w'] = tmath.quat_mul(delta_ori[:, None, :], bq)
    st['body_pos_relative_w'] = delta_pos[:, None, :] + tmath.quat_apply(
        delta_ori[:, None, :], bp - anchor_pos[:, None, :])

    # EMA of failure bins (reference commands.py:394-397)
    a = self.cfg.adaptive_alpha
    st['bin_failed'] = (a * st['current_bin_failed']
                        + (1 - a) * st['bin_failed'])
    st['current_bin_failed'] = jnp.zeros_like(st['current_bin_failed'])
    return st

  def _update_metrics(self, st, ctx, dt):
    st = dict(st)
    st['metric/error_anchor_pos'] = jnp.linalg.norm(
        self.anchor_pos_w(st, ctx) - self.robot_anchor_pos_w(ctx), axis=-1)
    st['metric/error_anchor_rot'] = tmath.quat_error_magnitude(
        self.anchor_quat_w(st), self.robot_anchor_quat_w(ctx))
    st['metric/error_body_pos'] = jnp.mean(jnp.linalg.norm(
        st['body_pos_relative_w'] - self.robot_body_pos_w(ctx), axis=-1), -1)
    st['metric/error_body_rot'] = jnp.mean(tmath.quat_error_magnitude(
        st['body_quat_relative_w'], self.robot_body_quat_w(ctx)), -1)
    st['metric/error_joint_pos'] = jnp.linalg.norm(
        self.joint_pos_target(st) - self.view.joint_pos(ctx.data), axis=-1)
    st['metric/error_joint_vel'] = jnp.linalg.norm(
        self.joint_vel_target(st) - self.view.joint_vel(ctx.data), axis=-1)
    return st

  def debug_vis(self, state, env, env_index: int, vis) -> None:
    """Ghost robot at the anchor-aligned motion target pose + target-body
    markers (host-side; reference commands.py:400-416 ghost meshes)."""
    e = env_index
    t = int(np.asarray(state['time_steps'][e]))
    # aligned target poses: body 0 of the tracked list is the robot root
    pos_rel = np.asarray(state['body_pos_relative_w'][e])
    quat_rel = np.asarray(state['body_quat_relative_w'][e])
    joint_pos = np.asarray(state['motion/joint_pos'][t])
    qpos = np.concatenate([pos_rel[0], quat_rel[0], joint_pos])
    vis.add_ghost_qpos(qpos, alpha=0.35)
    for p in pos_rel:
      vis.add_sphere(p, radius=0.02, color=(1.0, 0.3, 0.3, 0.8))


def reset_to_motion(ctx, data, mask, key, command_name: str = 'motion'):
  """Reset event: RSI - write the motion reference state (with pose /
  velocity / joint randomization from the command cfg) into the sim for
  masked envs (reference commands.py:299-362)."""
  term: MotionCommand = ctx.command_terms[command_name]
  st = ctx.state.command[command_name]
  cfg: MotionCommandCfg = term.cfg
  view = term.view
  n = ctx.num_envs
  dtype = data.qpos.dtype

  keys = jax.random.split(key, 4)
  root_pos = term.body_pos_w(st, ctx)[:, 0]
  root_ori = term.body_quat_w(st)[:, 0]
  root_lin = term.body_lin_vel_w(st)[:, 0]
  root_ang = term.body_ang_vel_w(st)[:, 0]

  pr = [cfg.pose_range.get(k, (0.0, 0.0))
        for k in ('x', 'y', 'z', 'roll', 'pitch', 'yaw')]
  pr = jnp.asarray(pr, dtype)
  samp = jax.random.uniform(keys[0], (n, 6), dtype) * (
      pr[:, 1] - pr[:, 0]) + pr[:, 0]
  root_pos = root_pos + samp[:, :3]
  dq = tmath.quat_from_euler_xyz(samp[:, 3], samp[:, 4], samp[:, 5])
  root_ori = tmath.quat_mul(dq, root_ori)

  vr = [cfg.velocity_range.get(k, (0.0, 0.0))
        for k in ('x', 'y', 'z', 'roll', 'pitch', 'yaw')]
  vr = jnp.asarray(vr, dtype)
  samp = jax.random.uniform(keys[1], (n, 6), dtype) * (
      vr[:, 1] - vr[:, 0]) + vr[:, 0]
  root_lin = root_lin + samp[:, :3]
  root_ang = root_ang + samp[:, 3:]

  jp = term.joint_pos_target(st) + jax.random.uniform(
      keys[2], term.joint_pos_target(st).shape, dtype,
      cfg.joint_position_range[0], cfg.joint_position_range[1])
  lim = view.soft_joint_pos_limits
  jp = jnp.clip(jp, lim[:, 0], lim[:, 1])
  jv = term.joint_vel_target(st)

  data = view.write_joint_state(data, jp, jv, mask=mask)
  # free-joint angular velocity is body-local (reference commands.py:352-359)
  root_state = jnp.concatenate(
      [root_pos, root_ori, root_lin,
       tmath.quat_apply_inverse(root_ori, root_ang)], axis=-1)
  data = view.write_root_state(data, root_state, mask)
  return data
