"""On-policy training runner: learn loop, logging, checkpoint/resume.

Replaces rsl_rl's OnPolicyRunner (the reference delegates training to it,
reference src/mjlab/rl/vecenv_wrapper.py + external rsl_rl). Checkpoints
are orbax pytrees of {params, opt state, normalizers, env state, PRNG} -
strictly more resumable than the reference's torch .pt files (env state
included)."""

from __future__ import annotations

import os
import re
import time

import jax
import numpy as np

from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
from mjlab_tpu.rl.ppo import PPO, TrainState


def jnp_asarray_like(value, ref):
  import jax.numpy as jnp
  return jnp.asarray(value, dtype=ref.dtype)


class OnPolicyRunner:

  def __init__(self, env, cfg: RslRlOnPolicyRunnerCfg,
               log_dir: str | None = None, step_fn=None):
    self.env = env
    self.cfg = cfg
    self.alg = PPO(env, cfg, step_fn=step_fn)
    self.ts: TrainState = self.alg.init_state(cfg.seed)
    self.log_dir = log_dir
    self._writers = []
    self._video_buf = None
    if log_dir:
      os.makedirs(log_dir, exist_ok=True)
      if cfg.logger != 'none':
        from mjlab_tpu.rl.writers import make_writers
        self._writers = make_writers(
            cfg.logger, log_dir, project=cfg.experiment_name,
            run_name=cfg.run_name or None)
      if cfg.video:
        import collections
        keep = max(1, -(-cfg.video_length // cfg.num_steps_per_env))
        self._video_buf = collections.deque(maxlen=keep)

  def learn(self, num_iterations: int | None = None,
            log_every: int = 10) -> dict:
    n_iter = num_iterations or self.cfg.max_iterations
    steps_per_iter = self.cfg.num_steps_per_env * self.env.num_envs
    last_logs = {}
    t_start = time.time()
    # throughput is measured across the whole logging window: dispatch is
    # async, so a single-iteration timer would only see the host-side queue
    # time on non-log iterations and the full queued compute on log ones.
    t_win, it_win = time.time(), 0
    for it in range(n_iter):
      self.ts, logs = self.alg.learn_iteration(self.ts)
      if self._video_buf is not None:
        # device arrays only (no host sync); fetched at emit time
        self._video_buf.append(logs.pop('_qpos_env0'))
        if (it + 1) % self.cfg.video_interval == 0:
          self._emit_video(it + 1)
      else:
        logs.pop('_qpos_env0', None)
      if it % log_every == 0 or it == n_iter - 1:
        logs = jax.tree.map(lambda x: float(np.asarray(x)), logs)
        now = time.time()
        dt, n_win = now - t_win, it + 1 - it_win
        t_win, it_win = now, it + 1
        logs['iteration'] = int(np.asarray(self.ts.iteration))
        logs['env_steps_per_s'] = n_win * steps_per_iter / max(dt, 1e-9)
        logs['total_env_steps'] = logs['iteration'] * steps_per_iter
        logs['wall_s'] = time.time() - t_start
        last_logs = logs
        self._write_log(logs)
        # blowup-forensics ring (MJLAB_BLOWUP_DUMP debug mode; no-op and
        # attribute-guarded otherwise — the env fetches the device-side
        # ring here because axon cannot host-callback from inside jit)
        dump = getattr(self.env, 'maybe_dump_forensics', None)
        if dump is not None:
          dump(self.ts.env_state)
      if self.log_dir and self.cfg.save_interval and \
          (it + 1) % self.cfg.save_interval == 0:
        # name by the TRUE training iteration (survives --resume; a
        # resumed run keeps numbering where the loaded checkpoint ended)
        self.save(os.path.join(
            self.log_dir, f'model_{int(np.asarray(self.ts.iteration))}.ckpt'))
    if self.log_dir:
      self.save(os.path.join(
          self.log_dir, f'model_{int(np.asarray(self.ts.iteration))}.ckpt'))
    return last_logs

  def _write_log(self, logs: dict):
    msg = (f"it {logs.get('iteration', 0):6d} | "
           f"rew/s {logs.get('mean_reward', 0):8.3f} | "
           f"ep_rew {logs.get('mean_episode_reward', 0):8.2f} | "
           f"ep_len {logs.get('mean_episode_length', 0):7.1f} | "
           f"kl {logs.get('kl', 0):.4f} | lr {logs.get('lr', 0):.1e} | "
           f"steps/s {logs.get('env_steps_per_s', 0):,.0f}")
    print(msg, flush=True)
    for w in self._writers:
      w.log(logs, logs.get('iteration', 0))

  def _emit_video(self, iteration: int):
    """Render the buffered env-0 qpos window to an mp4 (reference
    scripts/train.py:79-87 RecordVideo analog)."""
    from mjlab_tpu.viewer.offscreen import render_trajectory
    qpos = np.concatenate([np.asarray(q) for q in self._video_buf], axis=0)
    qpos = qpos[-self.cfg.video_length:]
    vdir = os.path.join(self.log_dir, 'videos', 'train')
    os.makedirs(vdir, exist_ok=True)
    path = os.path.join(vdir, f'rl-video-iter-{iteration}.mp4')
    try:
      render_trajectory(self.env, qpos, path)
      print(f'[video] wrote {path}', flush=True)
    except Exception as e:
      print(f'[video] rendering failed: {e!r}', flush=True)

  def close(self):
    for w in self._writers:
      w.close()

  # ------------------------------------------------------------------
  def save(self, path: str, full_state: bool = True):
    """Orbax checkpoint of the FULL TrainState — params, optimizer state,
    obs normalizers, env state pytree, PRNG key, iteration — strictly
    more resumable than the reference's torch model_*.pt files (which
    never checkpoint env/sim state; reference delegates to rsl_rl).
    Falls back to pickle when orbax is unavailable."""
    payload = {
        'params': self.ts.params,
        'opt_state': self.ts.opt_state,
        'actor_norm': self.ts.actor_norm,
        'critic_norm': self.ts.critic_norm,
        'lr': self.ts.lr,
        'rng': self.ts.rng,
        'iteration': self.ts.iteration,
    }
    if full_state:
      env_state = self.ts.env_state
      # debug-only blowup-forensics ring is never checkpointed: it would
      # couple checkpoint structure to a transient debug mode
      if getattr(env_state, 'forensic', None):
        env_state = env_state.replace(forensic={})
      payload['env_state'] = env_state
      payload['obs'] = self.ts.obs
    payload = jax.device_get(payload)
    try:
      import orbax.checkpoint as ocp
      try:
        ocp.PyTreeCheckpointer().save(os.path.abspath(path), payload,
                                      force=True)
      except Exception as e:  # noqa: BLE001
        # orbax's post-commit metadata writer can race its own tmp-dir
        # rename under heavy host contention (observed: ValueError
        # "Checkpoint directory does not exist: ...orbax-checkpoint-tmp"
        # AFTER the final directory was fully committed). A checkpoint
        # hiccup must never kill a training run: if the committed
        # checkpoint restores AND is the one we just tried to write
        # (a stale pre-existing checkpoint at the same path — possible
        # after --resume, since force=True overwrites — must not mask a
        # genuine save failure), continue; otherwise re-raise.
        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        saved_it = int(np.asarray(restored['iteration']))
        want_it = int(np.asarray(payload['iteration']))
        if saved_it != want_it:
          raise RuntimeError(
              f'checkpoint at {path} is stale (iteration {saved_it}, '
              f'expected {want_it}); original save error: {e!r}') from e
        print(f'[ckpt] save raised {e!r} after commit; checkpoint at '
              f'{path} verified fresh (iteration {saved_it}), continuing',
              flush=True)
    except ImportError:
      import pickle
      with open(path, 'wb') as f:
        pickle.dump(payload, f)

  def load(self, path: str, load_env_state: bool = False):
    """Restore from an orbax directory or a pickle file. Model/optimizer/
    normalizer state always restores; env state only on request (resuming
    rollouts mid-episode is rarely desirable across config changes)."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
      import orbax.checkpoint as ocp
      template = {
          'params': self.ts.params,
          'opt_state': self.ts.opt_state,
          'actor_norm': self.ts.actor_norm,
          'critic_norm': self.ts.critic_norm,
          'lr': self.ts.lr,
          'rng': self.ts.rng,
          'iteration': self.ts.iteration,
          'env_state': self.ts.env_state,
          'obs': self.ts.obs,
      }
      # Probe the checkpoint's structure for env_state instead of
      # retrying on any failure: a genuine restore error (corrupt file,
      # shape mismatch after a config change) should surface as itself.
      ckptr = ocp.PyTreeCheckpointer()
      md = ckptr.metadata(path)
      # orbax returns StepMetadata (newer) or a plain tree (older)
      tree = getattr(getattr(md, 'item_metadata', md), 'tree', md)
      saved_keys = set(tree.keys())
      if 'env_state' not in saved_keys or not load_env_state:
        # checkpoint lacks env state, or the caller doesn't want it:
        # restore only the learner subtree. partial_restore also decouples
        # us from the saved env_state's structure (e.g. pre-forensics
        # checkpoints vs an env built with MJLAB_BLOWUP_DUMP on).
        template.pop('env_state', None)
        template.pop('obs', None)
        # slim deployment checkpoints (tools/slim_checkpoint.py, the
        # shipped asset_zoo/pretrained artifact) carry params+normalizers
        # only — drop template keys the file doesn't have; the updates
        # dict below already guards each optional key.
        for k in list(template):
          if k not in saved_keys:
            template.pop(k)
        payload = ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item=template,
            partial_restore=bool(saved_keys - set(template))))
      else:
        # env-state restore: the forensic ring is never checkpointed
        # (see save()), so restore with an empty ring in the template
        # (partial, to tolerate pre-forensics checkpoints that lack the
        # key entirely) and graft the live ring back afterwards.
        live_ring = getattr(self.ts.env_state, 'forensic', {})
        if hasattr(self.ts.env_state, 'forensic'):
          template['env_state'] = self.ts.env_state.replace(forensic={})
        payload = ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item=template, partial_restore=True))
        if live_ring:
          payload['env_state'] = payload['env_state'].replace(
              forensic=live_ring)
    else:
      import pickle
      with open(path, 'rb') as f:
        payload = pickle.load(f)
    updates = dict(
        params=payload['params'],
        actor_norm=payload['actor_norm'],
        critic_norm=payload['critic_norm'])
    if 'opt_state' in payload:
      updates['opt_state'] = payload['opt_state']
    if 'lr' in payload:
      updates['lr'] = jnp_asarray_like(payload['lr'], self.ts.lr)
    if 'iteration' in payload:
      updates['iteration'] = jnp_asarray_like(payload['iteration'],
                                              self.ts.iteration)
    if load_env_state and 'env_state' in payload and \
        payload['env_state'] is not None:
      updates['env_state'] = payload['env_state']
      if payload.get('obs') is not None:
        updates['obs'] = payload['obs']
    self.ts = self.ts.replace(**updates)
    return payload

  def get_inference_policy(self):
    return self.alg.policy_fn(self.ts)


class VelocityOnPolicyRunner(OnPolicyRunner):
  """Velocity-task runner: every checkpoint save also exports a
  deployment ONNX with sim-to-real metadata (reference
  src/mjlab/tasks/velocity/rl/runner.py:13-38)."""

  def save(self, path: str):
    super().save(path)
    try:
      from mjlab_tpu.rl.exporter import export_policy_as_onnx
      export_policy_as_onnx(
          jax.device_get(self.ts.params),
          jax.device_get(self.ts.actor_norm), self.env,
          os.path.splitext(path)[0] + '.onnx',
          activation=self.cfg.policy.activation)
    except Exception as e:  # export must never kill training
      print(f'[export] onnx export failed: {e!r}')


class MotionTrackingOnPolicyRunner(OnPolicyRunner):
  """Tracking-task runner: ONNX export bakes the motion library into the
  graph indexed by time_step (reference
  src/mjlab/tasks/tracking/rl/runner.py + rl/exporter.py:28-80)."""

  def save(self, path: str):
    super().save(path)
    try:
      from mjlab_tpu.rl.exporter import export_motion_policy_as_onnx
      motion = None
      for term in self.env.command_manager.terms.values():
        motion = getattr(term, 'motion', None)
        if motion is not None:
          break
      if motion is None:
        raise RuntimeError('no motion command term found')
      export_motion_policy_as_onnx(
          jax.device_get(self.ts.params),
          jax.device_get(self.ts.actor_norm), self.env, motion,
          os.path.splitext(path)[0] + '.onnx',
          activation=self.cfg.policy.activation)
    except Exception as e:
      print(f'[export] onnx export failed: {e!r}')


def make_runner(env, cfg, log_dir=None, step_fn=None) -> OnPolicyRunner:
  """Pick the task-appropriate runner (reference train.py:94-99)."""
  has_motion = any(
      getattr(t, 'motion', None) is not None
      for t in env.command_manager.terms.values())
  cls = MotionTrackingOnPolicyRunner if has_motion else VelocityOnPolicyRunner
  return cls(env, cfg, log_dir=log_dir, step_fn=step_fn)


def get_checkpoint_path(log_root: str, run_regex: str = '.*',
                        ckpt_regex: str = 'model_.*.ckpt') -> str:
  """Find newest matching checkpoint (reference src/mjlab/utils/os.py:52-85)."""
  runs = sorted(
      (d for d in os.listdir(log_root)
       if re.fullmatch(run_regex, d)
       and os.path.isdir(os.path.join(log_root, d))),
      key=lambda d: os.path.getmtime(os.path.join(log_root, d)))
  if not runs:
    raise FileNotFoundError(f'no runs matching {run_regex} in {log_root}')
  run_dir = os.path.join(log_root, runs[-1])
  ckpts = sorted(
      (f for f in os.listdir(run_dir) if re.fullmatch(ckpt_regex, f)),
      key=lambda f: os.path.getmtime(os.path.join(run_dir, f)))
  if not ckpts:
    raise FileNotFoundError(f'no checkpoints in {run_dir}')
  return os.path.join(run_dir, ckpts[-1])
