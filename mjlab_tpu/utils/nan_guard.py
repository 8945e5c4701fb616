"""NaN guard: detect non-finite physics state and dump a replayable
snapshot (capability mirror of reference src/mjlab/utils/nan_guard.py +
scripts/nan_viz.py).

The reference keeps a host-visible deque of GPU state snapshots and syncs
a NaN mask to the host after every step. Under XLA the check runs inside
the jitted step (a cheap fused reduction) and only fires a host callback
when something is actually non-finite, so the steady-state cost is ~zero
and there is no per-step host sync. The dump contains a rolling history
of the last `history` control steps for up to `max_envs` offending envs
plus the compiled model (.mjb) so `mjlab-viz-nan` can replay it on CPU
MuJoCo.
"""

from __future__ import annotations

import os
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np


class NanGuard:
  """Wraps an env step_fn. Usage:

    guard = NanGuard(env, out_dir='nan_dumps')
    step_fn = guard.wrap(env.step_fn)

  On the first step where any env's qpos/qvel/qacc goes non-finite, dumps
  `nan_dump_<t>.npz` with the recent state history and `model.mjb`.
  """

  def __init__(self, env, out_dir: str = 'nan_dumps', history: int = 25,
               max_envs: int = 5):
    self.env = env
    self.out_dir = out_dir
    self.history = history
    self.max_envs = max_envs
    self._ring: deque = deque(maxlen=history)
    self._fired = False

  # -- host side ------------------------------------------------------
  def _record(self, qpos, qvel, qacc, t, step):
    self._ring.append(dict(qpos=np.asarray(qpos), qvel=np.asarray(qvel),
                           qacc=np.asarray(qacc), time=np.asarray(t),
                           step=int(step)))

  def _dump(self, bad_mask, qpos, qvel, qacc, t, step):
    self._record(qpos, qvel, qacc, t, step)
    if self._fired:  # one-shot, like the reference (nan_guard.py)
      return
    self._fired = True
    bad_ids = np.nonzero(np.asarray(bad_mask))[0][:self.max_envs]
    os.makedirs(self.out_dir, exist_ok=True)
    stamp = time.strftime('%Y%m%d_%H%M%S')
    path = os.path.join(self.out_dir, f'nan_dump_{stamp}.npz')
    hist = list(self._ring)
    np.savez(
        path,
        bad_env_ids=bad_ids,
        steps=np.array([h['step'] for h in hist]),
        qpos=np.stack([h['qpos'][bad_ids] for h in hist]),
        qvel=np.stack([h['qvel'][bad_ids] for h in hist]),
        qacc=np.stack([h['qacc'][bad_ids] for h in hist]),
        time=np.stack([h['time'][bad_ids] for h in hist]),
    )
    mj_model = getattr(getattr(self.env, 'scene', None), 'mj_model', None)
    if mj_model is not None:
      import mujoco
      mujoco.mj_saveModel(mj_model, os.path.join(self.out_dir, 'model.mjb'))
    print(f'[NanGuard] non-finite state in envs {bad_ids.tolist()}; '
          f'dumped {len(hist)}-step history to {path}')

  # -- traced side ----------------------------------------------------
  def wrap(self, step_fn, record_history: bool = False):
    """record_history=False (default): zero steady-state cost — the host
    callback only fires (inside lax.cond) when a non-finite value
    appears, dumping just the offending step. record_history=True: every
    step is mirrored to a host ring buffer (device->host transfer per
    step — debug mode, the cost profile of the reference's deque)."""

    def guarded(state, action):
      state, out = step_fn(state, action)
      d = state.data
      bad = (jnp.any(~jnp.isfinite(d.qpos), axis=-1) |
             jnp.any(~jnp.isfinite(d.qvel), axis=-1) |
             jnp.any(~jnp.isfinite(d.qacc), axis=-1))
      args = (bad, d.qpos, d.qvel, d.qacc, d.time, state.common_step)
      if record_history:
        jax.debug.callback(self._on_step, *args, ordered=False)
      else:
        jax.lax.cond(
            jnp.any(bad),
            lambda a: jax.debug.callback(self._on_step, *a, ordered=False),
            lambda a: None, args)
      return state, out

    return guarded

  def _on_step(self, bad, qpos, qvel, qacc, t, step):
    if bool(np.any(np.asarray(bad))):
      self._dump(bad, qpos, qvel, qacc, t, step)
    else:
      self._record(qpos, qvel, qacc, t, step)
