"""Native interactive viewer: policy-in-the-loop GUI via
mujoco.viewer.launch_passive (reference src/mjlab/viewer/native.py).

The selected env's (qpos, qvel) is copied from the device batch to a CPU
MjData each frame and mj_forward'ed for display; interactive perturbations
are written back as external wrenches. Requires a display."""

from __future__ import annotations

import time

import numpy as np


def run_viewer(env, policy, env_index: int = 0, fps: float = 50.0):
  import jax.numpy as jnp
  import mujoco
  import mujoco.viewer

  mj = env.scene.mj_model
  md = mujoco.MjData(mj)
  obs, _ = env.reset()

  with mujoco.viewer.launch_passive(mj, md) as viewer:
    while viewer.is_running():
      t0 = time.time()
      action = policy(obs)
      obs, *_ = env.step(action)
      qpos = np.asarray(env.state.data.qpos[env_index])
      qvel = np.asarray(env.state.data.qvel[env_index])
      md.qpos[:] = qpos
      md.qvel[:] = qvel
      mujoco.mj_forward(mj, md)
      viewer.sync()
      # apply GUI perturbation forces back into the sim
      if md.xfrc_applied.any():
        xfrc = jnp.asarray(md.xfrc_applied)
        data = env.state.data
        env._state = env.state.replace(
            data=data.replace(
                xfrc_applied=data.xfrc_applied.at[env_index].set(xfrc)))
      dt = time.time() - t0
      if dt < 1.0 / fps:
        time.sleep(1.0 / fps - dt)
