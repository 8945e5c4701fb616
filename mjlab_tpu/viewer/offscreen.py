"""Offscreen rendering of device trajectories via CPU MuJoCo.

TPU analog of the reference's OffscreenRenderer (reference
src/mjlab/viewer/offscreen_renderer.py): the batched device state never
needs a renderer - qpos trajectories are copied to a CPU MjData and
rendered with mujoco.Renderer. Degrades gracefully when no GL runtime is
available (headless containers)."""

from __future__ import annotations

import numpy as np


def render_trajectory(env, qpos_traj: np.ndarray, path: str,
                      height: int = 480, width: int = 640,
                      camera: str | int = -1, fps: int | None = None):
  """qpos_traj: (T, nq) single-env trajectory -> mp4/gif via imageio or
  raw .npy fallback when no video backend exists."""
  import mujoco
  mj = env.scene.mj_model
  md = mujoco.MjData(mj)
  frames = []
  try:
    renderer = mujoco.Renderer(mj, height=height, width=width)
  except Exception as e:  # no GL context available
    np.save(path + '.qpos.npy', qpos_traj)
    print(f'[viewer] no GL renderer available ({e}); dumped qpos '
          f'trajectory to {path}.qpos.npy')
    return
  for qpos in qpos_traj:
    md.qpos[:] = qpos
    mujoco.mj_forward(mj, md)
    renderer.update_scene(md, camera=camera)
    frames.append(renderer.render().copy())
  renderer.close()
  fps = fps or int(round(1.0 / env.step_dt))
  try:
    import imageio
    imageio.mimsave(path, frames, fps=fps)
  except ImportError:
    np.save(path + '.frames.npy', np.stack(frames))
    print(f'[viewer] imageio unavailable; dumped raw frames to '
          f'{path}.frames.npy')
