"""Offscreen rendering of device trajectories via CPU MuJoCo.

TPU analog of the reference's OffscreenRenderer (reference
src/mjlab/viewer/offscreen_renderer.py): the batched device state never
needs a renderer - qpos trajectories are copied to a CPU MjData and
rendered with mujoco.Renderer. Supports multi-env side-by-side tiling
and model-camera selection (reference ViewerConfig origin/camera knobs,
reference src/mjlab/viewer/viewer_config.py:5-29). Degrades gracefully
when no GL runtime is available (headless containers)."""

from __future__ import annotations

import numpy as np


def render_trajectory(env, qpos_traj: np.ndarray, path: str,
                      height: int = 480, width: int = 640,
                      camera: 'str | int' = -1, fps: 'int | None' = None):
  """qpos_traj: (T, nq) single-env or (T, tile, nq) multi-env trajectory
  -> mp4/gif via imageio (tiled horizontally) or raw .npy fallback when
  no video backend exists."""
  import mujoco
  mj = env.scene.mj_model
  md = mujoco.MjData(mj)
  if qpos_traj.ndim == 2:
    qpos_traj = qpos_traj[:, None, :]
  tile = qpos_traj.shape[1]
  frames = []
  try:
    renderer = mujoco.Renderer(mj, height=height, width=width)
  except Exception as e:  # no GL context available
    np.save(path + '.qpos.npy', qpos_traj)
    print(f'[viewer] no GL renderer available ({e}); dumped qpos '
          f'trajectory to {path}.qpos.npy')
    return
  for step_qpos in qpos_traj:
    row = []
    for e in range(tile):
      md.qpos[:] = step_qpos[e]
      mujoco.mj_forward(mj, md)
      renderer.update_scene(md, camera=camera)
      row.append(renderer.render().copy())
    frames.append(np.concatenate(row, axis=1) if tile > 1 else row[0])
  renderer.close()
  fps = fps or int(round(1.0 / env.step_dt))
  try:
    import imageio
    imageio.mimsave(path, frames, fps=fps)
  except ImportError:
    np.save(path + '.frames.npy', np.stack(frames))
    print(f'[viewer] imageio unavailable; dumped raw frames to '
          f'{path}.frames.npy')
