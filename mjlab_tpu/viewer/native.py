"""Native interactive viewer: policy-in-the-loop GUI via
mujoco.viewer.launch_passive (reference src/mjlab/viewer/native.py +
keys.py keyboard bindings).

The selected env's (qpos, qvel) is copied from the device batch to a CPU
MjData each frame and mj_forward'ed for display; interactive perturbations
are written back as external wrenches on the selected env. Requires a
display.

Keys: Space pause | ]/[ env next/prev | +/- speed | Backspace reset."""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.base import BaseViewer


class NativeMujocoViewer(BaseViewer):

  def setup(self):
    import mujoco
    import mujoco.viewer
    from mjlab_tpu.viewer.debug_visualizer import MujocoSceneVisualizer
    self._mujoco = mujoco
    self.mj = self.env.scene.mj_model
    self.md = mujoco.MjData(self.mj)
    self.viewer = mujoco.viewer.launch_passive(
        self.mj, self.md, key_callback=self._on_key)
    self.debug_vis = MujocoSceneVisualizer(self.viewer.user_scn, self.mj)

  def _on_key(self, keycode: int):
    key = chr(keycode) if 0 <= keycode < 0x110000 else ''
    if key == ' ':
      self.toggle_pause()
    elif key == ']':
      self.next_env()
    elif key == '[':
      self.prev_env()
    elif key in ('+', '='):
      self.speed_up()
    elif key == '-':
      self.speed_down()
    elif keycode == 259:  # backspace
      self.request_reset()

  def is_running(self) -> bool:
    return self._running and self.viewer.is_running()

  def sync_env_to_viewer(self):
    e = self.env_index
    self.md.qpos[:] = np.asarray(self.env.state.data.qpos[e])
    self.md.qvel[:] = np.asarray(self.env.state.data.qvel[e])
    self._mujoco.mj_forward(self.mj, self.md)
    self._draw_debug()
    self.viewer.sync()

  def _draw_debug(self):
    """Command-term debug visualization (velocity arrows, motion ghosts —
    reference velocity_command.py:106-176, commands.py:400-416)."""
    self.debug_vis.clear()
    mgr = getattr(self.env, 'command_manager', None)
    if mgr is None:
      return
    for name, term in mgr.terms.items():
      fn = getattr(term, 'debug_vis', None)
      if fn is None:
        continue
      try:
        fn(self.env.state.command[name], self.env, self.env_index,
           self.debug_vis)
      except Exception as exc:
        print(f'[viewer] debug_vis({name}) failed: {exc!r}')

  def sync_viewer_to_env(self):
    # GUI perturbation forces -> xfrc_applied on the selected env
    # (reference native.py:191-199)
    if self.md.xfrc_applied.any():
      import jax.numpy as jnp
      e = self.env_index
      data = self.env.state.data
      self.env._state = self.env.state.replace(
          data=data.replace(
              xfrc_applied=data.xfrc_applied.at[e].set(
                  jnp.asarray(self.md.xfrc_applied))))

  def teardown(self):
    self.viewer.close()


def run_viewer(env, policy, env_index: int = 0, fps: float = 50.0):
  NativeMujocoViewer(env, policy, env_index=env_index, fps=fps).run()
