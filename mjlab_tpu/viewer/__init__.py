"""Viewer stack (capability mirror of reference src/mjlab/viewer/):
BaseViewer playback engine, native GUI, optional viser web front end,
offscreen renderer, debug visualizer protocol."""

from mjlab_tpu.viewer.base import BaseViewer, EnvProtocol, PolicyProtocol
from mjlab_tpu.viewer.debug_visualizer import (
    DebugVisualizer,
    MujocoSceneVisualizer,
    NullVisualizer,
)
from mjlab_tpu.viewer.native import NativeMujocoViewer, run_viewer
from mjlab_tpu.viewer.offscreen import render_trajectory

__all__ = [
    'BaseViewer',
    'DebugVisualizer',
    'EnvProtocol',
    'MujocoSceneVisualizer',
    'NativeMujocoViewer',
    'NullVisualizer',
    'PolicyProtocol',
    'render_trajectory',
    'run_viewer',
]
