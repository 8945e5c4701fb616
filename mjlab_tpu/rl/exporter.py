"""Policy deployment export: ONNX with embedded sim-to-real metadata.

Capability mirror of reference src/mjlab/tasks/velocity/rl/exporter.py
(+ third_party isaaclab_rl exporter base) and
src/mjlab/tasks/tracking/rl/exporter.py (which bakes the whole motion
library into the ONNX graph indexed by a time_step input).

The flax policy params serialize through the framework's own ONNX
protobuf writer (rl/onnx_writer.py) — the environment ships neither the
`onnx` package nor a torch exporter path that works without it. The
empirical observation normalization is folded into the graph
(obs -> Sub(mean) -> Div(std) -> MLP). Metadata (joint names, stiffness,
damping, default pose, action scale) goes into ONNX metadata_props AND a
`<path>.meta.json` sidecar.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from mjlab_tpu.rl import onnx_writer


def _flax_mlp_layers(params: dict, module: str):
  """Ordered [(w, b), ...] from a flax MLP param subtree (Dense_i)."""
  p = params['params'] if 'params' in params else params
  sub = p[module]
  layers = []
  for i in range(len(sub)):
    key = f'Dense_{i}'
    if key not in sub:
      break
    w = np.asarray(sub[key]['kernel'])  # (in, out)
    b = np.asarray(sub[key]['bias'])
    layers.append((w, b))
  return layers


def policy_metadata(env, action_term: str = 'joint_pos') -> dict:
  """Sim-to-real metadata from the env (reference
  velocity/rl/exporter.py:36-67 attach_onnx_metadata)."""
  term = env.action_manager.terms[action_term]
  view = term.view
  return {
      'joint_names': list(term.joint_names),
      'joint_stiffness': np.asarray(view.joint_stiffness)[
          term.joint_ids].tolist(),
      'joint_damping': np.asarray(view.joint_damping)[
          term.joint_ids].tolist(),
      'default_joint_pos': np.asarray(view.default_joint_pos)[
          term.joint_ids].tolist(),
      'action_scale': np.asarray(term.scale).tolist(),
      'action_offset': np.asarray(term.offset).tolist(),
  }


def _gather_metadata(env, metadata) -> dict:
  meta = dict(metadata or {})
  if env is not None:
    try:
      meta.update(policy_metadata(env))
    except Exception as e:  # metadata is best-effort
      meta['metadata_error'] = repr(e)
  return meta


def _write_sidecar(path: str, meta: dict) -> None:
  with open(path + '.meta.json', 'w') as f:
    json.dump(meta, f, indent=2)


def export_policy_as_onnx(params: Any, normalizer, env, path: str,
                          activation: str = 'elu',
                          metadata: 'dict | None' = None) -> str:
  """Export the actor MLP (+ empirical obs normalization folded into the
  graph) as ONNX: input `obs` (batch, obs_dim) -> `actions`."""
  layers = _flax_mlp_layers(params, 'actor')
  mean = np.asarray(normalizer.mean, np.float32)
  std = (np.sqrt(np.asarray(normalizer.var)) + 1e-2).astype(np.float32)
  meta = _gather_metadata(env, metadata)
  onnx_writer.write_mlp_policy(path, layers, mean, std, activation, meta)
  _write_sidecar(path, meta)
  return path


def export_motion_policy_as_onnx(params: Any, normalizer, env, motion,
                                 path: str, activation: str = 'elu',
                                 metadata: 'dict | None' = None) -> str:
  """Tracking-task export: bakes the motion library into the graph
  (reference tracking/rl/exporter.py:28-80). Inputs: `obs`,
  `time_step` (int64). Outputs: `actions` + motion-frame targets
  (joint_pos/joint_vel/anchor pose) gathered at time_step."""
  layers = _flax_mlp_layers(params, 'actor')
  mean = np.asarray(normalizer.mean, np.float32)
  std = (np.sqrt(np.asarray(normalizer.var)) + 1e-2).astype(np.float32)
  motion_arrays = {
      'joint_pos': np.asarray(motion.joint_pos, np.float32),
      'joint_vel': np.asarray(motion.joint_vel, np.float32),
      'anchor_pos_w': np.asarray(motion.body_pos_w[:, 0], np.float32),
      'anchor_quat_w': np.asarray(motion.body_quat_w[:, 0], np.float32),
  }
  meta = _gather_metadata(env, metadata)
  onnx_writer.write_motion_policy(path, layers, mean, std, motion_arrays,
                                  activation, meta)
  _write_sidecar(path, meta)
  return path
