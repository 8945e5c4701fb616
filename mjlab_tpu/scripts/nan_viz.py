"""Replay a NanGuard dump (capability mirror of reference
src/mjlab/scripts/nan_viz.py, which scrubs dumped physics snapshots in a
viewer). Loads nan_dump_*.npz + model.mjb, steps through the recorded
history on CPU MuJoCo, and either launches the native viewer (when a
display is available) or prints a per-step finiteness report.

Usage: python -m mjlab_tpu.scripts.nan_viz <dump.npz> [--model model.mjb]
       [--env-index 0] [--fps 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('dump', help='nan_dump_*.npz from NanGuard')
  p.add_argument('--model', default=None,
                 help='model.mjb (default: sibling of the dump)')
  p.add_argument('--env-index', type=int, default=0,
                 help='which dumped env to replay')
  p.add_argument('--fps', type=float, default=10.0)
  args = p.parse_args(argv)

  blob = np.load(args.dump)
  qpos = blob['qpos']  # (T, E, nq)
  qvel = blob['qvel']
  steps = blob['steps']
  bad_ids = blob['bad_env_ids']
  e = args.env_index
  print(f'dump: {qpos.shape[0]} steps, envs {bad_ids.tolist()} '
        f'(replaying slot {e} = env {bad_ids[e]})')

  for t in range(qpos.shape[0]):
    nq_bad = int(np.sum(~np.isfinite(qpos[t, e])))
    nv_bad = int(np.sum(~np.isfinite(qvel[t, e])))
    marker = ' <-- non-finite' if (nq_bad or nv_bad) else ''
    print(f'  step {int(steps[t])}: qpos nan/inf={nq_bad} '
          f'qvel nan/inf={nv_bad}{marker}')

  model_path = args.model or os.path.join(
      os.path.dirname(os.path.abspath(args.dump)), 'model.mjb')
  if not os.path.exists(model_path):
    print(f'no model at {model_path}; headless report only')
    return
  import mujoco
  m = mujoco.MjModel.from_binary_path(model_path)
  d = mujoco.MjData(m)
  if not os.environ.get('DISPLAY'):
    print('no $DISPLAY; headless report only')
    return
  import time as _time
  import mujoco.viewer
  with mujoco.viewer.launch_passive(m, d) as viewer:
    t = 0
    while viewer.is_running():
      frame = qpos[t % qpos.shape[0], e]
      d.qpos[:] = np.nan_to_num(frame)
      mujoco.mj_forward(m, d)
      viewer.sync()
      _time.sleep(1.0 / args.fps)
      t += 1


if __name__ == '__main__':
  main()
