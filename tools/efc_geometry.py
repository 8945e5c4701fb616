"""Print per-task constraint/compaction geometry (VERDICT r2 weak #2).

For each task: candidate contact pairs, frictional/frictionless pool sizes,
selected caps (K3/K1), dense efc row counts by block, and nv — the numbers
that set the Newton solve cost. Run with MJLAB_PLATFORM=cpu.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('MJLAB_PLATFORM', 'cpu')

import numpy as np


def describe(task):
  from mjlab_tpu.physics import io as pio
  from mjlab_tpu.physics.constraint import compaction_slot_pools
  from mjlab_tpu.tasks import registry

  cfg = registry.load_cfg(task)
  cfg.scene.num_envs = 4
  env = registry.make(task, cfg=cfg)
  stat = env.model.stat
  sl3, sl1 = compaction_slot_pools(stat)
  k3, k1 = stat.ncon_cap, stat.ncon_cap1
  dims = np.asarray(stat.con_dim[:stat.pairs.ncon_max])
  maxdim = int(dims.max()) if dims.size else 0
  out = {
      'task': task,
      'nv': int(stat.nv),
      'candidate_pairs': int(stat.pairs.ncon_max),
      'pool_frictional': len(sl3),
      'pool_frictionless': len(sl1),
      'K3': int(k3), 'K1': int(k1),
      'maxdim': maxdim,
      'nefc_total': int(pio.nefc_max(stat)),
  }
  if k3 or k1:
    out['contact_rows'] = k3 * 2 * (maxdim - 1) + k1
  else:
    out['contact_rows'] = int(sum(2 * (d - 1) if d > 1 else 1 for d in dims))
  return out


if __name__ == '__main__':
  import json
  for t in ('Mjlab-Velocity-Flat-Unitree-G1', 'Mjlab-Tracking-Flat-Unitree-G1'):
    print(json.dumps(describe(t)))
