"""Real multi-controller (multi-host) validation on CPU.

Spawns TWO separate processes, each with 4 virtual CPU devices, stitched
into one 8-device world via jax.distributed — the exact code path a TPU
pod slice uses (docs/multihost.md): enable_sharding builds the global
mesh, the PPO iteration's gradient reductions become cross-process
collectives (Gloo here, ICI/DCN on a pod). Asserts both controllers
compute identical results. The single-process 8-device tests
(test_sharding.py) cannot cover process-boundary semantics: global
device ordering, cross-process collectives, per-process addressable
shards."""

import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, 'tests', '_multihost_proc.py')


def test_two_process_ppo_iteration_agrees():
  port = 12901
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  procs = [
      subprocess.Popen(
          [sys.executable, _SCRIPT, str(i), '2', str(port)],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          cwd=_REPO, env=env)
      for i in range(2)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=900)
      outs.append(out)
      assert p.returncode == 0, out[-2000:]
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
  results = []
  for out in outs:
    m = re.search(r'RESULT loss=([-\d.]+) reward=([-\d.]+)', out)
    assert m, out[-2000:]
    results.append((m.group(1), m.group(2)))
  assert results[0] == results[1], results
