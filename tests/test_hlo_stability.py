"""Cross-process program-stability regression.

The full env step must lower to bit-identical StableHLO regardless of
PYTHONHASHSEED: term order defines the observation layout (a trained
policy's input contract) and the persistent compile-cache key. A
hash-ordered set in term discovery once broke both — this test catches
any reintroduction of hash-ordered iteration anywhere in the env stack
by lowering (not compiling) the step in two subprocesses with different
hash seeds."""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import hashlib
import jax.numpy as jnp
import mjlab_tpu.tasks.velocity.config.tiny  # registers the tiny task
from mjlab_tpu.tasks import registry
cfg = registry.load_cfg('Mjlab-Velocity-Flat-Tiny')
cfg.scene.num_envs = 2
env = registry.make('Mjlab-Velocity-Flat-Tiny', cfg=cfg)
state, _ = env.init_state(0)
a = jnp.zeros((2, env.action_dim))
txt = jax.jit(env._step_fn).lower(state, a).as_text()
print('HLOHASH', hashlib.sha256(txt.encode()).hexdigest())
"""


def test_step_hlo_is_hash_seed_invariant():
  hashes = []
  for seed in ('0', '1'):
    env = dict(os.environ, PYTHONHASHSEED=seed)
    env.pop('XLA_FLAGS', None)  # parent's 8-device flag not needed
    out = subprocess.run(
        [sys.executable, '-c', _SCRIPT], env=env, capture_output=True,
        text=True, timeout=600, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith('HLOHASH')]
    assert line, out.stdout[-2000:]
    hashes.append(line[0].split()[1])
  assert hashes[0] == hashes[1], (
      'env step lowering depends on PYTHONHASHSEED — some hash-ordered '
      'iteration (set/dict-over-set) re-entered the manager/env stack')
