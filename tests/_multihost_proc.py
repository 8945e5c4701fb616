"""One process of a 2-process multi-controller CPU test.

Usage: python scratch/multihost_proc.py <process_id> <num_processes> <port>
Each process gets 4 virtual CPU devices; jax.distributed stitches them
into one 8-device world — the same code path a real TPU pod slice uses.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
os.environ['XLA_FLAGS'] = (
    flags + ' --xla_force_host_platform_device_count=4').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
# persistent compile cache: without it every test run recompiles the
# full sharded PPO program in both processes (~5 min each run)
from mjlab_tpu.utils.cache import cpu_cache_dir  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  cpu_cache_dir(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__)))))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                           num_processes=nproc, process_id=pid)
print(f'[p{pid}] local={jax.local_device_count()} '
      f'global={jax.device_count()}', flush=True)
assert jax.device_count() == 4 * nproc

def barrier(name: str, timeout_ms: int = 900_000) -> None:
  """Coordination-service barrier (pure RPC, no Gloo). Gloo context
  initialization has a hard 30 s GetKeyValue deadline per communicator,
  and on this single-core host the two processes can drift minutes apart
  during env build/compile — so every phase that ends in a collective is
  preceded by a long-timeout barrier to re-synchronize."""
  from jax._src import distributed as _dist
  _dist.global_state.client.wait_at_barrier(name, timeout_ms)

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.parallel.sharding import enable_sharding
from mjlab_tpu.rl.ppo import PPO
from mjlab_tpu.tasks import registry

import mjlab_tpu.tasks.velocity.config.tiny  # noqa: E402 (registers task)

NUM_ENVS = 16
cfg = registry.load_cfg('Mjlab-Velocity-Flat-Tiny')
cfg.scene.num_envs = NUM_ENVS
env = registry.make('Mjlab-Velocity-Flat-Tiny', cfg=cfg)
rl = registry.load_cfg('Mjlab-Velocity-Flat-Tiny',
                       'rl_cfg_entry_point')
rl.num_steps_per_env = 4
rl.save_interval = 0
alg = PPO(env, rl)
ts = alg.init_state(0)
# enable_sharding runs a cross-process assert_equal collective; with a
# warm compile cache the processes arrive minutes apart without this
barrier('pre-shard')
mesh, ts, restore = enable_sharding(ts, NUM_ENVS, 4 * nproc)
try:
  # compile first (each process may hit/miss the persistent cache at
  # very different times), then re-synchronize before executing the
  # program whose collectives carry the 30 s Gloo init deadline
  compiled = jax.jit(alg.learn_iteration).lower(ts).compile()
  barrier('pre-exec')
  ts, logs = compiled(ts)

  # read the LOCAL shard of the replicated scalars: jnp.asarray on a
  # global (non-fully-addressable) array is itself a cross-process
  # allgather with a 30s Gloo deadline — pointless for replicated
  # values, and flaky on a single-core host
  def local_scalar(x):
    return float(np.asarray(x.addressable_shards[0].data))

  loss = local_scalar(logs['loss'])
  rew = local_scalar(logs['mean_reward'])
finally:
  restore.__exit__(None, None, None)
print(f'[p{pid}] RESULT loss={loss:.6f} reward={rew:.6f}', flush=True)
barrier('pre-shutdown')
jax.distributed.shutdown()
