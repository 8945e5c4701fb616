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
jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                           num_processes=nproc, process_id=pid)
print(f'[p{pid}] local={jax.local_device_count()} '
      f'global={jax.device_count()}', flush=True)
assert jax.device_count() == 4 * nproc

import jax.numpy as jnp

from mjlab_tpu.parallel.sharding import enable_sharding
from mjlab_tpu.rl.ppo import PPO
from mjlab_tpu.tasks import registry

NUM_ENVS = 16
cfg = registry.load_cfg('Mjlab-Velocity-Flat-Unitree-Go1')
cfg.scene.num_envs = NUM_ENVS
env = registry.make('Mjlab-Velocity-Flat-Unitree-Go1', cfg=cfg)
rl = registry.load_cfg('Mjlab-Velocity-Flat-Unitree-Go1',
                       'rl_cfg_entry_point')
rl.num_steps_per_env = 4
rl.save_interval = 0
alg = PPO(env, rl)
ts = alg.init_state(0)
mesh, ts, restore = enable_sharding(ts, NUM_ENVS, 4 * nproc)
try:
  ts, logs = alg.learn_iteration(ts)
  loss = float(jnp.asarray(logs['loss']))
  rew = float(jnp.asarray(logs['mean_reward']))
finally:
  restore.__exit__(None, None, None)
print(f'[p{pid}] RESULT loss={loss:.6f} reward={rew:.6f}', flush=True)
jax.distributed.shutdown()
