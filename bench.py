"""Headline benchmark: env-steps/s/chip on the Unitree G1 velocity task.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
An env-step is one control step (decimation=4 physics substeps at 200 Hz)
of one environment, i.e. the same unit the reference's 4096-env training
throughput is quoted in (BASELINE.md). The reference publishes no
quantitative number, so vs_baseline is null.

Env knobs: MJLAB_BENCH_ENVS (default 4096), MJLAB_BENCH_STEPS (default 64),
MJLAB_BENCH_TASK (default Mjlab-Velocity-Flat-Unitree-G1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

try:
  jax.config.update('jax_compilation_cache_dir',
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 '.jax_cache'))
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
except Exception:
  pass


def main():
  num_envs = int(os.environ.get('MJLAB_BENCH_ENVS', 4096))
  n_steps = int(os.environ.get('MJLAB_BENCH_STEPS', 64))
  task = os.environ.get('MJLAB_BENCH_TASK', 'Mjlab-Velocity-Flat-Unitree-G1')

  from mjlab_tpu.tasks import registry

  cfg = registry.load_cfg(task)
  cfg.scene.num_envs = num_envs
  env = registry.make(task, cfg=cfg)
  state, obs = env.init_state(0)

  step = jax.jit(env.step_fn, donate_argnums=(0,))
  key = jax.random.PRNGKey(0)
  action = 0.5 * jax.random.normal(key, (num_envs, env.action_dim))

  # warmup / compile
  state, out = step(state, action)
  jax.block_until_ready(out[1])

  t0 = time.perf_counter()
  for _ in range(n_steps):
    state, out = step(state, action)
  jax.block_until_ready(out[1])
  dt = time.perf_counter() - t0

  steps_per_s = num_envs * n_steps / dt
  n_chips = jax.device_count()
  result = {
      'metric': f'env_steps_per_s_per_chip_{task}_{num_envs}envs',
      'value': round(steps_per_s / n_chips, 1),
      'unit': 'env-steps/s/chip',
      'vs_baseline': None,
  }
  print(json.dumps(result))


if __name__ == '__main__':
  main()
