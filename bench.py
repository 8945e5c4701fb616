"""Headline benchmark: env-steps/s/chip on the Unitree G1 velocity task.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
An env-step is one control step (decimation=4 physics substeps at 200 Hz)
of one environment, i.e. the same unit the reference's 4096-env training
throughput is quoted in (BASELINE.md). The reference publishes no
quantitative number, so vs_baseline is null.

Robustness: the axon TPU tunnel can wedge (see BASELINE.md round-2 note) —
a wedged backend makes every client queue forever at ~0 CPU rather than
raise. So before attaching, a SUBPROCESS probe (bounded wall-clock, one
retry) checks the backend is alive; on persistent unavailability we emit
{"value": null, "error": "tpu-unavailable"} with rc=0 so the driver can
distinguish an outage from a perf regression. A watchdog thread bounds the
main run the same way (first compile after a model change can take ~10 min
on the remote-compile tunnel, so the bound is generous).

Env knobs: MJLAB_BENCH_ENVS (default 4096), MJLAB_BENCH_STEPS (default 64),
MJLAB_BENCH_TASK (default Mjlab-Velocity-Flat-Unitree-G1),
MJLAB_BENCH_PROBE_TIMEOUT (s, default 300), MJLAB_BENCH_WATCHDOG (s,
default 2400).
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_PROBE_CODE = """
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).sum().block_until_ready()
print("probe-ok", jax.devices()[0].platform)
"""


def _metric_name():
  task = os.environ.get('MJLAB_BENCH_TASK', 'Mjlab-Velocity-Flat-Unitree-G1')
  num_envs = int(os.environ.get('MJLAB_BENCH_ENVS', 4096))
  return f'env_steps_per_s_per_chip_{task}_{num_envs}envs'


def _emit_unavailable(detail):
  print(json.dumps({
      'metric': _metric_name(),
      'value': None,
      'unit': 'env-steps/s/chip',
      'vs_baseline': None,
      'error': 'tpu-unavailable',
      'detail': detail[:300],
  }), flush=True)


def _backend_alive(timeout_s):
  """Probe the backend in a subprocess so a wedged tunnel can't hang us."""
  try:
    proc = subprocess.run(
        [sys.executable, '-c', _PROBE_CODE],
        capture_output=True, text=True, timeout=timeout_s)
  except subprocess.TimeoutExpired:
    return False, f'probe timed out after {timeout_s}s (tunnel wedged?)'
  if proc.returncode != 0:
    tail = (proc.stderr or proc.stdout or '').strip().splitlines()
    return False, tail[-1] if tail else f'probe rc={proc.returncode}'
  return True, proc.stdout.strip()


def main():
  num_envs = int(os.environ.get('MJLAB_BENCH_ENVS', 4096))
  n_steps = int(os.environ.get('MJLAB_BENCH_STEPS', 64))
  task = os.environ.get('MJLAB_BENCH_TASK', 'Mjlab-Velocity-Flat-Unitree-G1')
  probe_timeout = float(os.environ.get('MJLAB_BENCH_PROBE_TIMEOUT', 300))
  watchdog_s = float(os.environ.get('MJLAB_BENCH_WATCHDOG', 2400))

  if os.environ.get('MJLAB_BENCH_SKIP_PROBE') != '1':
    ok, detail = _backend_alive(probe_timeout)
    if not ok:
      time.sleep(30)  # one bounded retry after a breather
      ok, detail = _backend_alive(probe_timeout)
    if not ok:
      _emit_unavailable(detail)
      return
  else:
    detail = 'probe skipped'

  def _watchdog():
    time.sleep(watchdog_s)
    _emit_unavailable(f'bench exceeded watchdog {watchdog_s}s after '
                      f'probe passed ({detail})')
    os._exit(0)

  threading.Thread(target=_watchdog, daemon=True).start()

  import jax

  try:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass

  from mjlab_tpu.tasks import registry

  cfg = registry.load_cfg(task)
  cfg.scene.num_envs = num_envs
  env = registry.make(task, cfg=cfg)
  state, obs = env.init_state(0)

  step = jax.jit(env.step_fn, donate_argnums=(0,))
  key = jax.random.PRNGKey(0)
  action = 0.5 * jax.random.normal(key, (num_envs, env.action_dim))

  # HBM guard: refuse over-budget launches instead of crashing the
  # worker (mjlab_tpu/utils/hbm.py; no-op on backends without memory
  # analysis)
  from mjlab_tpu.utils import hbm
  hbm.assert_fits(step.lower(state, action).compile(),
                  label=f'{task} env.step @{num_envs}')

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
  print(json.dumps(result), flush=True)
  os._exit(0)  # don't let backend teardown (or the watchdog) alter rc


if __name__ == '__main__':
  main()
