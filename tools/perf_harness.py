"""TPU perf harness (VERDICT r2 next-round #3).

Subcommands (run on the real chip; each prints JSON lines):
  steps [tasks...]   — full env.step wall time / env-steps/s per task
                       (default: G1 velocity + G1 tracking, resolves the
                       round-2 throughput-inversion question)
  solver <task>      — Newton-solver-only timing at a realistic rollout
                       state: whole-solver Pallas kernel vs vmapped-XLA
                       path (MXU Hessian + fused Cholesky)
  phases <task>      — substep / make_efc / solve / smooth standalone
                       timings (per-dispatch overhead included)
  occupancy <task>   — active-contact slot occupancy stats over a random
                       rollout (sizes K3/K1 compaction caps with data)

Env knobs: MJLAB_BENCH_ENVS (default 4096), MJLAB_BENCH_STEPS (default 32).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mjlab_tpu.utils.cache import apply_platform_env, setup_compilation_cache

apply_platform_env()
setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

VEL = 'Mjlab-Velocity-Flat-Unitree-G1'
TRK = 'Mjlab-Tracking-Flat-Unitree-G1'


def _env(task, num_envs):
  from mjlab_tpu.tasks import registry
  cfg = registry.load_cfg(task)
  cfg.scene.num_envs = num_envs
  return registry.make(task, cfg=cfg)


def _timeit(fn, *args, n=None, warmup=2):
  n = n or int(os.environ.get('MJLAB_BENCH_STEPS', 32))
  out = None
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / n


def _timeit_chain(fn, state, n=None, warmup=2):
  """Time fn(state)->state where fn donates its argument: the input
  buffers are deleted on every call, so the state must be threaded
  through the loop (passing the same state twice fails on TPU with
  'Array has been deleted'; CPU ignores donation, masking the bug)."""
  n = n or int(os.environ.get('MJLAB_BENCH_STEPS', 32))
  for _ in range(warmup):
    state = fn(state)
  state = jax.block_until_ready(state)
  t0 = time.perf_counter()
  for _ in range(n):
    state = fn(state)
  jax.block_until_ready(state)
  return (time.perf_counter() - t0) / n


def _rollout_state(env, n_warm=16, seed=0):
  """Advance the env with random actions to a contact-rich mid-episode
  state (resets leave t=0 states unrepresentative)."""
  state, _ = env.init_state(seed)
  step = jax.jit(env.step_fn, donate_argnums=(0,))
  key = jax.random.PRNGKey(seed)
  for i in range(n_warm):
    key, k = jax.random.split(key)
    act = 0.5 * jax.random.normal(k, (env.num_envs, env.action_dim))
    state, _ = step(state, act)
  return jax.block_until_ready(state)


def cmd_steps(tasks, num_envs):
  for task in tasks:
    env = _env(task, num_envs)
    state, _ = env.init_state(0)
    step = jax.jit(env.step_fn, donate_argnums=(0,))
    act = 0.5 * jax.random.normal(jax.random.PRNGKey(1),
                                  (num_envs, env.action_dim))

    # HBM guard (VERDICT r4 #8): the 8192-env point crashed the worker;
    # check XLA's own peak-memory analysis before executing
    from mjlab_tpu.utils import hbm
    compiled = step.lower(state, act).compile()
    rep = hbm.assert_fits(compiled, label=f'{task} env.step @{num_envs}')
    if rep is not None:
      print(json.dumps({'bench': 'env.step.memory', 'task': task,
                        'num_envs': num_envs,
                        'peak_bytes': rep.peak_bytes,
                        'capacity_bytes': rep.capacity_bytes}), flush=True)

    def run(s):
      s2, _ = step(s, act)
      return s2
    state = run(state)  # compile
    dt = _timeit_chain(run, state)
    print(json.dumps({'bench': 'env.step', 'task': task,
                      'num_envs': num_envs, 'ms': round(dt * 1e3, 2),
                      'env_steps_per_s': round(num_envs / dt)}), flush=True)


def _solver_inputs(env, state):
  """Reproduce solver.solve's argument assembly at the given state (same
  code path as physics/solver.py:358-425, pyramidal)."""
  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import pipeline as P
  from mjlab_tpu.physics import smooth as S

  m, d = state.model, state.data
  axes = env._model_axes

  def pre(m, d):
    d = P.fwd_position(m, d)
    d = P.fwd_velocity(m, d)
    d = S.actuation(m, d)
    d = S.fwd_smooth(m, d)
    return d, C.make_efc(m, d)

  d2, efc = jax.jit(jax.vmap(pre, in_axes=(axes, 0)))(m, d)
  s = m.stat
  lay = C.efc_layout(s)
  ne, nlt = lay.ne, lay.nlt
  cat = lambda parts: jnp.concatenate(parts, axis=1)
  if ne or nlt:
    pre_J = ([efc['e_J']] if ne else []) + ([efc['t_J']] if nlt else [])
    pre_a = ([efc['e_aref']] if ne else []) + ([efc['t_aref']] if nlt else [])
    pre_D = ([efc['e_D']] if ne else []) + ([efc['t_D']] if nlt else [])
    pre_c = ([efc['e_active']] if ne else []) + ([efc['t_active']] if nlt
                                                 else [])
    cJ = cat(pre_J + [efc['c_J']])
    c_aref = cat(pre_a + [efc['c_aref']])
    c_D = cat(pre_D + [efc['c_D']])
    c_act = cat(pre_c + [efc['c_active']])
  else:
    cJ, c_aref, c_D, c_act = (efc['c_J'], efc['c_aref'], efc['c_D'],
                              efc['c_active'])
  args = (d2.qM, d2.qacc_smooth, d2.qacc_warmstart, cJ, c_aref, c_D,
          c_act, efc['l_sign'], efc['l_aref'], efc['l_D'],
          efc['l_active'], efc['f_aref'], efc['f_D'], efc['f_floss'],
          efc['f_active'])
  return jax.block_until_ready(args), s, ne


def cmd_solver(task, num_envs):
  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import solver as SV
  env = _env(task, num_envs)
  state = _rollout_state(env)
  args, s, ne = _solver_inputs(env, state)
  ldof = tuple(int(i) for i in C.limit_dofadr(s))
  it, lsp = int(s.iterations), 2

  for mega, label in ((True, 'pallas-whole-solver'),
                      (False, 'xla+fused-cholesky')):
    SV._MEGA_KERNEL = mega
    SV._newton_fn.cache_clear()
    fn = SV._newton_fn(it, lsp, ldof, ne)
    # _newton_fn returns a custom_vmap function: it MUST be applied under
    # vmap for batched operands (its vmap rule is what dispatches to the
    # whole-solver Pallas kernel); calling it directly on (B, ...) args
    # runs the unbatched path on batched shapes and fails
    run = jax.jit(lambda *a: jax.vmap(fn)(*a)[0])
    run(*args)  # compile
    dt = _timeit(run, *args)
    print(json.dumps({'bench': 'newton-solve', 'path': label, 'task': task,
                      'num_envs': num_envs, 'iterations': it,
                      'ms': round(dt * 1e3, 3)}), flush=True)
  SV._MEGA_KERNEL = os.environ.get('MJLAB_NEWTON_KERNEL', '1') == '1'
  SV._newton_fn.cache_clear()


def cmd_phases(task, num_envs):
  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import pipeline as P
  env = _env(task, num_envs)
  state = _rollout_state(env)
  m, d = state.model, state.data
  axes = env._model_axes

  substep = jax.jit(jax.vmap(P.step, in_axes=(axes, 0)))
  fwd_pos = jax.jit(jax.vmap(P.fwd_position, in_axes=(axes, 0)))
  mk_efc = jax.jit(jax.vmap(
      lambda m, d: C.make_efc(m, d), in_axes=(axes, 0)))

  for name, fn, arg in (('substep', substep, d),
                        ('fwd_position(kin+collision)', fwd_pos, d)):
    fn(m, arg)
    dt = _timeit(lambda a: fn(m, a), arg)
    print(json.dumps({'bench': 'phase', 'phase': name, 'task': task,
                      'num_envs': num_envs,
                      'ms': round(dt * 1e3, 2)}), flush=True)
  d2 = jax.block_until_ready(fwd_pos(m, d))
  mk_efc(m, d2)
  dt = _timeit(lambda a: mk_efc(m, a), d2)
  print(json.dumps({'bench': 'phase', 'phase': 'make_efc', 'task': task,
                    'num_envs': num_envs, 'ms': round(dt * 1e3, 2)}),
        flush=True)


def cmd_envphases(task, num_envs):
  """Decompose the FULL env step into its phases (VERDICT r4 #3: explain
  the velocity-slower-than-tracking inversion). Each phase is jitted and
  timed standalone at the same rollout state; 'step' is the fused whole,
  so sum(phases) > step is expected (XLA fuses/overlaps across phases),
  but the RATIO of a phase between two tasks is meaningful."""
  env = _env(task, num_envs)
  state = _rollout_state(env)
  key = jax.random.PRNGKey(7)
  processed = env.action_manager.process(
      jnp.zeros((env.num_envs, env.action_dim)))

  def phys4(data):
    ctx = env._make_ctx(state)
    def substep(d, _):
      d = env.action_manager.apply(ctx, d, processed)
      d = env._phys_step(state.model, d)
      return d, jnp.max(jnp.abs(d.qvel), axis=-1)
    d, _ = jax.lax.scan(substep, data, None, length=env.cfg.decimation)
    return d

  def fwd_refresh(data):
    return env._phys_forward(state.model, data)

  def rew_term(data):
    ctx = env._make_ctx(state.replace(data=data))
    terminated, truncated, term_info = env.termination_manager.compute(ctx)
    ctx.terminated = terminated
    reward, sums, _, rew_state = env.reward_manager.compute(
        ctx, state.reward_sums, env.step_dt, state.reward)
    return reward, sums, terminated, truncated

  def reset_masked(data, k):
    st = state.replace(data=data)
    # realistic sparse done mask (~0.5% of envs reset per control step)
    done = jax.random.uniform(k, (env.num_envs,)) < 0.005
    term_info = {n: jnp.zeros(env.num_envs, bool)
                 for n in env.termination_manager.active_terms}
    st2, extras = env._reset_masked(st, done, term_info, k)
    return st2.data, st2.command, extras

  def cmd_events(data, k):
    st = state.replace(data=data)
    ctx = env._make_ctx(st)
    cmd_state = env.command_manager.compute(st.command, ctx, k, env.step_dt)
    ctx = env._make_ctx(st.replace(command=cmd_state))
    d2, ev_state = env.event_manager.apply_interval(ctx, data, st.event, k)
    return d2, cmd_state, ev_state

  def obs(data, k):
    ctx = env._make_ctx(state.replace(data=data))
    return env.observation_manager.compute(ctx, state.obs, k)

  rows = []
  for name, fn, args in (
      ('phys4(decimation loop)', jax.jit(phys4), (state.data,)),
      ('fwd_refresh(forward)', jax.jit(fwd_refresh), (state.data,)),
      ('rew_term', jax.jit(rew_term), (state.data,)),
      ('reset_masked', jax.jit(reset_masked), (state.data, key)),
      ('cmd_events', jax.jit(cmd_events), (state.data, key)),
      ('obs', jax.jit(obs), (state.data, key)),
  ):
    fn(*args)
    dt = _timeit(lambda *a: fn(*a), *args)
    rows.append((name, dt))
    print(json.dumps({'bench': 'envphase', 'phase': name, 'task': task,
                      'num_envs': num_envs, 'ms': round(dt * 1e3, 3)}),
          flush=True)
  # the fused whole for reference
  step = jax.jit(env.step_fn, donate_argnums=(0,))
  act = jnp.zeros((env.num_envs, env.action_dim))
  dt = _timeit_chain(lambda s: step(s, act)[0], state)
  print(json.dumps({'bench': 'envphase', 'phase': 'step(full, fused)',
                    'task': task, 'num_envs': num_envs,
                    'ms': round(dt * 1e3, 3),
                    'env_steps_per_s': round(num_envs / dt, 1)}),
        flush=True)


def cmd_occupancy(task, num_envs, n_steps=64):
  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import pipeline as P
  env = _env(task, num_envs)
  s = env.model.stat
  sl3, sl1 = C.compaction_slot_pools(s)
  state, _ = env.init_state(0)
  step = jax.jit(env.step_fn, donate_argnums=(0,))
  axes = env._model_axes
  fwd_pos = jax.jit(jax.vmap(P.fwd_position, in_axes=(axes, 0)))

  @jax.jit
  def counts(d):
    pen = d.contact.dist - d.contact.includemargin  # (B, ncon)
    active = pen < 0.0
    return (active[:, jnp.asarray(sl3)].sum(-1),
            active[:, jnp.asarray(sl1)].sum(-1))

  key = jax.random.PRNGKey(0)
  c3_all, c1_all = [], []
  for i in range(n_steps):
    key, k = jax.random.split(key)
    act = 0.5 * jax.random.normal(k, (env.num_envs, env.action_dim))
    state, _ = step(state, act)
    d2 = fwd_pos(state.model, state.data)
    c3, c1 = counts(d2)
    c3_all.append(np.asarray(c3))
    c1_all.append(np.asarray(c1))
  c3 = np.concatenate(c3_all)
  c1 = np.concatenate(c1_all)
  q = lambda a: {'p50': int(np.percentile(a, 50)),
                 'p99': int(np.percentile(a, 99)),
                 'p999': int(np.percentile(a, 99.9)),
                 'max': int(a.max())}
  print(json.dumps({'bench': 'occupancy', 'task': task,
                    'num_envs': num_envs, 'steps': n_steps,
                    'K3_cap': int(s.ncon_cap), 'K1_cap': int(s.ncon_cap1),
                    'frictional': q(c3), 'frictionless': q(c1)}),
        flush=True)


def cmd_itersweep(task, num_envs, iters=(2, 6, 10, 20)):
  """Marginal cost per Newton iteration (whole-solver Pallas kernel):
  slope(ms, iterations) isolates the per-iteration loop body (Hessian
  assembly + Cholesky + linesearch) from fixed costs (VMEM load/store,
  launch). Informs whether fewer/adaptive iterations is the perf lever."""
  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import solver as SV
  env = _env(task, num_envs)
  state = _rollout_state(env)
  args, s, ne = _solver_inputs(env, state)
  ldof = tuple(int(i) for i in C.limit_dofadr(s))
  rows = []
  for it in iters:
    fn = SV._newton_fn(int(it), 2, ldof, ne)
    run = jax.jit(lambda *a: jax.vmap(fn)(*a)[0])  # custom_vmap: see cmd_solver
    run(*args)
    dt = _timeit(run, *args)
    rows.append((it, dt * 1e3))
    print(json.dumps({'bench': 'itersweep', 'task': task,
                      'num_envs': num_envs, 'iterations': it,
                      'ms': round(dt * 1e3, 3)}), flush=True)
  if len(rows) >= 2:
    (i0, t0), (i1, t1) = rows[0], rows[-1]
    print(json.dumps({'bench': 'itersweep-slope', 'task': task,
                      'ms_per_iteration': round((t1 - t0) / (i1 - i0), 3),
                      'fixed_ms': round(t0 - i0 * (t1 - t0) / (i1 - i0),
                                        3)}), flush=True)


def cmd_converge(task, num_envs, iters=(2, 4, 6, 10, 30)):
  """Convergence curve: qacc error vs a 30-iteration reference solve at a
  realistic rollout state. If the p99 error floors early, the configured
  iteration count (model.stat.iterations) is buying nothing."""
  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import solver as SV
  env = _env(task, num_envs)
  state = _rollout_state(env)
  args, s, ne = _solver_inputs(env, state)
  ldof = tuple(int(i) for i in C.limit_dofadr(s))

  def qacc_at(it):
    fn = SV._newton_fn(int(it), 2, ldof, ne)
    return np.asarray(jax.jit(lambda *a: jax.vmap(fn)(*a)[0])(*args))

  ref = qacc_at(max(iters))
  scale = np.abs(ref).max()
  for it in iters:
    err = np.abs(qacc_at(it) - ref).max(axis=-1) / max(scale, 1e-9)
    print(json.dumps({'bench': 'converge', 'task': task,
                      'num_envs': num_envs, 'iterations': int(it),
                      'rel_err_p50': float(np.percentile(err, 50)),
                      'rel_err_p99': float(np.percentile(err, 99)),
                      'rel_err_max': float(err.max()),
                      'configured_iterations': int(s.iterations)}),
          flush=True)


def main():
  num_envs = int(os.environ.get('MJLAB_BENCH_ENVS', 4096))
  cmd = sys.argv[1] if len(sys.argv) > 1 else 'steps'
  rest = sys.argv[2:]
  if cmd == 'steps':
    cmd_steps(rest or [VEL, TRK], num_envs)
  elif cmd == 'solver':
    cmd_solver(rest[0] if rest else VEL, num_envs)
  elif cmd == 'phases':
    cmd_phases(rest[0] if rest else VEL, num_envs)
  elif cmd == 'envphases':
    cmd_envphases(rest[0] if rest else VEL, num_envs)
  elif cmd == 'occupancy':
    cmd_occupancy(rest[0] if rest else VEL, num_envs)
  elif cmd == 'itersweep':
    cmd_itersweep(rest[0] if rest else VEL, num_envs)
  elif cmd == 'converge':
    cmd_converge(rest[0] if rest else VEL, num_envs)
  else:
    raise SystemExit(f'unknown subcommand {cmd}')


if __name__ == '__main__':
  main()
