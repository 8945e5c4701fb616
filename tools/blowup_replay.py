"""Replay physics-blowup dumps captured by MJLAB_BLOWUP_DUMP.

Loads the pre-explosion snapshots written by
mjlab_tpu/envs/manager_based_rl_env.py (_forensic_write /
maybe_dump_forensics) and re-runs the
exact exploding control step on CPU under controlled variants, to
isolate the root cause of residual f32 blowups (VERDICT r3 next #2):

  env-f32   — the env's own substep path, bit-comparable to training
  eng-f32   — engine-level pipeline.step at f32 (sanity: must match)
  eng-f64   — same at float64 (if stable: precision root cause)
  eng-it3x  — f32 with 3x Newton iterations + 2x linesearch iterations
              (if stable: solver early-exit root cause)
  eng-nocap — f32 with contact compaction disabled (if stable:
              compaction dropping a load-bearing contact)

Per substep it reports max |qvel|, active contacts vs the compaction
caps, deepest penetration, and solver iterations, so the variant table
names the mechanism directly.

Usage:
  python tools/blowup_replay.py <dump_dir> [--task Mjlab-Velocity-Flat-Unitree-G1]
      [--substeps 8] [--max-dumps 10] [--variants env-f32,eng-f64,...]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('MJLAB_PLATFORM', 'cpu')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)  # engine f64 variant

import jax.numpy as jnp
import numpy as np

VARIANTS = ('env-f32', 'eng-f32', 'eng-f64', 'eng-it3x', 'eng-nocap')


def _load_dumps(dump_dir, max_dumps):
  files = sorted(glob.glob(os.path.join(dump_dir, 'blowup_*.npz')))
  if not files:
    raise SystemExit(f'no blowup_*.npz in {dump_dir}')
  return [dict(np.load(f, allow_pickle=True)) for f in files[:max_dumps]], \
      files[:max_dumps]


def _stack_dumps(dumps):
  """Concatenate the per-env rows of every dump into one batch. All
  captured randomized-model leaves (every `model_*` key the forensic
  writer recorded) are carried so the replay matches training for any
  DR collection, not just geom_friction."""
  keys = ('qpos', 'qvel', 'ctrl', 'qacc_warmstart', 'xfrc_applied',
          'qfrc_applied', 'time', 'processed_action', 'episode_length')
  keys = keys + tuple(k for k in dumps[0] if k.startswith('model_')
                      and k != 'model_field_names')
  out = {}
  for k in keys:
    if k in dumps[0]:
      out[k] = np.concatenate([d[k] for d in dumps], axis=0)
  return out


def _model_fields(batch):
  """{model attribute name: per-env batch array} for every captured
  randomized-model leaf."""
  return {k[len('model_'):]: v for k, v in batch.items()
          if k.startswith('model_')}


def _diag_fns(model, axes):
  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import pipeline as P
  s = model.stat
  sl3, sl1 = C.compaction_slot_pools(s)
  fwd_pos = jax.jit(jax.vmap(P.fwd_position, in_axes=(axes, 0)))

  def diag(m, d):
    d2 = fwd_pos(m, d)
    pen = d2.contact.dist - d2.contact.includemargin
    active = pen < 0.0
    return {
        'qvel_max': np.asarray(jnp.max(jnp.abs(d.qvel), axis=-1)),
        'n_act3': np.asarray(active[:, jnp.asarray(sl3)].sum(-1))
        if len(sl3) else np.zeros(d.qpos.shape[0], int),
        'n_act1': np.asarray(active[:, jnp.asarray(sl1)].sum(-1))
        if len(sl1) else np.zeros(d.qpos.shape[0], int),
        'min_dist': np.asarray(jnp.min(d2.contact.dist, axis=-1)),
        'solver_niter': np.asarray(d.solver_niter),
    }
  return diag, int(getattr(s, 'ncon_cap', 0) or 0), \
      int(getattr(s, 'ncon_cap1', 0) or 0)


def _run_substeps(step_fn, model, data, n_sub):
  """Run n_sub physics substeps (fixed ctrl) recording per-substep stats."""
  traj = []
  for _ in range(n_sub):
    data = step_fn(model, data)
    traj.append(data)
  return traj


def _report(tag, model, axes, traj, qvel_limit):
  diag, k3, k1 = _diag_fns(model, axes)
  rows = []
  blew = False
  for i, d in enumerate(traj):
    st = diag(model, d)
    qv = st['qvel_max']
    bad = (~np.isfinite(qv)) | (qv > qvel_limit)
    blew = blew or bool(bad.any())
    rows.append({
        'substep': i + 1,
        'qvel_max_p50': float(np.median(qv)),
        'qvel_max_max': float(np.max(qv)),
        'n_bad': int(bad.sum()),
        'n_act3_max': int(st['n_act3'].max()),
        'n_act1_max': int(st['n_act1'].max()),
        'min_dist': float(st['min_dist'].min()),
        'niter_max': int(st['solver_niter'].max()),
    })
  return {'variant': tag, 'K3': k3, 'K1': k1, 'reproduced': blew,
          'substeps': rows}


def _engine_replay(env, batch, ctrl, n_sub, dtype, iter_mult=1,
                   ls_mult=1, ncon_cap=None):
  """Engine-level replay: rebuild the model from the scene's compiled
  mujoco model with variant solver settings / dtype / compaction cap."""
  import copy

  import mujoco

  from mjlab_tpu.physics import io as phys_io
  from mjlab_tpu.physics import pipeline as P
  from mjlab_tpu.sim.sim import make_batched_data, model_vmap_axes

  mj = copy.copy(env.scene.mj_model)
  mj.opt.iterations = int(mj.opt.iterations * iter_mult)
  mj.opt.ls_iterations = int(mj.opt.ls_iterations * ls_mult)
  cap = env.cfg.sim.nconmax if ncon_cap is None else ncon_cap
  model = phys_io.put_model(mj, dtype=dtype, ncon_cap=cap)
  n = batch['qpos'].shape[0]
  fields = {k: jnp.asarray(v, dtype) for k, v in _model_fields(batch).items()
            if hasattr(model, k)}
  skipped = sorted(set(_model_fields(batch)) - set(fields))
  if skipped:
    print(f'# WARNING: captured model fields without an engine attr '
          f'skipped: {skipped}', flush=True)
  model_b = model.replace(**fields) if fields else model
  axes = model_vmap_axes(model_b, model)
  data = make_batched_data(model, n, dtype=dtype)
  data = data.replace(
      qpos=jnp.asarray(batch['qpos'], dtype),
      qvel=jnp.asarray(batch['qvel'], dtype),
      ctrl=jnp.asarray(ctrl, dtype),
      qacc_warmstart=jnp.asarray(batch['qacc_warmstart'], dtype),
      xfrc_applied=jnp.asarray(batch['xfrc_applied'], dtype),
      qfrc_applied=jnp.asarray(batch['qfrc_applied'], dtype),
      time=jnp.asarray(batch['time'], dtype))
  step = jax.jit(jax.vmap(P.step, in_axes=(axes, 0)))
  traj = _run_substeps(step, model_b, data, n_sub)
  return model_b, axes, traj


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('dump_dir')
  p.add_argument('--task', default='Mjlab-Velocity-Flat-Unitree-G1')
  p.add_argument('--substeps', type=int, default=8)
  p.add_argument('--max-dumps', type=int, default=10)
  p.add_argument('--variants', default=','.join(VARIANTS))
  args = p.parse_args(argv)

  dumps, files = _load_dumps(args.dump_dir, args.max_dumps)
  batch = _stack_dumps(dumps)
  n = batch['qpos'].shape[0]
  print(f'# {len(dumps)} dumps, {n} exploding envs, files: '
        f'{[os.path.basename(f) for f in files]}', flush=True)

  from mjlab_tpu.tasks import registry
  cfg = registry.load_cfg(args.task)
  cfg.scene.num_envs = n
  env = registry.make(args.task, cfg=cfg)
  qvel_limit = float(env.cfg.sanity_qvel_limit)

  # reconstruct the exact post-apply ctrl via the env's action manager
  state, _ = env.init_state(0)
  f32 = jnp.float32
  data0 = state.data.replace(
      qpos=jnp.asarray(batch['qpos'], f32),
      qvel=jnp.asarray(batch['qvel'], f32),
      ctrl=jnp.asarray(batch['ctrl'], f32),
      qacc_warmstart=jnp.asarray(batch['qacc_warmstart'], f32),
      xfrc_applied=jnp.asarray(batch['xfrc_applied'], f32),
      qfrc_applied=jnp.asarray(batch['qfrc_applied'], f32),
      time=jnp.asarray(batch['time'], f32))
  state = state.replace(data=data0)
  env_fields = {k: jnp.asarray(v, f32) for k, v in
                _model_fields(batch).items() if hasattr(state.model, k)}
  if env_fields:
    state = state.replace(model=state.model.replace(**env_fields))
  ctx = env._make_ctx(state)
  processed = jnp.asarray(batch['processed_action'], f32)
  data_ap = env.action_manager.apply(ctx, state.data, processed)
  ctrl = np.asarray(data_ap.ctrl)

  results = []
  want = args.variants.split(',')
  if 'env-f32' in want:
    step = jax.jit(lambda m, d: env._phys_step(m, d))
    traj = _run_substeps(step, state.model, data_ap, args.substeps)
    results.append(_report('env-f32', state.model, env._model_axes, traj,
                           qvel_limit))
  if 'eng-f32' in want:
    results.append(_report(
        'eng-f32', *_engine_replay(env, batch, ctrl, args.substeps,
                                   jnp.float32), qvel_limit))
  if 'eng-f64' in want:
    results.append(_report(
        'eng-f64', *_engine_replay(env, batch, ctrl, args.substeps,
                                   jnp.float64), qvel_limit))
  if 'eng-it3x' in want:
    results.append(_report(
        'eng-it3x', *_engine_replay(env, batch, ctrl, args.substeps,
                                    jnp.float32, iter_mult=3, ls_mult=2),
        qvel_limit))
  if 'eng-nocap' in want:
    results.append(_report(
        'eng-nocap', *_engine_replay(env, batch, ctrl, args.substeps,
                                     jnp.float32, ncon_cap=0), qvel_limit))

  for r in results:
    print(json.dumps(r), flush=True)
  print('\n# summary')
  for r in results:
    print(f"  {r['variant']:10s} reproduced={r['reproduced']} "
          f"(K3={r['K3']}, K1={r['K1']})")


if __name__ == '__main__':
  main()
