"""Distill the round-4 f32 blowup trigger into a solver-level fixture.

The forensic ring (artifacts/blowups_r4/blowup_ring.npz) captured 40
pre-explosion env states during G1 velocity training. Replaying them
through the env physics path with the pre-fix UNGUARDED linesearch
polish reproduces the blowup in exactly one env (ring row 38): qvel
peaks at 111.1 at the 5th substep, while the round-4 safeguarded
bracket-bisect polish keeps it at 6.2 (artifacts/blowups_r4/
replay_report.txt vs replay_fixed.txt).

Replaying the full env path in a test costs ~150 s of CPU compile, so
this tool runs the replay ONCE and freezes the exact Newton-solver
inputs at the biting substep (the state going into substep 5 for ring
rows [38, 0]) into tests/data/blowup_ls_fixture.npz. The regression
test (tests/test_blowup_regression.py) then calls the solver directly
on those inputs — seconds, not minutes — and asserts the guarded
polish stays bounded where the unguarded one explodes.

Regenerate with:
  python tools/make_blowup_fixture.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

RING = 'artifacts/blowups_r4/blowup_ring.npz'
OUT = 'tests/data/blowup_ls_fixture.npz'
# ring row 38 is the biting env; row 0 is the hottest benign env (a
# deep-penetration state that must NOT explode under either polish)
ROWS = (38, 0)
BITE_SUBSTEP = 5  # qvel jumps 5.6 -> 111.1 entering this substep


def main():
  ring = np.load(RING, allow_pickle=True)
  sel = np.asarray(ROWS)

  from mjlab_tpu.tasks import registry
  cfg = registry.load_cfg('Mjlab-Velocity-Flat-Unitree-G1')
  cfg.scene.num_envs = len(sel)
  env = registry.make('Mjlab-Velocity-Flat-Unitree-G1', cfg=cfg)

  from mjlab_tpu.physics import constraint as C
  from mjlab_tpu.physics import pipeline as P

  f32 = jnp.float32
  state, _ = env.init_state(0)
  data = state.data.replace(
      qpos=jnp.asarray(ring['qpos'][sel], f32),
      qvel=jnp.asarray(ring['qvel'][sel], f32),
      ctrl=jnp.asarray(ring['ctrl'][sel], f32),
      qacc_warmstart=jnp.asarray(ring['qacc_warmstart'][sel], f32),
      xfrc_applied=jnp.asarray(ring['xfrc_applied'][sel], f32),
      qfrc_applied=jnp.asarray(ring['qfrc_applied'][sel], f32),
      time=jnp.asarray(ring['time'][sel], f32))
  state = state.replace(data=data, model=state.model.replace(
      geom_friction=jnp.asarray(ring['model_geom_friction'][sel], f32)))
  ctx = env._make_ctx(state)
  data = env.action_manager.apply(
      ctx, state.data, jnp.asarray(ring['processed_action'][sel], f32))

  model = state.model
  axes = env._model_axes
  # The pre-fix trajectory drifts slightly from the fixed one over the
  # benign substeps 1-4 (alpha differs in the last float even when no
  # overshoot triggers), and only the pre-fix trajectory reaches the
  # kink state that explodes at substep 5 — so the warmup substeps must
  # run under the UNGUARDED polish to land on the biting state.
  from mjlab_tpu.physics import solver as _solver
  _solver.UNSAFE_LS_POLISH = True
  _solver._newton_fn.cache_clear()
  try:
    step = jax.jit(lambda m, d: env._phys_step(m, d))
    for _ in range(BITE_SUBSTEP - 1):
      data = step(model, data)
  finally:
    _solver.UNSAFE_LS_POLISH = False
    _solver._newton_fn.cache_clear()

  # run the forward pipeline up to (but not including) the solve, then
  # capture exactly the arrays physics/solver.py solve() hands to the
  # Newton kernel (the pyramidal, ne=0 path of the velocity tasks)
  def pre_solve(m, d):
    d = P.fwd_position(m, d)
    d = P.fwd_velocity(m, d)
    from mjlab_tpu.physics import smooth as S
    d = S.actuation(m, d)
    d = S.fwd_smooth(m, d)
    efc = C.make_efc(m, d)
    # implicitfast velocity-derivative diagonal, so the test can finish
    # the substep: qacc = (M + dt diag(deriv))^-1 (qfrc_smooth + qfrc_c)
    deriv = m.dof_damping - P._actuator_vel_deriv(m, d)
    return d, efc, deriv

  d5, efc, deriv = jax.jit(jax.vmap(pre_solve, in_axes=(axes, 0)))(
      model, data)

  s = env.scene.mj_model  # compiled mujoco model for opt params
  stat = None
  # solver static parameters, computed the way solve() computes them
  from mjlab_tpu.physics import constraint as _c
  stat = env._template_state.model.stat if hasattr(
      env, '_template_state') else None
  mstat = state.model.stat
  ldof = tuple(int(i) for i in _c.limit_dofadr(mstat))
  ls_polish = max(1, min((int(mstat.ls_iterations) - 10) // 4, 6))
  grad_th = (float(mstat.newton_tolerance) * float(mstat.meaninertia)
             * max(1, mstat.nv))
  lay = _c.efc_layout(mstat)
  assert lay.ne == 0 and lay.nlt == 0, 'fixture assumes the ne=0 path'

  np.savez_compressed(
      OUT,
      M=np.asarray(d5.qM), a0=np.asarray(d5.qacc_smooth),
      ws=np.asarray(d5.qacc_warmstart),
      cJ=np.asarray(efc['c_J']), c_aref=np.asarray(efc['c_aref']),
      cD=np.asarray(efc['c_D']), c_act=np.asarray(efc['c_active']),
      l_sign=np.asarray(efc['l_sign']), l_aref=np.asarray(efc['l_aref']),
      lD=np.asarray(efc['l_D']), l_act=np.asarray(efc['l_active']),
      f_aref=np.asarray(efc['f_aref']), fD=np.asarray(efc['f_D']),
      floss=np.asarray(efc['f_floss']), f_act=np.asarray(efc['f_active']),
      qvel=np.asarray(d5.qvel),
      qfrc_smooth=np.asarray(d5.qfrc_smooth),
      deriv=np.asarray(deriv),
      dt=np.float32(env.scene.mj_model.opt.timestep),
      iterations=np.int32(mstat.iterations),
      ls_polish=np.int32(ls_polish),
      grad_th=np.float32(grad_th),
      ldof=np.asarray(ldof, np.int32),
      ring_rows=np.asarray(ROWS, np.int32),
      bite_substep=np.int32(BITE_SUBSTEP),
      qvel_limit=np.float32(env.cfg.sanity_qvel_limit))
  print(f'wrote {OUT}: rows={ROWS} substep={BITE_SUBSTEP} '
        f'ncr={efc["c_J"].shape[1]} nv={d5.qvel.shape[-1]} '
        f'iters={int(mstat.iterations)} ls_polish={ls_polish}')


if __name__ == '__main__':
  main()
