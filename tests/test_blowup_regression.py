"""Regression test for the round-4 f32 physics blowup fix.

The fix: the Newton linesearch's 1D polish is safeguarded by a
bracket-bisect (physics/solver.py `polish`, mirrored in ops/newton.py)
because the unguarded Newton step overshoots at the piecewise-quadratic
kinks of stiff deep-penetration cost landscapes, exploding qvel
~285 envs/iter during G1 velocity training (BASELINE.md round 4).

The trigger is a real captured training state: ring row 38 of
artifacts/blowups_r4/blowup_ring.npz, distilled by
tools/make_blowup_fixture.py into the exact solver inputs at the biting
substep (the full env replay takes ~150 s of CPU compile; this fixture
replays in seconds). The test finishes the substep the way
physics/pipeline.py `_implicitfast` does and checks post-substep qvel:

  * guarded polish (shipped):   |qvel| stays ~5  (bounded)
  * unguarded polish (pre-fix): |qvel| hits ~111 (> the env's 100
    sanity limit — the exact value the training forensics recorded)

The unguarded leg proves the test bites: if the fixture ever goes
stale, the assertion that the OLD code fails starts failing first.

Oracle-parity tests cannot catch this class of bug — benign states
never trigger the overshoot — which is why this pins the captured
adversarial state (VERDICT r4 next #5). Reference analog: the nan-guard
replay workflow around src/mjlab/utils/nan_guard.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.physics import solver

FIXTURE = os.path.join(os.path.dirname(__file__), 'data',
                       'blowup_ls_fixture.npz')
ARG_KEYS = ('M', 'a0', 'ws', 'cJ', 'c_aref', 'cD', 'c_act', 'l_sign',
            'l_aref', 'lD', 'l_act', 'f_aref', 'fD', 'floss', 'f_act')


def _post_substep_qvel(fx, unsafe: bool) -> np.ndarray:
  """Run the captured Newton solve (f32, vmapped — the training path)
  and finish the implicitfast substep; returns per-env max |qvel|."""
  solver.UNSAFE_LS_POLISH = unsafe
  solver._newton_fn.cache_clear()
  try:
    ldof = tuple(int(i) for i in fx['ldof'])
    fn = solver._newton_fn(int(fx['iterations']), int(fx['ls_polish']),
                           ldof, 0, float(fx['grad_th']))
    # keep stored dtypes (the *_act masks are bool, the rest f32)
    args = [jnp.asarray(fx[k]) for k in ARG_KEYS]
    _, ff, fl, fc = jax.jit(jax.vmap(fn))(*args)
    qfrc = ff + jnp.einsum('bcv,bc->bv', args[3], fc)
    qfrc = qfrc.at[:, jnp.asarray(ldof)].add(
        jnp.asarray(fx['l_sign'], jnp.float32) * fl)
    dt = float(fx['dt'])
    A = (jnp.asarray(fx['M'], jnp.float32)
         + dt * jax.vmap(jnp.diag)(jnp.asarray(fx['deriv'], jnp.float32)))
    rhs = jnp.asarray(fx['qfrc_smooth'], jnp.float32) + qfrc
    qacc = jnp.linalg.solve(A, rhs[..., None])[..., 0]
    qvel = jnp.asarray(fx['qvel'], jnp.float32) + dt * qacc
    return np.nan_to_num(np.abs(np.asarray(qvel)), nan=np.inf).max(-1)
  finally:
    solver.UNSAFE_LS_POLISH = False
    solver._newton_fn.cache_clear()


@pytest.fixture(scope='module')
def fx():
  return np.load(FIXTURE)


def test_safeguarded_polish_contains_captured_blowup(fx):
  limit = float(fx['qvel_limit'])
  peaks = _post_substep_qvel(fx, unsafe=False)
  # row 0 = the exploding training env, row 1 = hottest benign env
  assert np.all(np.isfinite(peaks))
  assert peaks.max() < 0.2 * limit, peaks


def test_unguarded_polish_still_bites(fx):
  """The pre-fix path must FAIL on the captured state, proving the
  fixture still exercises the kink-overshoot mechanism."""
  limit = float(fx['qvel_limit'])
  peaks = _post_substep_qvel(fx, unsafe=True)
  assert peaks[0] > limit, peaks  # the training forensics recorded 111.1
  # the benign env must stay benign — the overshoot is state-specific
  assert peaks[1] < 0.2 * limit, peaks
