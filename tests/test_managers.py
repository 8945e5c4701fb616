"""Manager-stack tests: domain randomization, observation history,
scene-entity resolution (reference tests/test_domain_randomization.py,
test_observation_history.py, test_scene_entity_config.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.tasks import registry

N_ENVS = 4


@pytest.fixture(scope='module')
def env():
  cfg = registry.load_cfg('Mjlab-Velocity-Flat-Unitree-Go1')
  cfg.scene.num_envs = N_ENVS
  # per-env foot-friction randomization (startup event, abs uniform)
  cfg.events.foot_friction.params['ranges'] = (0.3, 1.2)
  # observation history on one term
  cfg.observations.policy.joint_pos.history_length = 3
  cfg.observations.policy.joint_pos.flatten_history_dim = True
  return registry.make('Mjlab-Velocity-Flat-Unitree-Go1', cfg=cfg)


def test_randomize_field_expands_and_randomizes(env):
  fric = np.asarray(env.model.geom_friction)
  # env-expanded leading axis
  assert fric.ndim == 3 and fric.shape[0] == N_ENVS
  view = env.scene['robot']
  foot_ids = view.idx.geom_ids[view.find_geoms('^[FR][LR]_foot_collision$')[0]] \
      if hasattr(view, 'find_geoms') else None
  # selected geoms: per-env sliding friction within the range and varying
  import re
  sel = [i for i, name in enumerate(env.model.stat.geom_names)
         if re.search(r'[FR][LR]_foot_collision$', name)]
  assert len(sel) == 4
  vals = fric[:, sel, 0]
  assert (vals >= 0.3 - 1e-6).all() and (vals <= 1.2 + 1e-6).all()
  assert np.std(vals) > 1e-3  # actually randomized across envs/geoms
  # unselected geoms keep the compiled value, identical across envs
  unsel = [i for i, name in enumerate(env.model.stat.geom_names)
           if 'trunk' in name]
  assert np.allclose(fric[:, unsel], fric[0, unsel])


def test_observation_history_dim_and_backfill(env):
  n_joints = 12
  mgr = env.observation_manager
  # policy dim = base terms + (history-1) extra copies of joint_pos
  base = 3 + 3 + 3 + n_joints + n_joints + n_joints + 3  # go1 flat terms
  assert mgr.group_dim('policy') == base + 2 * n_joints

  state, obs = env.init_state(0)
  # right after reset the history is backfilled with the current sample:
  # all 3 history copies of joint_pos must be identical
  # (reference circular_buffer.py:22-72 first-append backfill)
  cb = state.obs['policy/joint_pos/hist']
  h = np.asarray(cb.buf)  # (N, 3, n_joints)
  assert h.shape == (N_ENVS, 3, n_joints)
  np.testing.assert_allclose(h, np.broadcast_to(h[:, :1], h.shape),
                             atol=1e-6)

  # after stepping, history slots diverge
  a = jnp.full((N_ENVS, n_joints), 0.3)
  for _ in range(3):
    state, (obs, *_rest) = env._step_jit(state, a)
  h2 = np.asarray(state.obs['policy/joint_pos/hist'].buf)
  assert not np.allclose(h2[:, 0], h2[:, -1])


def test_scene_entity_cfg_resolution(env):
  ok = SceneEntityCfg('robot', joint_names=['.*_calf_joint'])
  ok.resolve(env.scene)
  assert len(ok.joint_ids) == 4

  bad = SceneEntityCfg('robot', joint_names=['no_such_joint_.*'])
  with pytest.raises((ValueError, KeyError)):
    bad.resolve(env.scene)

  missing = SceneEntityCfg('no_such_entity')
  with pytest.raises((ValueError, KeyError)):
    missing.resolve(env.scene)


def test_reward_zero_weight_short_circuit(env):
  # flat_orientation_l2 ships at weight -2.5 in the go1 cfg; the air_time
  # term is weight 0 and must carry no state
  assert 'air_time' in env.reward_manager.terms
  assert env.reward_manager.init_state(N_ENVS) == {}


def test_interval_event_clocks(env):
  state, _ = env.init_state(0)
  assert 'push_robot/time_left' in state.event
  tl0 = np.asarray(state.event['push_robot/time_left'])
  assert tl0.shape == (N_ENVS,)
  a = jnp.zeros((N_ENVS, 12))
  state, _ = env._step_jit(state, a)
  tl1 = np.asarray(state.event['push_robot/time_left'])
  # clocks count down (or resampled upward on expiry)
  assert (tl1 < tl0 + 1e-6).any()