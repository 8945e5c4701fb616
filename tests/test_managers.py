"""Manager-stack tests: domain randomization, observation history,
scene-entity resolution (reference tests/test_domain_randomization.py,
test_observation_history.py, test_scene_entity_config.py).

Runs on the TinyBot debug robot (asset_zoo/tiny_bot.py): manager logic is
robot-independent and the 2-DoF build compiles in seconds where Go1 took
minutes per fixture variant (round-2 VERDICT suite-time item)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mjlab_tpu.tasks.velocity.config.tiny  # noqa: F401  (registers task)
from mjlab_tpu.managers.term_cfg import SceneEntityCfg
from mjlab_tpu.tasks import registry

N_ENVS = 4
N_JOINTS = 2  # shoulder, elbow


@pytest.fixture(scope='module')
def env():
  cfg = registry.load_cfg('Mjlab-Velocity-Flat-Tiny')
  cfg.scene.num_envs = N_ENVS
  # per-env foot-friction randomization (startup event, abs uniform)
  cfg.events.foot_friction.params['ranges'] = (0.3, 1.2)
  # observation history on one term
  cfg.observations.policy.joint_pos.history_length = 3
  cfg.observations.policy.joint_pos.flatten_history_dim = True
  return registry.make('Mjlab-Velocity-Flat-Tiny', cfg=cfg)


def test_randomize_field_expands_and_randomizes(env):
  fric = np.asarray(env.model.geom_friction)
  # env-expanded leading axis
  assert fric.ndim == 3 and fric.shape[0] == N_ENVS
  # selected geoms: per-env sliding friction within the range and varying
  import re
  sel = [i for i, name in enumerate(env.model.stat.geom_names)
         if re.search(r'foot[0-3]_collision$', name)]
  assert len(sel) == 4
  vals = fric[:, sel, 0]
  assert (vals >= 0.3 - 1e-6).all() and (vals <= 1.2 + 1e-6).all()
  assert np.std(vals) > 1e-3  # actually randomized across envs/geoms
  # unselected geoms keep the compiled value, identical across envs
  unsel = [i for i, name in enumerate(env.model.stat.geom_names)
           if 'base_collision' in name]
  assert unsel and np.allclose(fric[:, unsel], fric[0, unsel])


def test_observation_history_dim_and_backfill(env):
  mgr = env.observation_manager
  # policy dim = base terms + (history-1) extra copies of joint_pos
  base = 3 + 3 + 3 + N_JOINTS + N_JOINTS + N_JOINTS + 3
  assert mgr.group_dim('policy') == base + 2 * N_JOINTS

  state, obs = env.init_state(0)
  # right after reset the history is backfilled with the current sample:
  # all 3 history copies of joint_pos must be identical
  # (reference circular_buffer.py:22-72 first-append backfill)
  cb = state.obs['policy/joint_pos/hist']
  h = np.asarray(cb.buf)  # (N, 3, n_joints)
  assert h.shape == (N_ENVS, 3, N_JOINTS)
  np.testing.assert_allclose(h, np.broadcast_to(h[:, :1], h.shape),
                             atol=1e-6)

  # after stepping, history slots diverge
  a = jnp.full((N_ENVS, N_JOINTS), 0.3)
  for _ in range(3):
    state, (obs, *_rest) = env._step_jit(state, a)
  h2 = np.asarray(state.obs['policy/joint_pos/hist'].buf)
  assert not np.allclose(h2[:, 0], h2[:, -1])


def test_scene_entity_cfg_resolution(env):
  ok = SceneEntityCfg('robot', joint_names=['elbow'])
  ok.resolve(env.scene)
  assert len(ok.joint_ids) == 1

  bad = SceneEntityCfg('robot', joint_names=['no_such_joint_.*'])
  with pytest.raises((ValueError, KeyError)):
    bad.resolve(env.scene)

  missing = SceneEntityCfg('no_such_entity')
  with pytest.raises((ValueError, KeyError)):
    missing.resolve(env.scene)


def test_reward_zero_weight_short_circuit(env):
  # the air_time term is weight 0 and must carry no state
  assert 'air_time' in env.reward_manager.terms
  assert env.reward_manager.init_state(N_ENVS) == {}


def test_interval_event_clocks(env):
  state, _ = env.init_state(0)
  assert 'push_robot/time_left' in state.event
  tl0 = np.asarray(state.event['push_robot/time_left'])
  assert tl0.shape == (N_ENVS,)
  a = jnp.zeros((N_ENVS, N_JOINTS))
  state, _ = env._step_jit(state, a)
  tl1 = np.asarray(state.event['push_robot/time_left'])
  # clocks count down (or resampled upward on expiry)
  assert (tl1 < tl0 + 1e-6).any()


def test_randomize_field_operation_matrix(env):
  """All distribution x operation combinations behave per spec
  (reference tests/test_domain_randomization.py:73-166)."""
  from mjlab_tpu.envs import mdp
  from mjlab_tpu.sim.sim import expand_model_fields

  model = expand_model_fields(
      env.model, ['dof_damping', 'dof_armature', 'body_mass'],
      env.num_envs)
  base = np.asarray(model.dof_damping)
  mask = jnp.ones(env.num_envs, bool)
  cfg = SceneEntityCfg('robot', joint_names=['.*'])
  key = jax.random.PRNGKey(3)

  # abs + uniform: values land inside the range
  m1 = mdp.randomize_field(model, env.scene, key, mask,
                           field='dof_damping', ranges=(0.5, 1.5),
                           distribution='uniform', operation='abs',
                           asset_cfg=cfg)
  view = env.scene['robot']
  cols = np.asarray(view.idx.v_adr)
  vals = np.asarray(m1.dof_damping)[:, cols]
  assert (vals >= 0.5 - 1e-6).all() and (vals <= 1.5 + 1e-6).all()
  assert np.std(vals) > 1e-3

  # scale + uniform: multiplicative around the compiled value (armature
  # is positive for TinyBot's actuators; damping compiles to 0)
  base_arm = np.asarray(model.dof_armature)
  m2 = mdp.randomize_field(model, env.scene, key, mask,
                           field='dof_armature', ranges=(0.9, 1.1),
                           distribution='uniform', operation='scale',
                           asset_cfg=cfg)
  ratio = np.asarray(m2.dof_armature)[:, cols] / np.maximum(
      base_arm[:, cols], 1e-12)
  assert (ratio >= 0.9 - 1e-5).all() and (ratio <= 1.1 + 1e-5).all()

  # add + gaussian: mean shift, finite spread
  m3 = mdp.randomize_field(model, env.scene, key, mask,
                           field='dof_armature', ranges=(0.2, 0.01),
                           distribution='gaussian', operation='add',
                           asset_cfg=cfg)
  delta = np.asarray(m3.dof_armature)[:, cols] - base_arm[:, cols]
  assert abs(delta.mean() - 0.2) < 0.05
  assert 0.001 < delta.std() < 0.05

  # log_uniform + scale on body_mass: positive multipliers in range
  bcfg = SceneEntityCfg('robot', body_names=['base'])
  m4 = mdp.randomize_field(model, env.scene, key, mask,
                           field='body_mass', ranges=(0.5, 2.0),
                           distribution='log_uniform', operation='scale',
                           asset_cfg=bcfg)
  bid = view.idx.body_ids[list(view.idx.body_names).index('base')]
  r = np.asarray(m4.body_mass)[:, bid] / np.asarray(model.body_mass)[:, bid]
  assert (r >= 0.5 - 1e-5).all() and (r <= 2.0 + 1e-5).all()
  assert np.std(np.log(r)) > 0.05  # log-space spread

  # masked envs keep their values
  half = jnp.arange(env.num_envs) < env.num_envs // 2
  m5 = mdp.randomize_field(model, env.scene, key, half,
                           field='dof_damping', ranges=(5.0, 6.0),
                           distribution='uniform', operation='abs',
                           asset_cfg=cfg)
  out = np.asarray(m5.dof_damping)[:, cols]
  nh = env.num_envs // 2
  assert (out[:nh] >= 5.0 - 1e-6).all()
  np.testing.assert_allclose(out[nh:], base[nh:, cols])
