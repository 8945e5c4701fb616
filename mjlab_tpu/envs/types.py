"""Environment state and context types.

The whole environment is a pure function over `EnvState` (a pytree holding
the batched physics Data, the - possibly per-env expanded - Model, PRNG
key, and every manager's state). This replaces the reference's mutable
manager objects + CUDA-graph stepping (reference
src/mjlab/envs/manager_based_env.py) with one jitted XLA program; resets
are branchless masked updates instead of host-side nonzero() indexing
(reference src/mjlab/envs/manager_based_rl_env.py:128-132).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
from flax import struct

from mjlab_tpu.physics.types import Data, Model

# VecEnv return conventions (reference src/mjlab/envs/types.py)
VecEnvObs = dict
VecEnvStepReturn = tuple


@struct.dataclass
class EnvState:
  model: Model
  data: Data  # batched (num_envs, ...)
  rng: jax.Array
  episode_length: jax.Array  # (N,) int32
  common_step: jax.Array  # () int32
  actions: jax.Array  # (N, A)
  prev_actions: jax.Array
  command: dict  # per command-term state pytrees
  obs: dict  # per-term history buffers / noise-bias states
  event: dict  # per-term interval clocks / reset bookkeeping
  reward_sums: jax.Array  # (N, n_reward_terms) episode sums
  curriculum: dict
  # stateful reward-term state (per-foot clocks etc.); {} when none
  reward: dict = struct.field(default_factory=dict)
  # physics-blowup forensic ring buffer (MJLAB_BLOWUP_DUMP debug mode
  # only; {} in production). Device-side because the axon TPU plugin
  # does not support host callbacks (jax.debug.callback) inside jit.
  forensic: dict = struct.field(default_factory=dict)


@dataclasses.dataclass
class EnvCtx:
  """Per-trace context handed to every term function. Not a pytree - it is
  rebuilt inside the jitted step from the current EnvState."""
  model: Model
  data: Data
  scene: Any  # Scene (build-time object with entity views)
  state: EnvState
  actions: jax.Array
  prev_actions: jax.Array
  commands: dict  # term name -> command value array
  command_terms: dict  # term name -> CommandTerm instance (static)
  episode_length: jax.Array
  step_dt: float
  physics_dt: float
  max_episode_length: int
  num_envs: int
  env_origins: jax.Array
  terminated: Any = None  # set by the env before reward computation

  def command_value(self, name: str) -> jax.Array:
    return self.commands[name]

  @property
  def max_episode_length_s(self) -> float:
    return self.max_episode_length * self.step_dt
