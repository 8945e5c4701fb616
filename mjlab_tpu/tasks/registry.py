"""Lightweight task registry (replaces gymnasium registration, reference
src/mjlab/tasks/__init__.py + third_party parse_cfg.load_cfg_from_registry).

Tasks register env-cfg and rl-cfg factories under `Mjlab-*` ids; `make()`
instantiates the environment. Factories (not instances) are stored so each
make() gets a fresh config to mutate.
"""

from __future__ import annotations

import copy
from typing import Any, Callable

_REGISTRY: dict[str, dict[str, Any]] = {}


def register(task_id: str, env_cfg_entry_point: Callable,
             rl_cfg_entry_point: Callable | None = None, **extra) -> None:
  if task_id in _REGISTRY:
    raise ValueError(f'task {task_id!r} already registered')
  _REGISTRY[task_id] = dict(env_cfg_entry_point=env_cfg_entry_point,
                            rl_cfg_entry_point=rl_cfg_entry_point, **extra)


def registered_tasks() -> list[str]:
  _import_all()
  return sorted(_REGISTRY)


def load_cfg(task_id: str, kind: str = 'env_cfg_entry_point'):
  _import_all()
  if task_id not in _REGISTRY:
    raise KeyError(
        f'unknown task {task_id!r}; available: {sorted(_REGISTRY)}')
  factory = _REGISTRY[task_id][kind]
  if factory is None:
    raise KeyError(f'task {task_id!r} has no {kind}')
  cfg = factory() if callable(factory) else copy.deepcopy(factory)
  return cfg


def make(task_id: str, cfg=None, device=None, **cfg_overrides):
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv
  if cfg is None:
    cfg = load_cfg(task_id)
  for k, v in cfg_overrides.items():
    obj = cfg
    parts = k.split('.')
    for p in parts[:-1]:
      obj = getattr(obj, p)
    setattr(obj, parts[-1], v)
  return ManagerBasedRlEnv(cfg, device=device)


def _import_all():
  """Import all task packages so their registrations run (analog of the
  reference's recursive import_packages)."""
  import mjlab_tpu.tasks.velocity.config.go1  # noqa: F401
  import mjlab_tpu.tasks.velocity.config.g1  # noqa: F401
  try:
    import mjlab_tpu.tasks.tracking.config.g1  # noqa: F401
  except ImportError:
    pass
  # External/plugin task modules (the gym-registration analog for user
  # tasks; docs/create_new_task.md): comma-separated importable module
  # paths whose import side-effect is registry.register(...) calls.
  # Also how the test suite injects its tiny smoke task into CLI
  # subprocesses.
  import importlib
  import os
  for mod in filter(None, os.environ.get(
      'MJLAB_TASKS_MODULES', '').split(',')):
    importlib.import_module(mod.strip())
