"""Minimal nested-dataclass CLI (tyro replacement, reference uses tyro for
`--env.scene.num-envs 4096`-style overrides, reference
src/mjlab/scripts/train.py:116-145)."""

from __future__ import annotations

import ast
import dataclasses
from typing import Any


def apply_overrides(obj: Any, overrides: list[str]) -> Any:
  """Apply ['--a.b.c', 'value', ...] style overrides in place."""
  i = 0
  while i < len(overrides):
    tok = overrides[i]
    if not tok.startswith('--'):
      raise ValueError(f'expected --flag, got {tok!r}')
    if '=' in tok:
      key, raw = tok[2:].split('=', 1)
      i += 1
    else:
      key = tok[2:]
      if i + 1 >= len(overrides):
        raise ValueError(f'missing value for {tok}')
      raw = overrides[i + 1]
      i += 2
    key = key.replace('-', '_')
    parts = key.split('.')
    target = obj
    for p in parts[:-1]:
      target = getattr(target, p)
    leaf = parts[-1]
    cur = getattr(target, leaf, None)
    setattr(target, leaf, _coerce(raw, cur))
  return obj


def _coerce(raw: str, current: Any) -> Any:
  if isinstance(current, bool):
    return raw.lower() in ('1', 'true', 'yes')
  if isinstance(current, int) and not isinstance(current, bool):
    return int(raw)
  if isinstance(current, float):
    return float(raw)
  if isinstance(current, str) or current is None:
    try:
      return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
      return raw
  try:
    return ast.literal_eval(raw)
  except (ValueError, SyntaxError):
    return raw


def print_cfg(cfg: Any, prefix: str = '') -> None:
  if dataclasses.is_dataclass(cfg):
    for f in dataclasses.fields(cfg):
      print_cfg(getattr(cfg, f.name), f'{prefix}{f.name}.')
  else:
    print(f'  {prefix[:-1]} = {cfg!r}')
