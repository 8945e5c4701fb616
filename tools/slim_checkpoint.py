"""Strip a full training checkpoint down to a deployment artifact.

Training checkpoints carry the FULL TrainState (optimizer moments +
the 4096-env EnvState pytree — ~160 MB for the G1 flagship); inference
needs params + observation normalizers only (~a few MB). This writes a
slim orbax checkpoint that rl/runner.py load() accepts (it restores
whatever learner keys exist), used for the repo-shipped
asset_zoo/pretrained artifacts (the reference ships none in-repo at
all — it downloads from GCS, reference src/mjlab/scripts/demo.py; a
slim in-repo artifact keeps `demo` working in a zero-egress box
without bloating every clone).

Usage:
  python tools/slim_checkpoint.py <src_ckpt_dir> <dst_ckpt_dir>
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the CPU backend before orbax pulls in jax: stripping a
# checkpoint must not claim (or hang on) the TPU tunnel
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

KEEP = ('params', 'actor_norm', 'critic_norm', 'lr', 'rng', 'iteration')


def slim(src: str, dst: str) -> dict:
  import orbax.checkpoint as ocp
  ckptr = ocp.PyTreeCheckpointer()
  full = ckptr.restore(os.path.abspath(src))
  payload = {k: full[k] for k in KEEP if k in full}
  missing = [k for k in KEEP if k not in full]
  if missing:
    print(f'# note: source lacks {missing}')
  ckptr.save(os.path.abspath(dst), payload, force=True)
  return payload


def _du(path):
  total = 0
  for root, _, files in os.walk(path):
    total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
  return total


def main():
  src, dst = sys.argv[1], sys.argv[2]
  slim(src, dst)
  print(f'{src}: {_du(src)/2**20:.1f} MB -> {dst}: {_du(dst)/2**20:.1f} MB')


if __name__ == '__main__':
  main()
