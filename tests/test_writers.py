"""Metric-writer tests (observability parity with the reference's
rsl_rl wandb/tensorboard logging, ref src/mjlab/rl/config.py:85-87)."""

import glob
import json
import os

import numpy as np
import pytest

from mjlab_tpu.rl.writers import (
    JsonlWriter,
    TensorboardWriter,
    make_writers,
)


def test_jsonl_writer_roundtrip(tmp_path):
  w = JsonlWriter(str(tmp_path))
  w.log({'Episode_Reward/track': 0.5, 'it': 1}, step=1)
  w.log({'Episode_Reward/track': 0.75, 'it': 2}, step=2)
  w.close()
  lines = [json.loads(ln) for ln in
           open(tmp_path / 'metrics.jsonl').read().splitlines()]
  assert [r['Episode_Reward/track'] for r in lines] == [0.5, 0.75]


def test_tensorboard_writer_emits_events(tmp_path):
  pytest.importorskip('tensorboardX')
  w = TensorboardWriter(str(tmp_path))
  w.log({'Episode_Reward/track_lin_vel': 1.25,
         'Metrics/twist/error_vel_xy': 0.1,
         'not_a_number': 'skipped'}, step=3)
  frames = np.zeros((4, 8, 8, 3), np.uint8)
  w.add_video('Video/rollout', frames, fps=10, step=3)
  w.close()
  assert glob.glob(str(tmp_path / 'events.out.tfevents.*'))


def test_make_writers_wandb_falls_back(tmp_path):
  # whether or not wandb is installed, requesting the wandb logger must
  # never raise and always yields the jsonl baseline first (graceful
  # degradation when the package or network is unavailable)
  ws = make_writers('wandb', str(tmp_path))
  names = [type(w).__name__ for w in ws]
  assert names[0] == 'JsonlWriter'
  for w in ws:
    w.close()


def test_make_writers_tensorboard_stack(tmp_path):
  pytest.importorskip('tensorboardX')
  ws = make_writers('tensorboard', str(tmp_path))
  names = [type(w).__name__ for w in ws]
  assert names == ['JsonlWriter', 'TensorboardWriter']
  for w in ws:
    w.close()
