"""Regenerate the committed golden ONNX fixture (run from repo root):

    python tests/data/make_golden_onnx.py

Fully deterministic: every parameter leaf is an arange-based ramp, so the
bytes are reproducible across jax/flax versions (no PRNG involvement).
The fixture pins the writer's serialization; tests/test_export.py asserts
byte equality and protoc-schema conformance.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + '/../..')

from mjlab_tpu.rl.exporter import export_policy_as_onnx
from mjlab_tpu.rl.networks import ActorCritic, RunningNorm

OBS, ACT = 6, 3


def deterministic_params():
  net = ActorCritic(action_dim=ACT, actor_hidden_dims=(8,),
                    critic_hidden_dims=(8,))
  params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, OBS)),
                    jnp.zeros((1, OBS)))
  counter = [0]

  def ramp(leaf):
    n = leaf.size
    c = counter[0]
    counter[0] += 1
    vals = (np.arange(n, dtype=np.float64) % 17 - 8) / (16.0 + c)
    return jnp.asarray(vals.reshape(leaf.shape), jnp.float32)

  return net, jax.tree.map(ramp, params)


def main(out_path):
  _, params = deterministic_params()
  norm = RunningNorm.create(OBS)
  mean = jnp.asarray(np.linspace(-1, 1, OBS), jnp.float32)
  var = jnp.asarray(np.linspace(0.5, 2.0, OBS), jnp.float32)
  norm = norm.replace(mean=mean, var=var)
  export_policy_as_onnx(params, norm, None, out_path,
                        metadata={'task': 'golden', 'dt': '0.02'})
  print(out_path, os.path.getsize(out_path), 'bytes')


if __name__ == '__main__':
  main(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'golden_policy.onnx'))
