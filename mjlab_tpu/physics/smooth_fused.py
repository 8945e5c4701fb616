"""Dispatch for the fused smooth-dynamics kernel (ops/smooth_kernel.py).

`smooth_all(m, d)` computes kinematics + com_pos + com_vel + crb + rne
in one stage. Per-env signature like the rest of the pipeline; under
vmap on the TPU with MJLAB_SMOOTH_KERNEL=1 (supported tree, f32,
batch >= 256) the custom_vmap rule routes the whole batch to the fused
Pallas kernel; otherwise the exact XLA stages it replaces run
(physics/kinematics.py, physics/smooth.py). DEFAULT ON since round 4:
measured +8.3% end-to-end on chip (bench.py G1 velocity 4096 envs,
20,268 vs 18,721 env-steps/s/chip — BASELINE.md round 4).
MJLAB_SMOOTH_KERNEL=0 opts out.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mjlab_tpu.ops import smooth_kernel as _sk
from mjlab_tpu.physics import kinematics as _kinematics
from mjlab_tpu.physics import smooth as _smooth
from mjlab_tpu.physics.types import Data, Model


def enabled(stat) -> bool:
  """Static gate, checked by pipeline at trace time."""
  return (os.environ.get('MJLAB_SMOOTH_KERNEL', '1') == '1'
          and _sk._Tree.supported(stat))


def _xla_all(m: Model, d: Data) -> Data:
  d = _kinematics.kinematics(m, d)
  d = _kinematics.com_pos(m, d)
  d = _kinematics.com_vel(m, d)
  d = _smooth.crb(m, d)
  d = _smooth.rne(m, d)
  return d


def _bcast(x, B):
  if x.ndim and x.shape[0] == B:
    return x
  return jnp.broadcast_to(x, (B,) + x.shape)


def _fused_batched(m: Model, d: Data, interpret: bool = False) -> Data:
  """Batched entry: d leaves are (B, ...); m leaves may be env-batched
  (domain randomization) or unbatched. Runs the Pallas kernel and writes
  the results into Data."""
  s = m.stat
  tree = _sk._tree_cached(s)
  B = d.qpos.shape[0]
  bconst = jnp.concatenate([
      _bcast(m.body_pos, B), _bcast(m.body_quat, B),
      _bcast(m.body_ipos, B), _bcast(m.body_iquat, B),
      _bcast(m.body_inertia, B), _bcast(m.body_mass, B)[..., None],
  ], axis=-1)  # (B, nbody, 18)
  jconst = jnp.concatenate(
      [_bcast(m.jnt_pos, B), _bcast(m.jnt_axis, B)], axis=-1)
  gconst = jnp.concatenate(
      [_bcast(m.geom_pos, B), _bcast(m.geom_quat, B)], axis=-1)
  if s.nsite:
    sconst = jnp.concatenate(
        [_bcast(m.site_pos, B), _bcast(m.site_quat, B)], axis=-1)
  else:
    sconst = jnp.zeros((B, 1, 7), d.qpos.dtype)
  res = _sk.smooth_fused_tpu(
      tree, d.qpos, d.qvel, _bcast(m.qpos0, B), bconst, jconst, gconst,
      sconst, _bcast(m.dof_armature, B),
      _bcast(m.opt.gravity.astype(d.qpos.dtype), B),
      interpret=interpret)
  if not s.nsite:
    res['site_xpos'] = d.site_xpos
    res['site_xmat'] = d.site_xmat
  return d.replace(**res)


@jax.custom_batching.custom_vmap
def smooth_all(m: Model, d: Data) -> Data:
  return _xla_all(m, d)


@smooth_all.def_vmap
def _smooth_all_vmap(axis_size, in_batched, m, d):
  use_kernel = (
      jax.default_backend() == 'tpu'
      and d.qpos.dtype == jnp.float32
      and axis_size >= 256
      and enabled(m.stat))
  if use_kernel:
    # broadcast any unbatched Data leaves (normally all are batched)
    d_b = jax.tree.map(
        lambda x, b: x if b else jnp.broadcast_to(
            x, (axis_size,) + jnp.shape(x)),
        d, in_batched[1])
    out = _fused_batched(m, d_b)
  else:
    axes = jax.tree.map(lambda b: 0 if b else None, in_batched)
    out = jax.vmap(_xla_all, in_axes=axes)(m, d)
  out_batched = jax.tree.map(lambda _: True, out)
  return out, out_batched
