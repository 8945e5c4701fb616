"""mjlab_tpu.physics: batched TPU-native rigid-body physics engine.

A from-scratch JAX re-implementation of the MuJoCo forward-dynamics
pipeline (the role mujoco_warp plays for the reference framework), designed
for XLA: static shapes, dense masked einsums for tree algebra, static
collision pair tables, fixed-iteration Newton contact solver.

Public API:
  put_model(mujoco.MjModel) -> Model
  make_data(Model) -> Data
  step(Model, Data) -> Data      # forward + integrate
  forward(Model, Data) -> Data   # forward dynamics only (mj_forward)
"""

from mjlab_tpu.physics.pipeline import forward, step
from mjlab_tpu.physics.io import make_data, put_model
from mjlab_tpu.physics.types import (
    ConeType,
    Contact,
    Data,
    DisableBit,
    GeomType,
    IntegratorType,
    JointType,
    Model,
    ModelStatic,
    Option,
)

__all__ = [
    'ConeType', 'Contact', 'Data', 'DisableBit', 'GeomType', 'IntegratorType',
    'JointType', 'Model', 'ModelStatic', 'Option', 'forward', 'make_data',
    'put_model', 'step',
]
