"""Electric actuator parameter derivation.

Standard gearbox reflected-inertia physics (capability mirror of reference
src/mjlab/utils/actuator.py:16-38): actuator armature is the rotor inertia
reflected through the gear train, and PD gains are derived from a target
natural frequency / damping ratio on that reflected inertia:
  kp = armature * omega^2,   kd = 2 * zeta * armature * omega.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class ElectricActuator:
  reflected_inertia: float
  velocity_limit: float
  effort_limit: float

  def pd_gains(self, natural_freq_hz: float = 10.0,
               damping_ratio: float = 2.0) -> tuple[float, float]:
    omega = 2.0 * math.pi * natural_freq_hz
    kp = self.reflected_inertia * omega ** 2
    kd = 2.0 * damping_ratio * self.reflected_inertia * omega
    return kp, kd


def reflected_inertia(rotor_inertia: float, gear_ratio: float) -> float:
  """Single-stage gearbox: I_reflected = I_rotor * N^2."""
  return rotor_inertia * gear_ratio ** 2


def reflected_inertia_two_stage_planetary(
    rotor_inertia: tuple[float, float, float],
    gear_ratio: tuple[float, float, float]) -> float:
  """Two-stage planetary gearbox: each element's inertia reflected through
  the downstream ratios (gear_ratio[0] is the rotor itself, = 1)."""
  assert gear_ratio[0] == 1
  return (rotor_inertia[0] * (gear_ratio[1] * gear_ratio[2]) ** 2
          + rotor_inertia[1] * gear_ratio[2] ** 2
          + rotor_inertia[2])


def rpm_to_rad(rpm: float) -> float:
  return rpm * 2.0 * math.pi / 60.0
