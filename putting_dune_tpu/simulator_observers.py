"""Simulator event recording.

Parity: /root/reference/putting_dune/simulator_observers.py:26-105 and the
SimulatorObserver hook interface (microscope_utils.py:503-535). The
reference mutates observer objects from inside the simulator; the
functional core instead RETURNS event data (KMC event logs in KMCResult,
observations), and this module provides the host-side event bus that
aggregates those returns into the same RESET / TRANSITION / APPLY_CONTROL /
TAKE_IMAGE / GENERATED_IMAGE event stream, for videos and eval debugging.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, List, Optional

import numpy as np


@enum.unique
class SimulatorEventType(enum.Enum):
  RESET = 'reset'
  TRANSITION = 'transition'
  APPLY_CONTROL = 'apply_control'
  TAKE_IMAGE = 'take_image'
  GENERATED_IMAGE = 'generated_image'
  FOV_CHANGE = 'fov_change'


@dataclasses.dataclass(frozen=True)
class SimulatorEvent:
  event_type: SimulatorEventType
  data: Any


class EventObserver:
  """Collects simulator events for a single environment (batch index 0).

  Usage: call the record_* methods with the outputs of simulator
  reset/step; read .events for plotting_utils video generation.
  """

  def __init__(self, batch_index: int = 0):
    self.events: List[SimulatorEvent] = []
    self._b = batch_index

  def reset(self) -> None:
    self.events = []

  def record_reset(self, state, obs) -> None:
    b = self._b
    self.events.append(
        SimulatorEvent(
            SimulatorEventType.RESET,
            {
                'offset': np.asarray(state.material.offset)[b],
                'theta': float(np.asarray(state.material.theta)[b]),
                'si_index': int(np.asarray(state.material.si_index)[b]),
                'fov_lower_left': np.asarray(state.fov.lower_left)[b],
                'fov_upper_right': np.asarray(state.fov.upper_right)[b],
            },
        )
    )
    self.events.append(
        SimulatorEvent(
            SimulatorEventType.FOV_CHANGE,
            {
                'lower_left': np.asarray(state.fov.lower_left)[b],
                'upper_right': np.asarray(state.fov.upper_right)[b],
            },
        )
    )

  def record_step(
      self, state, obs, kmc_result, control=None
  ) -> None:
    b = self._b
    if control is not None:
      self.events.append(
          SimulatorEvent(
              SimulatorEventType.APPLY_CONTROL,
              {
                  'position': np.asarray(control.position)[b],
                  'dwell_seconds': float(
                      np.asarray(control.dwell_seconds)[b]
                  ),
              },
          )
      )
    times = np.asarray(kmc_result.event_times)[:, b]
    sites = np.asarray(kmc_result.event_sites)[:, b]
    for t, site in zip(times, sites):
      if site >= 0 and np.isfinite(t):
        self.events.append(
            SimulatorEvent(
                SimulatorEventType.TRANSITION,
                {'time_since_control': float(t), 'si_index': int(site)},
            )
        )
    self.events.append(
        SimulatorEvent(
            SimulatorEventType.TAKE_IMAGE,
            {
                'fov_lower_left': np.asarray(state.fov.lower_left)[b],
                'fov_upper_right': np.asarray(state.fov.upper_right)[b],
            },
        )
    )
    if obs.image is not None:
      self.events.append(
          SimulatorEvent(
              SimulatorEventType.GENERATED_IMAGE,
              {'image': np.asarray(obs.image)[b]},
          )
      )
