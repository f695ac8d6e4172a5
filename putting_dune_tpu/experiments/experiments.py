"""Experiment composition dataclasses.

Parity: /root/reference/putting_dune/experiments/experiments.py:29-65. The
material object is replaced by a (rate_fn, image_duration) spec — the
lattice itself is static and owned by the env.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

from putting_dune_tpu import rates as rates_lib


@dataclasses.dataclass(frozen=True)
class AdaptersAndGoal:
  """Action adapter + feature constructor (+ implicit goal-reaching goal)."""

  action_adapter: Any
  feature_constructor: Any


@dataclasses.dataclass(frozen=True)
class SimulatorSpec:
  """Simulator composition: rate function + imaging clock (+ drift)."""

  rate_fn: rates_lib.RateFunction
  image_duration_seconds: float = 2.0
  # Cumulative instrument drift, per-frame uniform increment in angstroms
  # (simulator.SimulatorConfig.drift_per_frame_angstroms); 0 disables.
  drift_per_frame_angstroms: float = 0.0


AgentConstructor = Callable[[np.random.Generator, AdaptersAndGoal], Any]
AdaptersAndGoalConstructor = Callable[[], AdaptersAndGoal]
SimulatorSpecConstructor = Callable[[], SimulatorSpec]


@dataclasses.dataclass(frozen=True)
class MicroscopeExperiment:
  get_agent: AgentConstructor
  get_adapters_and_goal: AdaptersAndGoalConstructor


@dataclasses.dataclass(frozen=True)
class TrainExperiment:
  get_adapters_and_goal: AdaptersAndGoalConstructor
  get_simulator_config: SimulatorSpecConstructor


@dataclasses.dataclass(frozen=True)
class EvalExperiment:
  get_agent: AgentConstructor
  get_adapters_and_goal: AdaptersAndGoalConstructor
  get_simulator_config: SimulatorSpecConstructor
