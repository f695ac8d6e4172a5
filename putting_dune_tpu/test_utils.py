"""Shared test fixtures (parity: reference test_utils.py:31-83)."""

from __future__ import annotations

import datetime as dt
from typing import Optional

import jax
import numpy as np

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.env import action_adapters
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import features as features_lib


def create_simple_environment(
    batch_size: int = 1,
    grid_columns: int = 20,
    step_limit: Optional[int] = 600,
) -> env_lib.PuttingDuneEnv:
  """A registry-style env with simple rates (reference test_utils:31-41)."""
  return env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(grid_columns),
      rate_fn=rates_lib.simple_canonical_rates,
      adapter=action_adapters.RelativeToSiliconActionAdapter(),
      features=features_lib.SingleSiliconPristineGrapheneFeatures(),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(grid_columns=grid_columns),
          step_limit=step_limit,
      ),
      batch_size=batch_size,
  )


def create_single_silicon_observation(
    seed: int = 0,
    grid_columns: int = 20,
    with_image: bool = False,
    image_size: int = 128,
) -> md.MicroscopeObservation:
  """A real rendered host observation (reference test_utils:44-71)."""
  lattice = lattice_lib.make_lattice(grid_columns)
  config = simulator_lib.SimulatorConfig(
      grid_columns=grid_columns, image_size=image_size
  )
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(seed),
      lattice,
      config=config,
      batch_size=1,
      return_window=True,
      return_image=with_image,
  )
  return md.observation_from_device(
      obs.window, obs.fov, obs.elapsed_seconds, image=obs.image
  )
