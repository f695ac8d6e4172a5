"""Environment factory helpers.

Parity: /root/reference/putting_dune/run_helpers.py:27-153. The reference's
Acme-style wrapper classes collapse into EnvConfig options: step limiting is
native to the batched env (env.py), so create_putting_dune_env returns a
ready dm_env wrapper, and create_batched_env the device-native batched env.
"""

from __future__ import annotations

from typing import Optional

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.env import dm_env_wrapper
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.experiments import experiments as experiments_lib


def create_batched_env(
    get_adapters_and_goal: experiments_lib.AdaptersAndGoalConstructor,
    get_simulator_config: experiments_lib.SimulatorSpecConstructor,
    *,
    batch_size: int = 1,
    step_limit: Optional[int] = 600,
    grid_columns: int = 50,
    image_size: Optional[int] = None,
) -> env_lib.PuttingDuneEnv:
  """Builds the batched device-native environment from experiment parts.

  image_size overrides the rendered STEM frame resolution (default 512,
  matching the reference; feature constructors resize to their own size).
  Training at a lower render size is a large speedup for pixel policies.
  """
  adapters = get_adapters_and_goal()
  sim_spec = get_simulator_config()
  sim_config = simulator_lib.SimulatorConfig(
      grid_columns=grid_columns,
      image_duration_seconds=sim_spec.image_duration_seconds,
      drift_per_frame_angstroms=sim_spec.drift_per_frame_angstroms,
      **({'image_size': image_size} if image_size else {}),
  )
  return env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(grid_columns),
      rate_fn=sim_spec.rate_fn,
      adapter=adapters.action_adapter,
      features=adapters.feature_constructor,
      config=env_lib.EnvConfig(sim=sim_config, step_limit=step_limit),
      batch_size=batch_size,
  )


def create_putting_dune_env(
    seed: int,
    get_adapters_and_goal: experiments_lib.AdaptersAndGoalConstructor,
    get_simulator_config: experiments_lib.SimulatorSpecConstructor,
    *,
    simulator_step_limit: Optional[int] = 600,
    grid_columns: int = 50,
) -> dm_env_wrapper.DmEnvWrapper:
  """Single-env dm_env with a step limit (reference run_helpers.py:27-56)."""
  env = create_batched_env(
      get_adapters_and_goal,
      get_simulator_config,
      batch_size=1,
      step_limit=simulator_step_limit,
      grid_columns=grid_columns,
  )
  return dm_env_wrapper.DmEnvWrapper(env, seed=seed)
