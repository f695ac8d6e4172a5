"""Real-microscope control loop: the hardware calls the agent.

Parity: /root/reference/putting_dune/microscope_agent.py:37-256. Control is
inverted relative to the RL env: the (real) microscope produces
MicroscopeObservation objects and asks the agent for the next beam
controls. On SiliconNotFoundError the agent issues a zero-dwell rescan at
(0, 0) (reference :72-83). MicroscopeAgentLogger records trajectories to
tfrecords plus step/episode CSVs (reference :124-256) without the wrapt
proxy dependency.
"""

from __future__ import annotations

import csv
import dataclasses
import datetime as dt
import os
from typing import List, Optional, Tuple

import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.io import records


# --- host-side adapters/features/goal over microscope_data ------------------
# The device env uses jitted batched components; the real-hardware loop works
# on ragged host observations, so these small host equivalents mirror the
# reference feature/goal/adapter math exactly.


class HostSingleSiliconGoal:
  """Host goal-reaching goal (reference goals.py:53-185)."""

  def __init__(self):
    self.goal_position_material_frame = np.zeros(2)
    self._consecutive_goal_steps = 0
    self.goal_range_angstroms = (0.1, 50.0)

  def reset(self, rng: np.random.Generator, obs: md.MicroscopeObservation):
    si = md.get_single_silicon_position(obs.grid)
    shifted = obs.grid.atom_positions - si
    scale = np.asarray([obs.fov.width, obs.fov.height])
    distances = np.linalg.norm(scale * shifted, axis=1)
    lo, hi = self.goal_range_angstroms
    valid = obs.grid.atom_positions[(distances > lo) & (distances < hi)]
    if valid.shape[0] == 0:
      raise RuntimeError("Couldn't find any valid goals.")
    goal = valid[rng.choice(valid.shape[0])]
    self.goal_position_material_frame = (
        obs.fov.microscope_frame_to_material_frame(goal)
    )
    self._consecutive_goal_steps = 0

  def calculate_reward_and_terminal(
      self, obs: md.MicroscopeObservation
  ) -> Tuple[float, bool, bool]:
    si = md.get_single_silicon_position(obs.grid)
    si_material = obs.fov.microscope_frame_to_material_frame(si)
    goal_distance = np.linalg.norm(
        si_material - self.goal_position_material_frame
    )
    if goal_distance < 0.5 * constants.CARBON_BOND_DISTANCE_ANGSTROMS:
      self._consecutive_goal_steps += 1
    else:
      self._consecutive_goal_steps = 0
    is_terminal = self._consecutive_goal_steps >= 1
    reward = (
        constants.GAMMA_PER_SECOND ** obs.elapsed_time.total_seconds()
        if is_terminal
        else 0.0
    )
    return reward, is_terminal, False


def host_material_frame_features(
    obs: md.MicroscopeObservation, goal: HostSingleSiliconGoal
) -> np.ndarray:
  """10-dim material-frame features (reference feature_constructors:157-228)."""
  grid = obs.fov.microscope_frame_to_material_frame(obs.grid)
  si = md.get_single_silicon_position(grid)
  d = np.linalg.norm(grid.atom_positions - si, axis=1)
  neighbor_idx = np.argsort(d, kind='stable')[1:4]
  deltas = grid.atom_positions[neighbor_idx] - si
  si_micro = md.get_single_silicon_position(obs.grid)
  si_material = obs.fov.microscope_frame_to_material_frame(si_micro)
  goal_delta = goal.goal_position_material_frame - si_material
  return np.concatenate([si, deltas.reshape(-1), goal_delta]).astype(
      np.float32
  )


def host_relative_material_adapter(
    obs: md.MicroscopeObservation,
    action: np.ndarray,
    dwell_seconds: float = 1.5,
) -> List[md.BeamControl]:
  """Material-frame relative action adapter (reference adapters :219-274)."""
  si = md.get_silicon_positions(obs.grid)
  if si.shape != (1, 2):
    raise RuntimeError(
        f'Expected one silicon; got shape {si.shape}.'
    )
  si_material = obs.fov.microscope_frame_to_material_frame(si.reshape(2))
  target = si_material + np.asarray(action[:2])
  position = np.clip(
      obs.fov.material_frame_to_microscope_frame(target), 0.0, 1.0
  )
  return [md.BeamControl(position, dt.timedelta(seconds=dwell_seconds))]


# --- the agent ---------------------------------------------------------------


class MicroscopeAgent:
  """Drives a policy from real microscope observations (reference :37-104).

  Built from a MicroscopeExperiment (registry): the experiment supplies the
  dm_env-style agent; features/goal/adapter run host-side on the ragged
  observation.
  """

  def __init__(self, rng: np.random.Generator, experiment):
    adapters_and_goal = experiment.get_adapters_and_goal()
    self.agent = experiment.get_agent(rng, adapters_and_goal)
    self.goal = HostSingleSiliconGoal()
    self._dwell_seconds = getattr(
        adapters_and_goal.action_adapter, 'min_dwell_seconds', 1.5
    )
    self._is_first_step = True

  def reset(
      self, rng: np.random.Generator, observation: md.MicroscopeObservation
  ) -> None:
    self.goal.reset(rng, observation)
    self._is_first_step = True

  def step(
      self, observation: md.MicroscopeObservation
  ) -> List[md.BeamControl]:
    """Returns the next beam controls for the hardware to apply."""
    import dm_env

    try:
      features = host_material_frame_features(observation, self.goal)
      reward, is_terminal, is_truncated = (
          self.goal.calculate_reward_and_terminal(observation)
      )
    except md.SiliconNotFoundError:
      # Rescan: zero-dwell control at the origin (reference :72-83).
      return [
          md.BeamControl(np.zeros(2), dt.timedelta(seconds=0.0))
      ]

    elapsed = observation.elapsed_time.total_seconds()
    discount = constants.GAMMA_PER_SECOND**elapsed
    if is_terminal:
      time_step = dm_env.termination(reward, features)
    elif is_truncated:
      time_step = dm_env.truncation(reward, features, discount)
    elif self._is_first_step:
      time_step = dm_env.restart(features)
    else:
      time_step = dm_env.transition(reward, features, discount)

    action = self.agent.step(time_step)
    self._is_first_step = False
    return host_relative_material_adapter(
        observation, np.asarray(action), self._dwell_seconds
    )


# --- logging wrapper ----------------------------------------------------------


@dataclasses.dataclass
class StepRecord:
  episode: int
  episode_step: int
  reward: float
  elapsed_seconds: float
  terminal: bool


@dataclasses.dataclass
class EpisodeRecord:
  episode: int
  episode_steps: int
  episode_return: float
  episode_goal: Optional[Tuple[float, float]]


class MicroscopeAgentLogger:
  """Records trajectories + step/episode CSVs (reference :124-256)."""

  def __init__(self, agent: MicroscopeAgent, *, logdir: str):
    self._agent = agent
    self._logdir = logdir
    os.makedirs(logdir, exist_ok=True)
    self._episode = 0
    self._episode_step = 0
    self._episode_return = 0.0
    self._current_trajectory: List[md.MicroscopeObservation] = []
    self._trajectories: List[md.Trajectory] = []
    self._step_records: List[StepRecord] = []
    self._episode_records: List[EpisodeRecord] = []

  def __getattr__(self, name):
    return getattr(self._agent, name)

  def __enter__(self) -> 'MicroscopeAgentLogger':
    return self

  def __exit__(self, exc_type, exc_val, exc_tb):
    if exc_type is None:
      self.flush()

  def _episode_record(self) -> EpisodeRecord:
    goal = self._agent.goal.goal_position_material_frame
    return EpisodeRecord(
        episode=self._episode,
        episode_steps=self._episode_step,
        episode_return=self._episode_return,
        episode_goal=(float(goal[0]), float(goal[1])),
    )

  def reset(self, rng, observation) -> None:
    if self._episode_step > 0:
      self._episode += 1
      self._episode_records.append(self._episode_record())
    if self._current_trajectory:
      self._trajectories.append(
          md.Trajectory(tuple(self._current_trajectory))
      )
    self._episode_step = 0
    self._episode_return = 0.0
    self._current_trajectory = []
    return self._agent.reset(rng, observation)

  def step(self, observation) -> List[md.BeamControl]:
    controls = self._agent.step(observation)
    try:
      reward, terminal, _ = self._agent.goal.calculate_reward_and_terminal(
          observation
      )
    except md.SiliconNotFoundError:
      reward, terminal = 0.0, False
    self._episode_step += 1
    self._episode_return += reward
    self._current_trajectory.append(observation)
    self._step_records.append(
        StepRecord(
            episode=self._episode,
            episode_step=self._episode_step,
            reward=reward,
            elapsed_seconds=observation.elapsed_time.total_seconds(),
            terminal=terminal,
        )
    )
    return controls

  def flush(self) -> None:
    if self._current_trajectory:
      self._trajectories.append(
          md.Trajectory(tuple(self._current_trajectory))
      )
      self._current_trajectory = []
    if self._episode_step != 0:
      self._episode_records.append(self._episode_record())

    records.write_records(
        os.path.join(self._logdir, 'trajectories.tfrecords'),
        self._trajectories,
    )
    for name, rows, cls in (
        ('steps.csv', self._step_records, StepRecord),
        ('episodes.csv', self._episode_records, EpisodeRecord),
    ):
      with open(os.path.join(self._logdir, name), 'w', newline='') as f:
        writer = csv.DictWriter(
            f, fieldnames=[fld.name for fld in dataclasses.fields(cls)]
        )
        writer.writeheader()
        for row in rows:
          writer.writerow(dataclasses.asdict(row))


# --- hardware-loop rehearsal rig ---------------------------------------------


class SimulatedMicroscope:
  """The drifting device simulator behind the host interface a real STEM
  exposes to MicroscopeAgent.

  Inverted control, like hardware: reset()/apply(controls) hand back
  md.MicroscopeObservation objects built from what the instrument would
  MEASURE — the drifted view's atoms in the believed FOV's microscope
  frame, plus the rendered frame when image_size is set. Lets the
  production composition (MicroscopeAgent + learned ImageAligner drift
  correction) be rehearsed end-to-end against known ground truth before
  touching hardware; truth accessors expose the sample-frame state the
  real instrument can never see.
  """

  def __init__(
      self,
      *,
      seed: int = 0,
      grid_columns: int = 50,
      drift_per_frame_angstroms: float = 0.0,
      image_size: Optional[int] = None,
      rate_fn=None,
  ):
    import jax

    from putting_dune_tpu import lattice as lattice_lib
    from putting_dune_tpu import rates as rates_lib
    from putting_dune_tpu import simulator as simulator_lib

    self._jax = jax
    self._simulator = simulator_lib
    self._lattice_lib = lattice_lib
    self._lattice = lattice_lib.make_lattice(grid_columns)
    self._config = simulator_lib.SimulatorConfig(
        grid_columns=grid_columns,
        image_size=image_size or 128,
        drift_per_frame_angstroms=drift_per_frame_angstroms,
    )
    self._with_image = image_size is not None
    self._rate_fn = rate_fn or rates_lib.simple_canonical_rates
    self._key = jax.random.PRNGKey(seed)

  def _split(self):
    self._key, k = self._jax.random.split(self._key)
    return k

  def _assert_has_been_reset(self, fn_name: str) -> None:
    """Guards post-reset methods (reference _assert_has_been_reset)."""
    if not hasattr(self, '_state'):
      raise RuntimeError(
          f'SimulatedMicroscope.{fn_name}() called before reset(); the'
          ' instrument must be reset first (reference simulator'
          ' _assert_has_been_reset semantics).'
      )

  def _host_observation(
      self, obs, controls: Tuple[md.BeamControl, ...] = ()
  ) -> md.MicroscopeObservation:
    window = obs.window
    mask = np.asarray(window.mask[0])
    positions = np.asarray(window.positions[0])[mask]
    numbers = np.asarray(window.atomic_numbers[0])[mask]
    image = None
    if self._with_image:
      image = np.asarray(obs.image)[0]
    return md.MicroscopeObservation(
        grid=md.AtomicGrid(positions, numbers),
        fov=md.MicroscopeFieldOfView(
            np.asarray(obs.fov.lower_left[0]).copy(),
            np.asarray(obs.fov.upper_right[0]).copy(),
        ),
        # The applied controls ride along in the post-step observation
        # (reference simulator.py:230-250 semantics) so the recorded
        # trajectory feeds trajectories_to_transitions -> train_rate_learner.
        controls=controls,
        elapsed_time=dt.timedelta(seconds=float(obs.elapsed_seconds[0])),
        image=image,
    )

  def reset(self) -> md.MicroscopeObservation:
    self._state, obs = self._simulator.reset(
        self._split(),
        self._lattice,
        config=self._config,
        batch_size=1,
        return_window=True,
        return_image=self._with_image,
    )
    return self._host_observation(obs)

  def apply(
      self, controls: List[md.BeamControl]
  ) -> md.MicroscopeObservation:
    """Applies the single control (one beam) and re-images.

    The device simulator step models one beam position per frame; rather
    than silently dropping extra controls (the reference step_and_image
    applies every control sequentially), a multi-control request fails
    loudly.
    """
    import jax.numpy as jnp

    from putting_dune_tpu import structures

    self._assert_has_been_reset('apply')
    if len(controls) != 1:
      raise ValueError(
          'SimulatedMicroscope models a single beam control per frame;'
          f' got {len(controls)} controls.'
      )
    control = controls[0]
    device_control = structures.BeamControl(
        position=jnp.asarray(
            np.asarray(control.position, np.float32).reshape(1, 2)
        ),
        dwell_seconds=jnp.asarray(
            [control.dwell_time.total_seconds()], jnp.float32
        ),
    )
    self._state, obs, _ = self._simulator.step(
        self._state,
        self._split(),
        device_control,
        self._lattice,
        self._rate_fn,
        config=self._config,
        return_window=True,
        return_image=self._with_image,
    )
    # Record a defensive copy: the caller owns (and may reuse) the control
    # buffer, but the observation must capture what was applied.
    recorded = md.BeamControl(
        np.asarray(control.position, dtype=float).copy(),
        control.dwell_time,
        voltage_kv=control.voltage_kv,
        current_na=control.current_na,
    )
    return self._host_observation(obs, controls=(recorded,))

  # Ground truth the real instrument can never see (rehearsal metrics).

  def true_silicon_position(self) -> np.ndarray:
    self._assert_has_been_reset('true_silicon_position')
    material = self._state.material
    return np.asarray(
        self._lattice_lib.site_position(
            self._lattice, material.si_index, material.offset,
            material.theta,
        )
    )[0]

  def true_drift(self) -> np.ndarray:
    self._assert_has_been_reset('true_drift')
    return np.asarray(self._state.drift)[0]
