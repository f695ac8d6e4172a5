"""Agents for Putting Dune, TPU-first.

Two layers, mirroring the framework's two entry points:

  * Batched pure policies — `policy(key, observation) -> action` jnp
    functions that jit/vmap and compose into fully-device rollouts
    (the primary API; this is what hits >1M env steps/sec).
  * Host Agent classes with the reference's dm_env step() interface
    (/root/reference/putting_dune/agents/agent_lib.py:32-186) for
    single-env dm_env compatibility and the real-microscope loop.
"""

from __future__ import annotations

import abc
import enum
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import geometry

# Beam offset (angstroms, for a neighbor toward +x) that the greedy
# controller targets when no transition function is supplied: directly on
# the neighbor (reference agents/agent_lib.py:103).
DEFAULT_GREEDY_ARGMAX = (1.42, 0.0)


@enum.unique
class AgentMode(enum.Enum):
  TRAIN = 'train'
  EVAL = 'eval'


# --- Batched pure policies ---------------------------------------------------


def uniform_random_policy(
    key: jax.Array,
    observation: jnp.ndarray,
    *,
    low: float | jnp.ndarray = -1.0,
    high: float | jnp.ndarray = 1.0,
    action_dim: int = 2,
) -> jnp.ndarray:
  """Uniform random actions, (B, action_dim)."""
  batch = jax.tree_util.tree_leaves(observation)[0].shape[0]
  return jax.random.uniform(
      key, (batch, action_dim), minval=low, maxval=high
  )


def greedy_policy(
    key: Optional[jax.Array],
    observation: jnp.ndarray,
    *,
    argmax: tuple[float, float] = DEFAULT_GREEDY_ARGMAX,
    fixed_offset: tuple[float, float] = (0.0, 0.0),
    position_noise_sigma: float = 0.0,
) -> jnp.ndarray:
  """Greedy controller over 10-dim material-frame features.

  Parity: reference GreedyAgent.step (agents/agent_lib.py:163-183). Picks
  the neighbor whose delta best matches the goal delta, then places the beam
  at `argmax` (+noise, +offset) rotated to that neighbor's angle. Expects
  SingleSiliconMaterialFrameFeatures and the material-frame relative action
  adapter.

  Args:
    key: PRNG key for position noise (may be None when sigma == 0).
    observation: (B, 10) features.
    argmax: canonical beam offset for a neighbor toward +x, angstroms.
    fixed_offset: extra offset added to argmax.
    position_noise_sigma: stddev of Gaussian beam-position noise.

  Returns:
    (B, 2) actions: beam deltas from the silicon, angstroms.
  """
  batch = observation.shape[0]
  neighbor_deltas = observation[:, 2:8].reshape(batch, 3, 2)
  goal_delta = observation[:, 8:10]

  scores = jnp.linalg.norm(
      neighbor_deltas - goal_delta[:, None, :], axis=-1
  )
  best = jnp.argmin(scores, axis=-1)  # (B,)
  angles = geometry.get_angles(neighbor_deltas)  # (B, 3)
  angle = jnp.take_along_axis(angles, best[:, None], axis=-1)[:, 0]

  beam = jnp.asarray(argmax, jnp.float32) + jnp.asarray(
      fixed_offset, jnp.float32
  )
  beam = jnp.broadcast_to(beam, (batch, 2))
  if position_noise_sigma > 0.0:
    if key is None:
      raise ValueError('position_noise_sigma > 0 requires a PRNG key.')
    beam = beam + position_noise_sigma * jax.random.normal(key, (batch, 2))
  return geometry.rotate_coordinates(beam, angle)


def find_argmax(
    transition_function: Callable[[np.ndarray], np.ndarray],
    resolution: float = 0.05,
    low: float = -5.0,
    high: float = 5.0,
) -> np.ndarray:
  """Grid-search argmax of a transition function (reference :136-161).

  Finds the beam offset maximizing the rate of transitioning to a neighbor
  at (bond, 0). The function may be numpy or jax; evaluated in one batch.
  """
  num_points = int((high - low) // resolution)
  pts = np.linspace(low, high, num_points, dtype=np.float32)
  xx = np.tile(pts[None], (num_points, 1))
  yy = np.tile(pts[:, None], (1, num_points))
  points = np.stack([xx, yy], axis=-1).reshape(-1, 2)
  probs = np.stack([np.asarray(transition_function(p)) for p in points], 0)
  return points[np.argmax(probs[..., 0], axis=-1)]


# --- Host dm_env-style agents ------------------------------------------------


class Agent(abc.ABC):
  """dm_env-facing agent interface (reference agents/agent_lib.py:32-51)."""

  @abc.abstractmethod
  def step(self, time_step) -> np.ndarray:
    """Returns an action for the latest TimeStep."""

  @abc.abstractmethod
  def set_mode(self, mode: AgentMode) -> None:
    """Sets train/eval mode."""


class UniformRandomAgent(Agent):
  """Uniform random actions (reference :54-78)."""

  def __init__(
      self,
      rng: np.random.Generator,
      low: Union[float, np.ndarray],
      high: Union[float, np.ndarray],
      size: Sequence[int],
  ):
    self._rng = rng
    self._low = low
    self._high = high
    self._size = tuple(size)

  def step(self, time_step) -> np.ndarray:
    del time_step
    return self._rng.uniform(self._low, self._high, self._size)

  def set_mode(self, mode: AgentMode) -> None:
    pass


class GreedyAgent(Agent):
  """Greedy controller (reference :81-186), host wrapper over greedy_policy.

  Must be used with material-frame features + the material-frame relative
  action adapter.
  """

  def __init__(
      self,
      rng: Optional[np.random.Generator] = None,
      transition_function: Optional[
          Callable[[np.ndarray], np.ndarray]
      ] = None,
      argmax: Optional[np.ndarray] = np.asarray(DEFAULT_GREEDY_ARGMAX),
      argmax_resolution: float = 0.05,
      position_noise_sigma: float = 0.0,
      fixed_offset: np.ndarray = np.zeros(2, dtype=np.float32),
      low: float = -5.0,
      high: float = 5.0,
  ):
    self._rng = rng if rng is not None else np.random.default_rng()
    self._position_noise_sigma = position_noise_sigma
    self._fixed_offset = np.asarray(fixed_offset, np.float32)
    if transition_function is not None:
      self._argmax = find_argmax(
          transition_function, argmax_resolution, low, high
      )
    elif argmax is not None:
      self._argmax = np.asarray(argmax, np.float32)
    else:
      raise ValueError('One of transition_function or argmax must be set.')

  def step(self, time_step) -> np.ndarray:
    obs = np.asarray(time_step.observation, np.float32).reshape(1, 10)
    key = None
    if self._position_noise_sigma > 0.0:
      key = jax.random.PRNGKey(int(self._rng.integers(2**31)))
    action = greedy_policy(
        key,
        jnp.asarray(obs),
        argmax=tuple(self._argmax.tolist()),
        fixed_offset=tuple(self._fixed_offset.tolist()),
        position_noise_sigma=self._position_noise_sigma,
    )
    return np.asarray(action)[0]

  def set_mode(self, mode: AgentMode) -> None:
    pass
