"""Goal sampling, reward and termination — batched and functional.

TPU-first rewrite of the reference SingleSiliconGoalReaching goal
(/root/reference/putting_dune/goals.py:53-185). The mutable goal object
becomes a (B,)-batched GoalState pytree plus two pure functions.
"""

from __future__ import annotations

from flax import struct
import jax
import jax.numpy as jnp

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import structures

# Goals are sampled on lattice atoms within this material-frame distance
# ring around the silicon (reference goals.py:63).
GOAL_RANGE_ANGSTROMS = (0.1, 50.0)
# Steps-at-goal needed to terminate (reference goals.py:60).
REQUIRED_CONSECUTIVE_GOAL_STEPS = 1


class GoalState(struct.PyTreeNode):
  """Batched goal bookkeeping.

  Attributes:
    position_material: (B, 2) goal position, angstroms.
    consecutive_goal_steps: (B,) int32.
  """

  position_material: jnp.ndarray
  consecutive_goal_steps: jnp.ndarray


class GoalReturn(struct.PyTreeNode):
  """Per-step goal outcome (reference goals.py:27-31), batched."""

  reward: jnp.ndarray
  is_terminal: jnp.ndarray
  is_truncated: jnp.ndarray


def sample_goal(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    material: structures.MaterialState,
    fov: structures.FieldOfView,
) -> GoalState:
  """Samples a goal atom uniformly from the FOV within the distance ring.

  Parity: reference goals.py:69-121 — candidate goals are atoms of the
  *initial observation* (i.e. inside the FOV) whose material-frame distance
  from the silicon lies in GOAL_RANGE_ANGSTROMS; one is chosen uniformly.
  """
  world = lattice_lib.world_positions(
      lattice, material.offset, material.theta
  )  # (B, N, 2)
  si_pos = lattice_lib.site_position(
      lattice, material.si_index, material.offset, material.theta
  )  # (B, 2)

  in_fov = jnp.all(
      (world >= fov.lower_left[..., None, :])
      & (world <= fov.upper_right[..., None, :]),
      axis=-1,
  )
  dist = jnp.linalg.norm(world - si_pos[..., None, :], axis=-1)
  lo, hi = GOAL_RANGE_ANGSTROMS
  valid = in_fov & (dist > lo) & (dist < hi)

  # Uniform choice among valid atoms via Gumbel-max over the mask.
  logits = jnp.where(valid, 0.0, -jnp.inf)
  goal_idx = jax.random.categorical(key, logits, axis=-1)  # (B,)
  goal_pos = jnp.take_along_axis(
      world, goal_idx[..., None, None], axis=-2
  )[..., 0, :]
  return GoalState(
      position_material=goal_pos,
      consecutive_goal_steps=jnp.zeros(
          material.si_index.shape, dtype=jnp.int32
      ),
  )


def reward_and_terminal(
    goal: GoalState,
    si_position_material: jnp.ndarray,
    elapsed_seconds: jnp.ndarray,
) -> tuple[GoalState, GoalReturn]:
  """Reward/termination update (reference goals.py:130-185).

  Terminal once the silicon has been within 0.5 bond lengths of the goal for
  REQUIRED_CONSECUTIVE_GOAL_STEPS consecutive steps; terminal reward is
  gamma ** elapsed_seconds, else 0.
  """
  goal_radius = constants.CARBON_BOND_DISTANCE_ANGSTROMS * 0.5
  goal_distance = jnp.linalg.norm(
      si_position_material - goal.position_material, axis=-1
  )
  at_goal = goal_distance < goal_radius
  consecutive = jnp.where(at_goal, goal.consecutive_goal_steps + 1, 0)
  is_terminal = consecutive >= REQUIRED_CONSECUTIVE_GOAL_STEPS
  reward = jnp.where(
      is_terminal,
      jnp.power(constants.GAMMA_PER_SECOND, elapsed_seconds),
      0.0,
  )
  new_goal = goal.replace(consecutive_goal_steps=consecutive)
  ret = GoalReturn(
      reward=reward,
      is_terminal=is_terminal,
      is_truncated=jnp.zeros_like(is_terminal),
  )
  return new_goal, ret
