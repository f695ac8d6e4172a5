"""Action adapters: agent action -> beam control, batched and functional.

TPU-first rewrite of /root/reference/putting_dune/action_adapters.py:29-274.
Each adapter is a small frozen config object with

    spec()                       -> ActionSpec (shape/bounds, host-side)
    init_state(batch)            -> per-env adapter state pytree (or None)
    to_controls(state, obs_bits, action) -> (new_state, BeamControl)

so adapters compose into the jitted env step. Default dwell is a fixed 1.5 s
unless the adapter exposes dwell-time control (3rd action dim), matching the
reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import geometry
from putting_dune_tpu import structures

DEFAULT_DWELL_SECONDS = 1.5


@dataclasses.dataclass(frozen=True)
class ActionSpec:
  """Bounded action spec (host-side mirror of dm_env specs.BoundedArray)."""

  shape: tuple[int, ...]
  minimum: tuple[float, ...] | float
  maximum: tuple[float, ...] | float
  dtype: type = np.float32


@dataclasses.dataclass(frozen=True)
class AdapterContext:
  """The pieces of the previous observation adapters may use.

  Attributes:
    si_position_microscope: (B, 2).
    fov: current field of view.
  """

  si_position_microscope: jnp.ndarray
  fov: structures.FieldOfView


def _dwell_from_action(
    action: jnp.ndarray,
    min_dwell: float,
    max_dwell: float,
) -> jnp.ndarray:
  """Maps optional 3rd action dim to dwell seconds (reference :183-191)."""
  if min_dwell == max_dwell:
    return jnp.full(action.shape[:-1], min_dwell, dtype=jnp.float32)
  frac = jnp.clip(action[..., 2], 0.0, 1.0)
  return frac * (max_dwell - min_dwell) + min_dwell


@dataclasses.dataclass(frozen=True)
class DirectActionAdapter:
  """Absolute [0,1]^2 beam placement (reference action_adapters.py:53-84)."""

  dwell_seconds: float = DEFAULT_DWELL_SECONDS

  def spec(self) -> ActionSpec:
    return ActionSpec((2,), 0.0, 1.0)

  def init_state(self, key, batch_size: int):
    del key, batch_size
    return None

  def to_controls(self, state, ctx: AdapterContext, action: jnp.ndarray):
    position = jnp.clip(action, 0.0, 1.0)
    dwell = jnp.full(action.shape[:-1], self.dwell_seconds, jnp.float32)
    return state, structures.BeamControl(position, dwell)


@dataclasses.dataclass(frozen=True)
class DeltaPositionActionAdapter:
  """Stateful beam moved by a clipped delta (reference :87-128).

  The beam position persists across steps and re-randomizes on reset.
  """

  dwell_seconds: float = DEFAULT_DWELL_SECONDS

  def spec(self) -> ActionSpec:
    return ActionSpec((2,), -0.1, 0.1)

  def init_state(self, key, batch_size: int):
    return jax.random.uniform(key, (batch_size, 2))

  def to_controls(self, state, ctx: AdapterContext, action: jnp.ndarray):
    beam = jnp.clip(state + action, 0.0, 1.0)
    dwell = jnp.full(action.shape[:-1], self.dwell_seconds, jnp.float32)
    return beam, structures.BeamControl(beam, dwell)


@dataclasses.dataclass(frozen=True)
class RelativeToSiliconActionAdapter:
  """Beam at silicon + action * max_distance (reference :131-216).

  The action is in units of max_distance_angstroms, converted to microscope
  coordinates through the FOV extent; an optional 3rd dim picks dwell time
  within [min_dwell, max_dwell].
  """

  min_dwell_seconds: float = DEFAULT_DWELL_SECONDS
  max_dwell_seconds: float = DEFAULT_DWELL_SECONDS
  max_distance_angstroms: float = constants.CARBON_BOND_DISTANCE_ANGSTROMS

  @property
  def fixed_dwell(self) -> bool:
    return self.min_dwell_seconds == self.max_dwell_seconds

  def spec(self) -> ActionSpec:
    if self.fixed_dwell:
      return ActionSpec((2,), -1.0, 1.0)
    return ActionSpec((3,), (-1.0, -1.0, 0.0), (1.0, 1.0, 1.0))

  def init_state(self, key, batch_size: int):
    del key, batch_size
    return None

  def to_controls(self, state, ctx: AdapterContext, action: jnp.ndarray):
    delta = jnp.clip(action[..., :2], -1.0, 1.0)
    extent = jnp.stack([ctx.fov.width, ctx.fov.height], axis=-1)
    cell_radius = self.max_distance_angstroms / extent
    position = jnp.clip(
        ctx.si_position_microscope + delta * cell_radius, 0.0, 1.0
    )
    dwell = _dwell_from_action(
        action, self.min_dwell_seconds, self.max_dwell_seconds
    )
    return state, structures.BeamControl(position, dwell)


@dataclasses.dataclass(frozen=True)
class RelativeToSiliconMaterialFrameActionAdapter(
    RelativeToSiliconActionAdapter
):
  """Beam at silicon + action angstroms (reference :219-274)."""

  def spec(self) -> ActionSpec:
    if self.fixed_dwell:
      # Material-frame actions are unbounded deltas in angstroms; the
      # reference reuses the parent's [-1, 1] spec but consumers (the greedy
      # agent) emit angstrom-scale values, so we widen the declared bounds.
      return ActionSpec((2,), -10.0, 10.0)
    return ActionSpec((3,), (-10.0, -10.0, 0.0), (10.0, 10.0, 1.0))

  def to_controls(self, state, ctx: AdapterContext, action: jnp.ndarray):
    si_material = ctx.fov.microscope_to_material(ctx.si_position_microscope)
    target = si_material + action[..., :2]
    position = jnp.clip(
        ctx.fov.material_to_microscope(target), 0.0, 1.0
    )
    dwell = _dwell_from_action(
        action, self.min_dwell_seconds, self.max_dwell_seconds
    )
    return state, structures.BeamControl(position, dwell)
