"""Feature constructors: observation -> agent features, batched.

TPU-first rewrite of /root/reference/putting_dune/feature_constructors.py.
The per-step sklearn kNN fits disappear: the silicon's neighbors come from
the static lattice table and are already in the observation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Union

import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import geometry
from putting_dune_tpu import structures
from putting_dune_tpu.env import goals as goals_lib
from putting_dune_tpu.imaging import render as render_lib

Features = Union[jnp.ndarray, Dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
  shape: tuple[int, ...]
  dtype: type = np.float32


def _goal_delta_angstroms(
    obs: structures.MicroscopeObservation, goal: goals_lib.GoalState
) -> jnp.ndarray:
  """Goal minus silicon, material frame (reference :63-76)."""
  si_material = obs.fov.microscope_to_material(obs.si_position_microscope)
  return goal.position_material - si_material


@dataclasses.dataclass(frozen=True)
class SingleSiliconPristineGrapheneFeatures:
  """10-dim features in the microscope frame (reference :79-154).

  [si_xy (microscope), 3x normalized neighbor delta (microscope), goal
  delta (angstroms)].
  """

  requires_image: bool = False
  requires_window: bool = False

  def spec(self) -> FeatureSpec:
    return FeatureSpec((10,))

  def __call__(
      self,
      obs: structures.MicroscopeObservation,
      goal: goals_lib.GoalState,
  ) -> jnp.ndarray:
    deltas = (
        obs.neighbor_positions_microscope
        - obs.si_position_microscope[..., None, :]
    )  # (B, 3, 2)
    norms = jnp.linalg.norm(deltas, axis=-1, keepdims=True)
    normalized = deltas / jnp.maximum(norms, 1e-12)
    goal_delta = _goal_delta_angstroms(obs, goal)
    batch = obs.si_position_microscope.shape[0]
    return jnp.concatenate(
        [
            obs.si_position_microscope,
            normalized.reshape(batch, 6),
            goal_delta,
        ],
        axis=-1,
    ).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class SingleSiliconMaterialFrameFeatures:
  """10-dim features in the material frame (reference :157-228).

  [si_xy (angstroms), 3x raw neighbor delta (angstroms), goal delta
  (angstroms)].
  """

  requires_image: bool = False
  requires_window: bool = False

  def spec(self) -> FeatureSpec:
    return FeatureSpec((10,))

  def __call__(
      self,
      obs: structures.MicroscopeObservation,
      goal: goals_lib.GoalState,
  ) -> jnp.ndarray:
    si_material = obs.fov.microscope_to_material(obs.si_position_microscope)
    nbr_material = geometry.microscope_to_material(
        obs.neighbor_positions_microscope,
        obs.fov.lower_left[..., None, :],
        obs.fov.upper_right[..., None, :],
    )
    deltas = nbr_material - si_material[..., None, :]
    goal_delta = goal.position_material - si_material
    batch = si_material.shape[0]
    return jnp.concatenate(
        [si_material, deltas.reshape(batch, 6), goal_delta], axis=-1
    ).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class ImageFeatures:
  """{128x128x1 image, goal delta} dict features (reference :231-280).

  include_fov additionally exposes the instrument's BELIEVED field of view
  ('fov_lower_left'/'fov_upper_right', material-frame angstroms) — the
  microscope always knows its own scan settings (the reference's
  MicroscopeObservation.fov, microscope_utils.py:538-604); in-loop drift
  correctors need it to separate commanded FOV motion from stage drift.
  """

  image_size: int = 128
  include_fov: bool = False
  requires_image: bool = True
  requires_window: bool = False

  def spec(self) -> Dict[str, FeatureSpec]:
    spec = {
        'image': FeatureSpec((self.image_size, self.image_size, 1)),
        'goal_delta_angstroms': FeatureSpec((2,)),
    }
    if self.include_fov:
      spec['fov_lower_left'] = FeatureSpec((2,))
      spec['fov_upper_right'] = FeatureSpec((2,))
    return spec

  def __call__(
      self,
      obs: structures.MicroscopeObservation,
      goal: goals_lib.GoalState,
  ) -> Dict[str, jnp.ndarray]:
    if obs.image is None:
      raise ValueError('ImageFeatures requires an observation with an image.')
    image = obs.image
    if image.shape[-1] != self.image_size:
      image = render_lib.resize_bilinear(image, self.image_size)
    features = {
        'image': image[..., None].astype(jnp.float32),
        'goal_delta_angstroms': _goal_delta_angstroms(obs, goal).astype(
            jnp.float32
        ),
    }
    if self.include_fov:
      features['fov_lower_left'] = obs.fov.lower_left.astype(jnp.float32)
      features['fov_upper_right'] = obs.fov.upper_right.astype(jnp.float32)
    return features
