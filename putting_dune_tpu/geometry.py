"""Pure-JAX 2D geometry helpers.

TPU-first rewrite of the reference geometry module
(/root/reference/putting_dune/geometry.py:33-111). Instead of shapely points
and per-call sklearn kNN fits, everything here is a pure jnp function over
fixed-shape arrays, usable under jit/vmap on device. Frame conventions are
preserved exactly:

  * "material frame": absolute angstrom coordinates on the sheet.
  * "microscope frame": [0, 1]^2 normalized coordinates within the current
    field of view, (0, 0) = lower-left.
  * Angles measured CCW from the +x axis; rotations are CCW via a
    right-multiplied transposed rotation matrix.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp


def get_angles(coordinates: jnp.ndarray) -> jnp.ndarray:
  """Angle of each (x, y) row CCW from the +x axis, in radians.

  Parity: reference geometry.py:33-48.
  """
  return jnp.arctan2(coordinates[..., 1], coordinates[..., 0])


def rotate_coordinates(coords: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
  """Rotates (..., 2) coordinates by theta radians counter-clockwise.

  Right-multiplies by the transposed rotation matrix, matching the reference
  convention (geometry.py:51-66). theta broadcasts against coords[..., 0].
  """
  cos = jnp.cos(theta)
  sin = jnp.sin(theta)
  x = coords[..., 0]
  y = coords[..., 1]
  return jnp.stack([x * cos - y * sin, x * sin + y * cos], axis=-1)


def nearest_neighbors(
    atom_positions: jnp.ndarray,
    query: jnp.ndarray,
    k: int,
    *,
    include_self: bool = False,
    valid_mask: jnp.ndarray | None = None,
):
  """Top-k nearest neighbors under L2, jit-safe replacement for sklearn kNN.

  Parity: reference geometry.py:93-111 (nearest_neighbors3 == k=3).

  Args:
    atom_positions: (N, 2) candidate positions.
    query: (2,) or (Q, 2) query positions.
    k: number of neighbors to return (excluding self unless include_self).
    include_self: if False, the nearest point (assumed to be the query itself
      when the query is an atom) is dropped, exactly like the reference which
      fetches k+1 and strips column 0.
    valid_mask: optional (N,) bool; invalid rows are pushed to +inf distance.

  Returns:
    (distances, indices): each (Q, k), or (k,) for a single (2,) query.
  """
  single = query.ndim == 1
  q = query.reshape(-1, 2)
  deltas = q[:, None, :] - atom_positions[None, :, :]
  dist2 = jnp.sum(deltas * deltas, axis=-1)
  if valid_mask is not None:
    dist2 = jnp.where(valid_mask[None, :], dist2, jnp.inf)
  fetch = k + (0 if include_self else 1)
  neg_dist2, indices = jax.lax.top_k(-dist2, fetch)
  distances = jnp.sqrt(jnp.maximum(-neg_dist2, 0.0))
  if not include_self:
    distances = distances[:, 1:]
    indices = indices[:, 1:]
  if single:
    return distances.reshape(-1), indices.reshape(-1)
  return distances, indices


def nearest_neighbors3(
    atom_positions: jnp.ndarray,
    query: jnp.ndarray,
    *,
    include_self: bool = False,
    valid_mask: jnp.ndarray | None = None,
):
  """The 3 (4 including self) nearest neighbors for each query row."""
  return nearest_neighbors(
      atom_positions, query, 3, include_self=include_self,
      valid_mask=valid_mask,
  )


# --- Field-of-view frame transforms -----------------------------------------
# A FOV is described by lower_left/upper_right corners in the material frame.
# These are free functions (not methods) so they trivially jit/vmap; parity
# with microscope_utils.MicroscopeFieldOfView.{microscope,material}_frame_*
# (reference microscope_utils.py:344-500).


def microscope_to_material(
    point: jnp.ndarray, lower_left: jnp.ndarray, upper_right: jnp.ndarray
) -> jnp.ndarray:
  """Maps [0,1]^2 microscope coords to angstrom material coords.

  Shapes broadcast: point (..., 2), corners (..., 2).
  """
  scale = upper_right - lower_left
  return point * scale + lower_left


def material_to_microscope(
    point: jnp.ndarray, lower_left: jnp.ndarray, upper_right: jnp.ndarray
) -> jnp.ndarray:
  """Maps angstrom material coords to [0,1]^2 microscope coords."""
  scale = upper_right - lower_left
  return (point - lower_left) / scale
