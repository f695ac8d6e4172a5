"""Static graphene lattice generation and neighbor topology.

TPU-first design note: in the reference, the mutable AtomicGrid carries
per-atom positions and atomic numbers, and every rate evaluation re-fits an
sklearn kNN over all atoms (reference graphene.py:464-559, geometry.py:93-111).
Here we exploit two invariants of the physics:

  1. Transitions only *relabel* which site carries the silicon dopant
     (reference graphene.py:262-274); atom positions never move during an
     episode.
  2. Episode randomization is a rigid transform (random offset then rotation,
     reference graphene.py:533-559), which preserves the neighbor topology.

So the lattice is generated ONCE on the host: canonical positions (N, 2) and
a static (N, 3) nearest-neighbor table. Per-environment state is just
(offset, theta, si_index); world positions are recovered on demand as
``(canonical + offset) @ R(theta)``. This makes the KMC inner loop O(1) per
environment instead of O(N), which is what lets thousands of environments
batch on one chip.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import geometry


def hexagonal_grid_unit(num_cols: int = 50) -> np.ndarray:
  """Generates a unit-spacing hexagonal grid, shape (num_atoms, 2).

  Math parity with reference graphene.py:464-501 (_generate_hexagonal_grid):
  a num_cols x int(num_cols / (sqrt(3)/2)) rectangular mesh with alternating
  half-column shifts and every third site deleted, yielding the honeycomb.
  """
  ratio = np.sqrt(3.0) / 2.0
  num_rows = int(num_cols / ratio)

  coord_x, coord_y = np.meshgrid(
      np.arange(num_cols), np.arange(num_rows), indexing='xy'
  )
  coord_y = coord_y * ratio
  coord_x = coord_x.astype(np.float64)
  coord_x[1::2, :] += 0.5

  keep = np.ones((num_rows, num_cols), dtype=bool)
  keep[0::2, 0::3] = False
  keep[1::2, 1::3] = False

  coords = np.stack((coord_x[keep], coord_y[keep]), axis=1)
  return coords


def canonical_graphene_positions(num_cols: int = 50) -> np.ndarray:
  """Canonical centered graphene sheet in angstroms, shape (N, 2) float64."""
  positions = hexagonal_grid_unit(num_cols)
  positions = positions * constants.CARBON_BOND_DISTANCE_ANGSTROMS
  positions = positions - positions.mean(axis=0, keepdims=True)
  return positions


def build_neighbor_table(positions: np.ndarray, k: int = 3) -> np.ndarray:
  """Static (N, k) int32 table of each atom's k nearest neighbors.

  Computed once on the host with exact numpy distances; replaces the
  reference's per-step sklearn kNN fit (geometry.py:93-111). For interior
  honeycomb sites these are exactly the 3 covalently bonded neighbors; edge
  sites get their geometric nearest sites, matching reference kNN behavior.
  Ties (the 3 bonded neighbors are equidistant) are broken by index order,
  so the table is deterministic.
  """
  n = positions.shape[0]
  table = np.empty((n, k), dtype=np.int32)
  # Chunked exact kNN to bound memory (N ~ 2k => trivial).
  chunk = 512
  for start in range(0, n, chunk):
    stop = min(start + chunk, n)
    d2 = np.sum(
        (positions[start:stop, None, :] - positions[None, :, :]) ** 2, axis=-1
    )
    # Exclude self, then take k smallest (stable => index-order tie-break).
    rows = np.arange(start, stop)
    d2[np.arange(stop - start), rows] = np.inf
    idx = np.argsort(d2, axis=1, kind='stable')[:, :k]
    table[start:stop] = idx.astype(np.int32)
  return table


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: usable both
# as a traced pytree argument and inside static (hashable) env configs.
class Lattice:
  """Device-resident static lattice description (shared by every env).

  Attributes:
    positions: (N, 2) float32 canonical centered positions, angstroms.
    neighbors: (N, 3) int32 static nearest-neighbor table.
  """

  positions: jnp.ndarray
  neighbors: jnp.ndarray

  @property
  def num_atoms(self) -> int:
    return self.positions.shape[0]


@functools.lru_cache(maxsize=8)
def _build_lattice_host(num_cols: int) -> tuple[np.ndarray, np.ndarray]:
  positions = canonical_graphene_positions(num_cols)
  neighbors = build_neighbor_table(positions)
  return positions.astype(np.float32), neighbors


def make_lattice(num_cols: int = 50) -> Lattice:
  """Builds (and caches) the canonical lattice + neighbor table."""
  positions, neighbors = _build_lattice_host(num_cols)
  return Lattice(
      positions=jnp.asarray(positions), neighbors=jnp.asarray(neighbors)
  )


# --- Per-environment rigid transforms ---------------------------------------


def world_positions(
    lattice: Lattice, offset: jnp.ndarray, theta: jnp.ndarray
) -> jnp.ndarray:
  """All atom positions in the world (material) frame.

  offset: (..., 2); theta: (...,). Returns (..., N, 2). Matches reference
  generate_pristine_graphene order: center, add offset, then rotate
  (graphene.py:533-559).
  """
  shifted = lattice.positions + offset[..., None, :]
  return geometry.rotate_coordinates(shifted, theta[..., None])


def site_position(
    lattice: Lattice,
    site_index: jnp.ndarray,
    offset: jnp.ndarray,
    theta: jnp.ndarray,
) -> jnp.ndarray:
  """World position of specific site(s) — O(1) per site, no O(N) gather.

  site_index: (...,) or (..., K) int; offset (..., 2); theta (...,).
  Returns positions with shape site_index.shape + (2,).
  """
  canon = lattice.positions[site_index]  # (..., [K,] 2)
  extra_dims = site_index.ndim - theta.ndim
  th = theta.reshape(theta.shape + (1,) * extra_dims)
  off = offset.reshape(offset.shape[:-1] + (1,) * extra_dims + (2,))
  return geometry.rotate_coordinates(canon + off, th)


def initial_silicon_index(
    lattice: Lattice, offset: jnp.ndarray
) -> jnp.ndarray:
  """Index of the site nearest the world origin after the offset shift.

  Rotation preserves norms, so this only depends on the offset. Parity:
  reference graphene.py:590-594 (argmin of distance to origin).
  offset: (..., 2) -> int32 (...,).
  """
  shifted = lattice.positions + offset[..., None, :]
  d2 = jnp.sum(shifted * shifted, axis=-1)
  return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def canonical_graphene_with_centered_silicon(
    num_cols: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
  """Canonical sheet with the silicon site moved to the exact origin.

  Parity: reference graphene.py:504-530
  (canonical_pristine_graphene_with_centered_silicon) — positions are
  re-centered so the dopant (the site nearest the centroid) sits at (0, 0).

  Returns (positions (N, 2) float64, atomic_numbers (N,) int32).
  """
  positions = canonical_graphene_positions(num_cols)
  atomic_numbers = np.full(positions.shape[0], constants.CARBON, np.int32)
  si_idx = int(np.argmin(np.sum(positions**2, axis=1)))
  atomic_numbers[si_idx] = constants.SILICON
  positions = positions - positions[si_idx : si_idx + 1]
  return positions, atomic_numbers
