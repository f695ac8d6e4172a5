"""Lattice generation + neighbor-table tests.

Mirrors the reference test strategy for graphene lattices
(reference graphene_test.py:41-88: scale/spacing checks).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib


BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


def test_hexagonal_grid_shape_and_spacing():
  coords = lattice_lib.hexagonal_grid_unit(num_cols=50)
  assert coords.shape[1] == 2
  # Every interior atom's nearest neighbor is at unit distance / sqrt(3)?
  # In this construction the bond length is 1/sqrt(3) of the column pitch:
  # check the minimum pairwise distance is constant across the sheet.
  d2 = np.sum((coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
  np.fill_diagonal(d2, np.inf)
  nearest = np.sqrt(d2.min(axis=1))
  assert np.allclose(nearest, nearest[0], atol=1e-6)


def test_canonical_positions_centered_and_scaled():
  pos = lattice_lib.canonical_graphene_positions(num_cols=30)
  assert np.allclose(pos.mean(axis=0), 0.0, atol=1e-9)
  d2 = np.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
  np.fill_diagonal(d2, np.inf)
  nearest = np.sqrt(d2.min(axis=1))
  # Bond distance parity (reference graphene_test checks lattice scale).
  assert np.allclose(nearest, BOND * nearest[0] / nearest[0], atol=1e-5)
  assert abs(np.median(nearest) - BOND) < 1e-5


def _interior_mask(pos: np.ndarray, margin: float) -> np.ndarray:
  lo = pos.min(axis=0) + margin
  hi = pos.max(axis=0) - margin
  return np.all((pos > lo) & (pos < hi), axis=1)


def test_neighbor_table_interior_atoms_are_bonded():
  pos = lattice_lib.canonical_graphene_positions(num_cols=20)
  table = lattice_lib.build_neighbor_table(pos)
  # Interior atoms (away from the rectangular sheet boundary): all 3
  # neighbors at bond length.
  interior = _interior_mask(pos, 2 * BOND)
  assert interior.sum() > 50
  for i in np.nonzero(interior)[0][:100]:
    dists = np.linalg.norm(pos[table[i]] - pos[i], axis=1)
    assert np.allclose(dists, BOND, atol=1e-4), (i, dists)


def test_neighbor_table_is_symmetric_for_interior():
  pos = lattice_lib.canonical_graphene_positions(num_cols=20)
  table = lattice_lib.build_neighbor_table(pos)
  interior = np.nonzero(_interior_mask(pos, 2 * BOND))[0]
  for i in interior[:50]:
    for j in table[i]:
      assert i in table[j]


def test_world_positions_rigid_transform():
  lattice = lattice_lib.make_lattice(num_cols=10)
  offset = jnp.asarray([[1.0, -2.0]])
  theta = jnp.asarray([0.7])
  world = lattice_lib.world_positions(lattice, offset, theta)
  assert world.shape == (1, lattice.num_atoms, 2)
  # Rigid: pairwise distances preserved.
  canon = np.asarray(lattice.positions)
  w = np.asarray(world[0])
  d_canon = np.linalg.norm(canon[0] - canon[10])
  d_world = np.linalg.norm(w[0] - w[10])
  assert abs(d_canon - d_world) < 1e-4


def test_site_position_matches_world_positions():
  lattice = lattice_lib.make_lattice(num_cols=10)
  offset = jnp.asarray([[0.3, 0.1], [-0.2, 0.5]])
  theta = jnp.asarray([1.1, 2.9])
  world = lattice_lib.world_positions(lattice, offset, theta)
  idx = jnp.asarray([5, 17], dtype=jnp.int32)
  single = lattice_lib.site_position(lattice, idx, offset, theta)
  np.testing.assert_allclose(
      np.asarray(single),
      np.asarray(world)[np.arange(2), np.asarray(idx)],
      rtol=1e-6,
  )
  # Multi-site gather: (B, 3) indices.
  idx3 = jnp.asarray([[1, 2, 3], [7, 8, 9]], dtype=jnp.int32)
  multi = lattice_lib.site_position(lattice, idx3, offset, theta)
  assert multi.shape == (2, 3, 2)
  np.testing.assert_allclose(
      np.asarray(multi)[0],
      np.asarray(world)[0, np.asarray(idx3)[0]],
      rtol=1e-6,
  )


def test_initial_silicon_index_nearest_origin():
  lattice = lattice_lib.make_lattice(num_cols=10)
  offset = jnp.zeros((3, 2))
  si = lattice_lib.initial_silicon_index(lattice, offset)
  pos = np.asarray(lattice.positions)
  expected = np.argmin(np.sum(pos**2, axis=1))
  assert np.all(np.asarray(si) == expected)


def test_default_lattice_size():
  lattice = lattice_lib.make_lattice(num_cols=50)
  # ~2/3 of a 50 x 57 mesh survives the honeycomb deletion.
  assert 1800 <= lattice.num_atoms <= 2000
