"""Geometry parity tests (reference geometry_test.py:25-55 style)."""

import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import geometry


def test_get_angles_cardinal_directions():
  coords = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
  angles = np.asarray(geometry.get_angles(coords))
  np.testing.assert_allclose(
      angles, [0.0, np.pi / 2, np.pi, -np.pi / 2], atol=1e-6
  )


def test_rotate_coordinates_quarter_turn():
  coords = jnp.asarray([[1.0, 0.0]])
  rotated = geometry.rotate_coordinates(coords, jnp.pi / 2)
  np.testing.assert_allclose(np.asarray(rotated), [[0.0, 1.0]], atol=1e-6)


def test_rotate_matches_reference_matrix_convention():
  # Reference right-multiplies by [[c, s], [-s, c]] (geometry.py:51-66).
  rng = np.random.default_rng(0)
  coords = rng.normal(size=(7, 2)).astype(np.float32)
  theta = 0.37
  rot = np.array(
      [[np.cos(theta), np.sin(theta)], [-np.sin(theta), np.cos(theta)]],
      dtype=np.float32,
  )
  expected = coords @ rot
  got = np.asarray(geometry.rotate_coordinates(jnp.asarray(coords), theta))
  np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rotate_batched_theta_broadcast():
  coords = jnp.ones((4, 3, 2))
  theta = jnp.linspace(0.0, 1.0, 4)[:, None]  # (4, 1) against (4, 3)
  out = geometry.rotate_coordinates(coords, theta)
  assert out.shape == (4, 3, 2)


def test_nearest_neighbors3_matches_bruteforce():
  rng = np.random.default_rng(1)
  pts = rng.normal(size=(50, 2)).astype(np.float32)
  query = pts[13]
  dist, idx = geometry.nearest_neighbors3(jnp.asarray(pts), jnp.asarray(query))
  d = np.linalg.norm(pts - query, axis=1)
  expected = np.argsort(d)[1:4]  # drop self
  np.testing.assert_array_equal(np.sort(np.asarray(idx)), np.sort(expected))
  np.testing.assert_allclose(np.sort(np.asarray(dist)), np.sort(d[expected]),
                             rtol=1e-5)


def test_nearest_neighbors_include_self():
  pts = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
  dist, idx = geometry.nearest_neighbors(pts, pts[0], 2, include_self=True)
  assert np.asarray(idx)[0] == 0
  assert np.asarray(dist)[0] == 0.0


def test_frame_transforms_roundtrip():
  lower = jnp.asarray([-5.0, -3.0])
  upper = jnp.asarray([5.0, 7.0])
  p = jnp.asarray([[0.25, 0.5], [1.0, 0.0]])
  material = geometry.microscope_to_material(p, lower, upper)
  np.testing.assert_allclose(
      np.asarray(material), [[-2.5, 2.0], [5.0, -3.0]], atol=1e-6
  )
  back = geometry.material_to_microscope(material, lower, upper)
  np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-6)
