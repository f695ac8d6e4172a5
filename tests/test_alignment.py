"""Classical alignment tests (reference alignment_test.py:25-160 style):
ICP recovers known shifts; scale estimation; merging; two-coloring.
"""

import numpy as np
import pytest

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.alignment import classical

BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


def _sheet(num_cols=14, scale=1.0, rng=None):
  pos = lattice_lib.canonical_graphene_positions(num_cols) * scale
  if rng is not None:
    pos = pos + rng.normal(scale=0.02, size=pos.shape)
  return pos


@pytest.mark.parametrize('scale', [0.8, 1.0, 1.3])
def test_scale_factor_estimation(scale):
  pos = _sheet(scale=scale)
  got = classical.get_graphene_scale_factor(pos)
  assert abs(got - scale) < 0.02 * scale


def test_get_offsets_recovers_constant_shift():
  rng = np.random.default_rng(0)
  pos = _sheet(rng=rng)
  shift = np.asarray([0.3, -0.2])
  offsets = classical.get_offsets(pos, pos + shift)
  np.testing.assert_allclose(offsets.mean(0), shift, atol=0.05)


def test_align_latest_recovers_shift():
  rng = np.random.default_rng(1)
  pos = _sheet(rng=rng)
  clusterer = classical.get_lattice_clusterer(pos)
  classes = classical.classify_lattice_types(pos, clusterer)
  true_shift = np.asarray([0.5, -0.4])
  new = pos - true_shift  # aligner must find +true_shift
  new_classes = classical.classify_lattice_types(new, clusterer)
  est = classical.align_latest(
      new, pos, new_classes, classes, iterations=30, mask_above=2.0
  )
  np.testing.assert_allclose(est, true_shift, atol=0.1)


def test_naive_merge_joins_close_points():
  a = np.asarray([[0.0, 0.0], [3.0, 0.0]])
  b = np.asarray([[0.1, 0.0], [6.0, 0.0]])
  merged, counts = classical.naive_merge([a, b], cutoff=0.7)
  assert merged.shape[0] == 3
  assert counts.tolist() == [2.0, 1.0, 1.0]
  np.testing.assert_allclose(merged[0], [0.05, 0.0], atol=1e-9)


def test_clique_merge_collapses_clusters():
  rng = np.random.default_rng(2)
  centers = np.asarray([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]])
  points = np.concatenate(
      [c + rng.normal(scale=0.1, size=(4, 2)) for c in centers]
  )
  merged, counts = classical.clique_merge(points, min_distance=1.0)
  assert merged.shape[0] == 3
  assert sorted(counts.tolist()) == [4.0, 4.0, 4.0]


def test_two_coloring_is_consistent_with_lattice():
  pos = _sheet()
  clusterer = classical.get_lattice_clusterer(pos)
  classes = classical.classify_lattice_types(pos, clusterer)
  assert set(np.unique(classes)).issubset({0, 1})
  # Bonded neighbors must have opposite classes (interior atoms).
  d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
  interior = np.all(
      (pos > pos.min(0) + 2 * BOND) & (pos < pos.max(0) - 2 * BOND), axis=1
  )
  bonded = (d > 1e-6) & (d < BOND * 1.1)
  violations = 0
  total = 0
  for i in np.nonzero(interior)[0]:
    for j in np.nonzero(bonded[i])[0]:
      total += 1
      violations += classes[i] == classes[j]
  assert total > 0
  assert violations / total < 0.05, (violations, total)


def test_propagate_atomic_numbers():
  original = np.asarray([[0.0, 0.0], [2.0, 0.0]])
  merged = np.asarray([[0.05, 0.0], [2.05, 0.0], [9.0, 9.0]])
  numbers = np.asarray([14, 6])
  out = classical.propagate_atomic_numbers(original, merged, numbers)
  assert out.tolist() == [14, 6, 6]


def test_iterative_alignment_filtering_recovers_single_shift():
  rng = np.random.default_rng(3)
  base = _sheet()
  aligner = classical.IterativeAlignmentFiltering(history_length=5)
  aligner(md.AtomicGrid(base, np.full(base.shape[0], 6)))  # seed history

  drift = np.asarray([0.25, -0.15])
  observed = base - drift + rng.normal(scale=0.02, size=base.shape)
  merged, minus_drift = aligner(
      md.AtomicGrid(observed, np.full(base.shape[0], 6))
  )
  # The aligner shifts the observation by +drift to match the history and
  # reports the negative (reference alignment.py:733).
  np.testing.assert_allclose(minus_drift, -drift, atol=0.08)
  # Merging aligned clouds must not inflate the atom count much.
  assert merged.num_atoms < base.shape[0] * 1.2


def test_iterative_alignment_filtering_long_sequence_stays_coherent():
  rng = np.random.default_rng(4)
  base = _sheet()
  aligner = classical.IterativeAlignmentFiltering(history_length=4)
  n = base.shape[0]
  merged = None
  cumulative = np.zeros(2)
  for _ in range(6):
    cumulative += rng.normal(scale=0.1, size=2)  # random-walk drift
    observed = base + cumulative + rng.normal(scale=0.02, size=base.shape)
    merged, _ = aligner(md.AtomicGrid(observed, np.full(n, 6)))
  # If alignment works, merged cloud stays ~the same lattice (no doubling).
  assert merged.num_atoms < n * 1.3, merged.num_atoms


def test_pad_and_crop_images_by_fov_shift():
  image = np.zeros((100, 100, 1), np.float32)
  image[40:60, 40:60] = 1.0  # bright square at the center
  fov = md.MicroscopeFieldOfView(np.zeros(2), np.full(2, 10.0))
  # New FOV shifted +2 A in x: the square should move LEFT in the image.
  new_fov = fov.shift(np.asarray([2.0, 0.0]))
  out = classical.pad_and_crop_images_by_fov(image, fov, new_fov)
  assert out.shape == image.shape
  ys, xs, _ = np.nonzero(out > 0.5)
  assert abs(xs.mean() - (50 - 20)) < 2  # 2 A = 20 px
  assert abs(ys.mean() - 50) < 2
