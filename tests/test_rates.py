"""Rate-function parity tests against independent scipy/numpy oracles.

Each oracle below re-implements the reference math
(/root/reference/putting_dune/graphene.py:121-461) directly with
scipy.stats, so agreement demonstrates semantic parity without sharing code.
"""

import jax.numpy as jnp
import numpy as np
import scipy.stats

from putting_dune_tpu import constants
from putting_dune_tpu import rates as rates_lib

BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


def _random_geometry(rng, batch=4):
  si = rng.normal(size=(batch, 2)).astype(np.float32)
  angles = rng.uniform(0, 2 * np.pi, size=(batch,))
  base = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
  neighbors = np.stack(
      [
          si + BOND * _rot(base, 2 * np.pi * k / 3)
          for k in range(3)
      ],
      axis=1,
  ).astype(np.float32)
  beam = (si + rng.normal(scale=1.0, size=(batch, 2))).astype(np.float32)
  return si, neighbors, beam


def _rot(v, theta):
  rot = np.array(
      [[np.cos(theta), np.sin(theta)], [-np.sin(theta), np.cos(theta)]]
  )
  return v @ rot


def test_simple_canonical_rates_oracle():
  rng = np.random.default_rng(0)
  si, neighbors, beam = _random_geometry(rng)
  got = np.asarray(
      rates_lib.simple_canonical_rates(
          jnp.asarray(si), jnp.asarray(neighbors), jnp.asarray(beam)
      )
  )
  # Oracle: inverse-square falloff of beam-to-neighbor distance.
  dist = np.linalg.norm(beam[:, None, :] - neighbors, axis=-1) / BOND
  expected = 1.0 / ((4 * dist) ** 2 + 1.0)
  np.testing.assert_allclose(got, expected, rtol=1e-5)
  assert got.max() <= 1.0


def test_simple_canonical_max_rate_on_neighbor():
  si = jnp.zeros((1, 2))
  neighbors = jnp.asarray([[[BOND, 0.0], [-BOND, 0.0], [0.0, BOND]]])
  beam = jnp.asarray([[BOND, 0.0]])
  got = np.asarray(rates_lib.simple_canonical_rates(si, neighbors, beam))
  assert abs(got[0, 0] - 1.0) < 1e-6
  assert got[0, 1] < got[0, 0]


def test_prior_rates_oracle():
  rng = np.random.default_rng(1)
  si, neighbors, beam = _random_geometry(rng)
  got = np.asarray(
      rates_lib.prior_rates(
          jnp.asarray(si), jnp.asarray(neighbors), jnp.asarray(beam)
      )
  )
  # Oracle: reference HumanPriorRatePredictor.predict (graphene.py:191-229).
  mean = np.array([0.85, 0.0])
  cov = np.array([[0.1, 0.0], [0.0, 0.1]])
  max_rate = np.log(2) / 3
  norm = max_rate / scipy.stats.multivariate_normal.pdf(mean, mean, cov)
  expected = np.zeros((si.shape[0], 3))
  for b in range(si.shape[0]):
    rel = neighbors[b] - si[b]
    angles = np.arctan2(rel[:, 1], rel[:, 0])
    rel_beam = (beam[b] - si[b]) / BOND
    for i, angle in enumerate(angles):
      rotated_mean = _rot(mean, -angle)
      expected[b, i] = norm * scipy.stats.multivariate_normal.pdf(
          rel_beam, rotated_mean, cov
      )
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-7)


def test_prior_rates_peak_at_085_bonds():
  si = jnp.zeros((1, 2))
  neighbors = jnp.asarray([[[BOND, 0.0], [-BOND / 2, BOND], [-BOND / 2, -BOND]]])
  beam = jnp.asarray([[0.85 * BOND, 0.0]])
  got = np.asarray(rates_lib.prior_rates(si, neighbors, beam))
  assert abs(got[0, 0] - constants.SIGR_PRIOR_MAX_RATE) < 1e-6


def test_gmm_rates_oracle():
  rng = np.random.default_rng(2)
  gmm = rates_lib.GaussianMixtureRateFunction.sample_new(rng)
  si, neighbors, beam = _random_geometry(rng, batch=3)
  got = np.asarray(
      gmm(jnp.asarray(si), jnp.asarray(neighbors), jnp.asarray(beam))
  )

  # Oracle: reference GaussianMixtureRateFunction.__call__
  # (graphene.py:304-390) rebuilt with scipy.
  num_mixtures = len(gmm.mixture_weights)
  max_mode = 0.0
  for m in range(num_mixtures):
    p = scipy.stats.multivariate_normal.pdf(
        np.zeros(2), np.zeros(2), np.diag(gmm.variances[m])
    )
    max_mode = max(max_mode, p * gmm.mixture_weights[m])
  norm = gmm.max_rate / max_mode

  expected = np.zeros((3, 3))
  for b in range(3):
    delta = neighbors[b] - si[b]
    e1 = delta / np.linalg.norm(delta, axis=-1, keepdims=True)
    e2 = np.stack([-e1[:, 1], e1[:, 0]], axis=-1)
    for i in range(3):
      eig = np.stack([e1[i], e2[i]], axis=1)  # columns are eigenvectors
      rate = 0.0
      for m in range(num_mixtures):
        loc = si[b] + delta[i] * gmm.loc_distances[m]
        covm = eig @ np.diag(gmm.variances[m]) @ np.linalg.pinv(eig)
        p = scipy.stats.multivariate_normal.pdf(beam[b], loc, covm)
        rate += p * norm * gmm.mixture_weights[m]
      expected[b, i] = rate
  np.testing.assert_allclose(got, expected, rtol=2e-3, atol=1e-8)


def test_gmm_serialization_roundtrip(tmp_path):
  rng = np.random.default_rng(3)
  gmm = rates_lib.GaussianMixtureRateFunction.sample_new(rng)
  gmm.serialize_to_directory(str(tmp_path))
  loaded = rates_lib.GaussianMixtureRateFunction.deserialize_from_directory(
      str(tmp_path)
  )
  assert gmm == loaded


def test_prior_rates_reflection_parity_and_aligned_fix():
  """The reference prior peaks at the REFLECTED neighbor angle (quirk
  preserved bug-for-bug); prior_rates_aligned peaks at the neighbor."""
  a = np.deg2rad(120.0)
  si = jnp.zeros((1, 2))
  n0 = BOND * jnp.asarray([np.cos(a), np.sin(a)])
  neighbors = jnp.stack(
      [n0, BOND * jnp.asarray([1.0, 0.0]), BOND * jnp.asarray([0.0, -1.0])]
  )[None]
  beam_toward = (0.85 * n0)[None]
  beam_reflected = 0.85 * BOND * jnp.asarray([np.cos(-a), np.sin(-a)])[None]

  ref_toward = np.asarray(rates_lib.prior_rates(si, neighbors, beam_toward))
  ref_refl = np.asarray(rates_lib.prior_rates(si, neighbors, beam_reflected))
  assert ref_refl[0, 0] > 100 * ref_toward[0, 0]
  assert abs(ref_refl[0, 0] - constants.SIGR_PRIOR_MAX_RATE) < 1e-6

  fix_toward = np.asarray(
      rates_lib.prior_rates_aligned(si, neighbors, beam_toward)
  )
  assert abs(fix_toward[0, 0] - constants.SIGR_PRIOR_MAX_RATE) < 1e-6
