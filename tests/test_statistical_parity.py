"""Distributional equivalence: batched TPU KMC vs a reference-style
numpy KMC oracle (BASELINE.md: "transition-rate statistics matching the
reference CPU simulator").

The oracle re-implements the reference apply_control loop
(graphene.py:646-694) in plain numpy with its own RNG; agreement is
distributional (KS tests / frequency comparisons), not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from putting_dune_tpu import constants
from putting_dune_tpu import kmc
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib

LATTICE = lattice_lib.make_lattice(num_cols=20)
BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


def _prior_rates_np(si_pos, neighbor_pos, beam_pos):
  """Reference HumanPriorRatePredictor math in numpy (graphene.py:191-229)."""
  mean = np.array([0.85, 0.0])
  var = 0.1
  max_rate = np.log(2) / 3
  rel = neighbor_pos - si_pos
  angles = np.arctan2(rel[:, 1], rel[:, 0])
  rel_beam = (beam_pos - si_pos) / BOND
  rates = np.zeros(3)
  for i, a in enumerate(angles):
    c, s = np.cos(-a), np.sin(-a)
    rotated_mean = np.array(
        [mean[0] * c - mean[1] * s, mean[0] * s + mean[1] * c]
    )
    d2 = np.sum((rel_beam - rotated_mean) ** 2)
    rates[i] = max_rate * np.exp(-0.5 * d2 / var)
  return rates


def _oracle_kmc(rng, si_index, beam, dwell, positions, neighbors):
  """Reference-style per-env KMC while loop (graphene.py:646-694)."""
  elapsed = 0.0
  num_transitions = 0
  first_wait = None
  first_choice = None
  while elapsed < dwell:
    nbr_idx = neighbors[si_index]
    rates = _prior_rates_np(
        positions[si_index], positions[nbr_idx], beam
    )
    total = rates.sum()
    wait = min(rng.exponential(1.0 / total), 3600.0)
    if first_wait is None:
      first_wait = wait
    elapsed += wait
    if elapsed <= dwell:
      choice = rng.choice(3, p=rates / total)
      if first_choice is None:
        first_choice = choice
      si_index = nbr_idx[choice]
      num_transitions += 1
  return si_index, num_transitions, first_wait, first_choice


def test_transition_count_distribution_matches_oracle():
  positions = np.asarray(LATTICE.positions)
  neighbors = np.asarray(LATTICE.neighbors)
  si0 = int(np.argmin(np.sum(positions**2, axis=1)))
  # Beam offset at the prior peak of the reflected direction of neighbor 0
  # to get a healthy transition rate.
  nbr = positions[neighbors[si0]]
  rel0 = (nbr[0] - positions[si0]) / BOND
  angle0 = np.arctan2(rel0[1], rel0[0])
  beam = positions[si0] + 0.85 * BOND * np.asarray(
      [np.cos(-angle0), np.sin(-angle0)]
  )
  dwell = 20.0

  # Oracle: 2000 independent runs.
  rng = np.random.default_rng(0)
  oracle_counts = []
  oracle_waits = []
  oracle_first = []
  for _ in range(2000):
    _, n, w, c = _oracle_kmc(
        rng, si0, beam, dwell, positions, neighbors
    )
    oracle_counts.append(n)
    oracle_waits.append(w)
    if c is not None:
      oracle_first.append(c)

  # Batched engine: one call with B=2000.
  batch = 2000
  result = kmc.apply_control(
      jax.random.PRNGKey(1),
      LATTICE,
      jnp.zeros((batch, 2)),
      jnp.zeros((batch,)),
      jnp.full((batch,), si0, jnp.int32),
      jnp.tile(jnp.asarray(beam, jnp.float32)[None], (batch, 1)),
      jnp.full((batch,), dwell),
      rates_lib.prior_rates,
      record_events=1,
  )
  got_counts = np.asarray(result.num_transitions)
  got_first_times = np.asarray(result.event_times)[0]

  oracle_counts = np.asarray(oracle_counts)
  # Event-count distribution: means within joint standard error.
  se = np.sqrt(
      oracle_counts.var() / len(oracle_counts)
      + got_counts.var() / len(got_counts)
  )
  assert abs(oracle_counts.mean() - got_counts.mean()) < 5 * se, (
      oracle_counts.mean(), got_counts.mean()
  )
  # KS test on the count distributions.
  ks = scipy.stats.ks_2samp(oracle_counts, got_counts)
  assert ks.pvalue > 1e-3, (ks, oracle_counts.mean(), got_counts.mean())

  # First-event waiting-time distribution (conditioned on firing <= dwell).
  got_waits = got_first_times[np.isfinite(got_first_times)]
  oracle_first_waits = np.asarray(
      [w for w, n in zip(oracle_waits, oracle_counts) if n > 0]
  )
  ks_w = scipy.stats.ks_2samp(oracle_first_waits, got_waits)
  assert ks_w.pvalue > 1e-3, ks_w


def test_successor_frequencies_match_oracle():
  positions = np.asarray(LATTICE.positions)
  neighbors = np.asarray(LATTICE.neighbors)
  si0 = int(np.argmin(np.sum(positions**2, axis=1)))
  rng = np.random.default_rng(2)
  beam = positions[si0] + np.asarray([0.5, 0.9])
  dwell = 30.0

  oracle_first = []
  for _ in range(1500):
    _, n, _, c = _oracle_kmc(rng, si0, beam, dwell, positions, neighbors)
    if c is not None:
      oracle_first.append(neighbors[si0][c])

  batch = 1500
  result = kmc.apply_control(
      jax.random.PRNGKey(3),
      LATTICE,
      jnp.zeros((batch, 2)),
      jnp.zeros((batch,)),
      jnp.full((batch,), si0, jnp.int32),
      jnp.tile(jnp.asarray(beam, jnp.float32)[None], (batch, 1)),
      jnp.full((batch,), dwell),
      rates_lib.prior_rates,
      record_events=1,
  )
  got_first = np.asarray(result.event_sites)[0]
  got_first = got_first[got_first >= 0]

  # Compare first-successor frequencies over the 3 neighbors.
  oracle_first = np.asarray(oracle_first)
  freq_oracle = np.asarray(
      [(oracle_first == n).mean() for n in neighbors[si0]]
  )
  freq_got = np.asarray([(got_first == n).mean() for n in neighbors[si0]])
  np.testing.assert_allclose(freq_oracle, freq_got, atol=0.05)
  # And both match the analytic rate ratios.
  analytic = _prior_rates_np(
      positions[si0], positions[neighbors[si0]], beam
  )
  analytic = analytic / analytic.sum()
  np.testing.assert_allclose(freq_got, analytic, atol=0.05)
