"""Distributional equivalence of the multi-channel (D-dopant) KMC vs a
numpy oracle.

The single-dopant engine is oracle-tested in test_statistical_parity.py
against the reference law (graphene.py:646-694); this gives the
multi-dopant extension (kmc.apply_control_multi) the same treatment: a
plain-numpy multi-channel KMC — all D dopants' neighbor rates, one
exponential waiting time from the summed rate, one categorical
(dopant, neighbor) move per round, occupied-site moves masked — with its
own RNG, compared distributionally (KS tests), never bitwise.
"""

import jax
import numpy as np
import scipy.stats

from putting_dune_tpu import constants
from putting_dune_tpu import kmc
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib

LATTICE = lattice_lib.make_lattice(num_cols=20)
BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS
NUM_ENVS = 3000
DWELL = 15.0


def _simple_rates_np(neighbor_pos, beam_pos):
  """simple_canonical_rate_function (graphene.py:133-166) in numpy."""
  dist = np.linalg.norm(beam_pos - neighbor_pos, axis=-1) / BOND
  return 1.0 / ((dist * 4.0) ** 2 + 1.0)


def _oracle_multi_kmc(rng, si, beam, dwell, positions, neighbors):
  """Per-env multi-channel KMC loop in numpy (mirrors
  kmc.apply_control_multi semantics)."""
  si = list(si)
  d = len(si)
  elapsed = 0.0
  count = 0
  while True:
    rates = np.zeros((d, 3))
    nbr = np.stack([neighbors[s] for s in si])  # (D, 3)
    for i in range(d):
      rates[i] = _simple_rates_np(positions[nbr[i]], beam)
      for j in range(3):
        if nbr[i, j] in si:  # occupied-site mask
          rates[i, j] = 0.0
    total = rates.sum()
    wait = min(rng.exponential(1.0 / max(total, 1e-30)), 3600.0)
    elapsed += wait
    if elapsed > dwell:
      break
    flat = rates.reshape(-1)
    choice = rng.choice(d * 3, p=flat / total)
    si[choice // 3] = nbr[choice // 3, choice % 3]
    count += 1
  return si, count


def _setup():
  positions = np.asarray(LATTICE.positions)
  neighbors = np.asarray(LATTICE.neighbors)
  si0 = int(np.argmin(np.sum(positions**2, axis=1)))
  # Second dopant two hops away (neighbor's neighbor that isn't si0).
  nbr0 = neighbors[si0]
  second_ring = [s for s in neighbors[nbr0[0]] if s != si0]
  si1 = int(second_ring[0])
  # Beam on dopant 0's neighbor 1: strong rates for dopant 0, weak but
  # non-negligible for dopant 1 — both channels exercised.
  beam = positions[nbr0[1]]
  return positions, neighbors, (si0, si1), beam


def test_multi_dopant_kmc_matches_numpy_oracle():
  positions, neighbors, si_init, beam = _setup()

  # Batched device run: NUM_ENVS iid replicas.
  offset = np.zeros((NUM_ENVS, 2), np.float32)
  theta = np.zeros((NUM_ENVS,), np.float32)
  si_indices = np.tile(np.asarray(si_init, np.int32), (NUM_ENVS, 1))
  result = kmc.apply_control_multi(
      jax.random.PRNGKey(7),
      LATTICE,
      offset,
      theta,
      si_indices,
      np.tile(beam.astype(np.float32), (NUM_ENVS, 1)),
      np.full((NUM_ENVS,), DWELL, np.float32),
      rates_lib.simple_canonical_rates,
  )
  dev_counts = np.asarray(result.num_transitions)
  dev_sites = np.asarray(result.si_indices)  # (N, 2)

  rng = np.random.default_rng(123)
  ora_counts = np.zeros(NUM_ENVS, np.int64)
  ora_sites = np.zeros((NUM_ENVS, 2), np.int64)
  for i in range(NUM_ENVS):
    si, count = _oracle_multi_kmc(
        rng, si_init, beam, DWELL, positions, neighbors
    )
    ora_counts[i] = count
    ora_sites[i] = si

  # Both channels must actually fire in both implementations.
  assert (dev_sites[:, 0] != si_init[0]).mean() > 0.5
  assert (ora_sites[:, 0] != si_init[0]).mean() > 0.5

  # Transition-count distribution.
  _, p_counts = scipy.stats.ks_2samp(dev_counts, ora_counts)
  assert p_counts > 0.01, (
      f'count KS p={p_counts}; dev mean {dev_counts.mean():.2f} '
      f'vs oracle {ora_counts.mean():.2f}'
  )

  # Per-dopant displacement distributions (angstroms from the start site).
  for dopant in range(2):
    dev_disp = np.linalg.norm(
        positions[dev_sites[:, dopant]] - positions[si_init[dopant]],
        axis=-1,
    )
    ora_disp = np.linalg.norm(
        positions[ora_sites[:, dopant]] - positions[si_init[dopant]],
        axis=-1,
    )
    _, p = scipy.stats.ks_2samp(dev_disp, ora_disp)
    assert p > 0.01, (
        f'dopant {dopant} displacement KS p={p}; dev mean '
        f'{dev_disp.mean():.3f} vs oracle {ora_disp.mean():.3f}'
    )


def test_occupied_site_exclusion_matches_oracle():
  """Adjacent dopants: the move of one onto the other must be masked in
  both implementations — compare the frequency of the two dopants ending
  adjacent (a sensitive functional of the exclusion rule)."""
  positions = np.asarray(LATTICE.positions)
  neighbors = np.asarray(LATTICE.neighbors)
  si0 = int(np.argmin(np.sum(positions**2, axis=1)))
  si1 = int(neighbors[si0][0])  # directly bonded pair
  beam = (positions[si0] + positions[si1]) / 2.0  # between them

  n = 2000
  result = kmc.apply_control_multi(
      jax.random.PRNGKey(11),
      LATTICE,
      np.zeros((n, 2), np.float32),
      np.zeros((n,), np.float32),
      np.tile(np.asarray((si0, si1), np.int32), (n, 1)),
      np.tile(beam.astype(np.float32), (n, 1)),
      np.full((n,), 10.0, np.float32),
      rates_lib.simple_canonical_rates,
  )
  dev_sites = np.asarray(result.si_indices)
  assert (dev_sites[:, 0] != dev_sites[:, 1]).all()

  rng = np.random.default_rng(5)
  ora_adjacent = 0
  dev_adjacent = 0
  for i in range(n):
    si, _ = _oracle_multi_kmc(
        rng, (si0, si1), beam, 10.0, positions, neighbors
    )
    assert si[0] != si[1]
    ora_adjacent += int(si[1] in neighbors[si[0]])
    dev_adjacent += int(dev_sites[i, 1] in neighbors[dev_sites[i, 0]])
  p_ora = ora_adjacent / n
  p_dev = dev_adjacent / n
  se = np.sqrt(p_ora * (1 - p_ora) / n + p_dev * (1 - p_dev) / n)
  assert abs(p_ora - p_dev) < 4.0 * se + 0.02, (
      f'adjacency rate dev {p_dev:.3f} vs oracle {p_ora:.3f}'
  )
