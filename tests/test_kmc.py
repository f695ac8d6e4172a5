"""KMC engine tests: invariants + statistical parity with the reference law.

Mirrors the reference strategy (graphene_test.py:192-281): constant-rate
mocks for structural invariants, statistical checks for stochastics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import kmc
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib


LATTICE = lattice_lib.make_lattice(num_cols=20)


def constant_rate_fn(value):
  def fn(si_pos, neighbor_pos, beam_pos):
    del beam_pos
    batch = si_pos.shape[0]
    return jnp.full((batch, 3), value)

  return fn


def _run(key, rate_fn, dwell, batch=64, si_index=None, record_events=0):
  offset = jnp.zeros((batch, 2))
  theta = jnp.zeros((batch,))
  if si_index is None:
    si_index = lattice_lib.initial_silicon_index(LATTICE, offset)
  beam = jnp.zeros((batch, 2))
  return kmc.apply_control(
      key,
      LATTICE,
      offset,
      theta,
      si_index,
      beam,
      jnp.full((batch,), dwell),
      rate_fn,
      record_events=record_events,
  )


def test_no_transitions_with_tiny_rates():
  # Total rate 3e-9 over 1.5 s => transition probability ~0.
  result = _run(jax.random.PRNGKey(0), constant_rate_fn(1e-9), 1.5)
  assert int(np.asarray(result.num_transitions).max()) == 0


def test_transitions_move_si_to_a_neighbor():
  key = jax.random.PRNGKey(1)
  offset = jnp.zeros((128, 2))
  si0 = lattice_lib.initial_silicon_index(LATTICE, offset)
  result = _run(key, constant_rate_fn(100.0), 1.5, batch=128)
  si0 = np.asarray(si0)
  si1 = np.asarray(result.si_index)
  counts = np.asarray(result.num_transitions)
  assert counts.min() >= 1  # rates are huge; everyone transitions.
  neighbors = np.asarray(LATTICE.neighbors)
  # Walk consistency: after k hops the site must be reachable; at minimum
  # the final site differs for odd hop counts on the bipartite lattice.
  bipartite_changed = (counts % 2 == 1) == (si1 != si0)
  # One-hop cases must land exactly on a neighbor.
  one_hop = counts == 1
  for b in np.nonzero(one_hop)[0]:
    assert si1[b] in neighbors[si0[b]]
  assert bipartite_changed[one_hop].all()


def test_high_rate_transitions_more_than_low_rate():
  # Reference graphene_test.py:241-281 statistical check.
  key = jax.random.PRNGKey(2)
  high = _run(key, constant_rate_fn(2.0), 1.5, batch=256)
  low = _run(key, constant_rate_fn(0.01), 1.5, batch=256)
  assert (
      np.asarray(high.num_transitions).mean()
      > np.asarray(low.num_transitions).mean()
  )


def test_event_count_matches_poisson_law():
  # With constant total rate L and dwell T, event count ~ Poisson(L*T).
  total_rate = 2.0  # per-neighbor 2/3
  dwell = 3.0
  lam = total_rate * dwell
  result = _run(
      jax.random.PRNGKey(3), constant_rate_fn(total_rate / 3), dwell,
      batch=4096,
  )
  counts = np.asarray(result.num_transitions)
  # Mean and variance both ~lam (Poisson), within 4 sigma.
  se_mean = np.sqrt(lam / counts.size)
  assert abs(counts.mean() - lam) < 4 * se_mean, counts.mean()
  assert abs(counts.var() - lam) < 0.2 * lam, counts.var()


def test_successor_choice_proportional_to_rates():
  # Fix unequal rates and a single transition window; the chosen neighbor
  # frequency must follow rates / total (reference graphene.py:679-688).
  weights = jnp.asarray([0.6, 0.3, 0.1])

  def fn(si_pos, neighbor_pos, beam_pos):
    del neighbor_pos, beam_pos
    batch = si_pos.shape[0]
    return jnp.broadcast_to(weights * 1000.0, (batch, 3))

  batch = 8192
  offset = jnp.zeros((batch, 2))
  si0 = np.asarray(lattice_lib.initial_silicon_index(LATTICE, offset))[0]
  result = _run(
      jax.random.PRNGKey(4), fn, 1e-3, batch=batch, record_events=1
  )
  first_site = np.asarray(result.event_sites)[0]
  fired = first_site >= 0
  assert fired.mean() > 0.5
  nbrs = np.asarray(LATTICE.neighbors)[si0]
  freqs = np.asarray(
      [(first_site[fired] == n).mean() for n in nbrs]
  )
  np.testing.assert_allclose(freqs, np.asarray(weights), atol=0.03)


def test_prior_rate_beam_targeting_works():
  # Place the beam 0.85 bonds toward a specific neighbor: that neighbor
  # should dominate transitions (integration of rates + KMC).
  batch = 512
  offset = jnp.zeros((batch, 2))
  theta = jnp.zeros((batch,))
  si = lattice_lib.initial_silicon_index(LATTICE, offset)
  si_pos = lattice_lib.site_position(LATTICE, si, offset, theta)
  target = LATTICE.neighbors[si][:, 0]
  target_pos = lattice_lib.site_position(LATTICE, target, offset, theta)
  beam = si_pos + 0.85 * (target_pos - si_pos) / 1.42 * 1.42

  result = kmc.apply_control(
      jax.random.PRNGKey(5),
      LATTICE,
      offset,
      theta,
      si,
      beam,
      jnp.full((batch,), 20.0),  # long dwell for many chances
      rates_lib.prior_rates,
      record_events=1,
  )
  first_site = np.asarray(result.event_sites)[0]
  fired = first_site >= 0
  assert fired.mean() > 0.8
  hit_target = (first_site[fired] == np.asarray(target)[fired]).mean()
  assert hit_target > 0.9, hit_target


def test_determinism_under_fixed_key():
  a = _run(jax.random.PRNGKey(6), constant_rate_fn(1.0), 1.5)
  b = _run(jax.random.PRNGKey(6), constant_rate_fn(1.0), 1.5)
  np.testing.assert_array_equal(
      np.asarray(a.si_index), np.asarray(b.si_index)
  )


def test_zero_dwell_is_a_noop():
  result = _run(jax.random.PRNGKey(7), constant_rate_fn(100.0), 0.0)
  assert int(np.asarray(result.num_transitions).max()) == 0


def test_waiting_time_clip_prevents_hangs():
  # Near-zero rates: the 3600 s clip must guarantee loop progress.
  result = _run(jax.random.PRNGKey(8), constant_rate_fn(1e-20), 10.0)
  assert int(np.asarray(result.num_transitions).max()) == 0


def test_multi_dopant_kmc():
  """Multi-channel KMC: dopants move, never collide, stats sane."""
  batch, dopants = 64, 3
  offset = jnp.zeros((batch, 2))
  theta = jnp.zeros((batch,))
  positions = np.asarray(LATTICE.positions)
  # Three well-separated dopants.
  idx0 = int(np.argmin(np.sum(positions**2, axis=1)))
  idx1 = int(np.argmin(np.sum((positions - 5.0) ** 2, axis=1)))
  idx2 = int(np.argmin(np.sum((positions + 5.0) ** 2, axis=1)))
  si = jnp.tile(jnp.asarray([[idx0, idx1, idx2]], jnp.int32), (batch, 1))
  beam = jnp.tile(
      jnp.asarray(positions[idx0], jnp.float32)[None], (batch, 1)
  )

  result = kmc.apply_control_multi(
      jax.random.PRNGKey(20),
      LATTICE,
      offset,
      theta,
      si,
      beam,
      jnp.full((batch,), 3.0),
      constant_rate_fn(1.0),
  )
  out = np.asarray(result.si_indices)
  # No two dopants ever share a site.
  for b in range(batch):
    assert len(set(out[b].tolist())) == dopants
  assert np.asarray(result.num_transitions).mean() > 1.0


def test_max_events_bounds_adversarial_rates_per_lane():
  """A misbehaving LEARNED rate fn (huge rates) cannot spin the batched
  while-loop: each lane stops at max_events and is flagged truncated,
  PER LANE — hot lanes cap out without holding well-behaved lanes in the
  loop, and cold lanes are never flagged."""
  batch = 8

  def adversarial(si_pos, neighbor_pos, beam_pos):
    del si_pos, neighbor_pos
    hot = beam_pos[:, :1] > 0.5  # lanes aimed at x > 0.5 emit 1e6 rates
    return jnp.where(hot, 1e6, 1e-9) * jnp.ones((batch, 3))

  offset = jnp.zeros((batch, 2))
  theta = jnp.zeros((batch,))
  si_index = lattice_lib.initial_silicon_index(LATTICE, offset)
  beam = jnp.zeros((batch, 2)).at[::2, 0].set(1.0)  # even lanes hot
  result = kmc.apply_control(
      jax.random.PRNGKey(7),
      LATTICE,
      offset,
      theta,
      si_index,
      beam,
      jnp.full((batch,), 1.5),
      adversarial,
      max_events=50,
  )
  counts = np.asarray(result.num_transitions)
  trunc = np.asarray(result.truncated)
  assert (counts[::2] == 50).all()  # hot lanes capped exactly
  assert trunc[::2].all()  # ...and flagged truncated
  assert (counts[1::2] == 0).all()  # cold lanes: no events fired
  assert not trunc[1::2].any()  # ...and never flagged


def test_max_events_unreachable_under_sane_rates():
  """The default-scale cap never perturbs physical simulations: results
  with and without the cap are identical under sane rates."""
  capped = _run(jax.random.PRNGKey(9), constant_rate_fn(1.0), 1.5)
  uncapped = kmc.apply_control(
      jax.random.PRNGKey(9),
      LATTICE,
      jnp.zeros((64, 2)),
      jnp.zeros((64,)),
      lattice_lib.initial_silicon_index(LATTICE, jnp.zeros((64, 2))),
      jnp.zeros((64, 2)),
      jnp.full((64,), 1.5),
      constant_rate_fn(1.0),
      max_events=10_000,
  )
  np.testing.assert_array_equal(
      np.asarray(capped.si_index), np.asarray(uncapped.si_index)
  )
  assert not np.asarray(uncapped.truncated).any()


def test_multi_dopant_max_events_cap():
  """apply_control_multi honors the same per-lane safety bound."""
  batch = 4
  offset = jnp.zeros((batch, 2))
  theta = jnp.zeros((batch,))
  positions = np.asarray(LATTICE.positions)
  idx0 = int(np.argmin(np.sum(positions**2, axis=1)))
  idx1 = int(np.argmin(np.sum((positions - 5.0) ** 2, axis=1)))
  si = jnp.tile(jnp.asarray([[idx0, idx1]], jnp.int32), (batch, 1))

  result = kmc.apply_control_multi(
      jax.random.PRNGKey(21),
      LATTICE,
      offset,
      theta,
      si,
      jnp.zeros((batch, 2)),
      jnp.full((batch,), 1.5),
      constant_rate_fn(1e6),
      max_events=30,
  )
  assert (np.asarray(result.num_transitions) == 30).all()
  assert np.asarray(result.truncated).all()
