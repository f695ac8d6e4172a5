"""Multi-dopant vision planner: peak extraction, position-order anchor
semantics, and the pixels-to-control policy (agents/vision_planner.py
multi_dopant_vision_planner_policy + env/multi_dopant.py anchor_order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import planner as planner_lib
from putting_dune_tpu.agents import vision_planner as vp
from putting_dune_tpu.env import multi_dopant

BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS
S = 128


def _blob(x, y, cx, cy, sigma=1.6):
  return np.exp(-0.5 * ((x - cx) ** 2 + (y - cy) ** 2) / sigma**2)


def _pixel_grids():
  xs = np.arange(S) + 0.5
  x = np.tile(xs[None, :], (S, 1))
  y = np.tile((S - xs)[:, None], (1, S))
  return x, y


def test_extract_peaks_recovers_separated_blobs():
  x, y = _pixel_grids()
  truth = np.array([[40.3, 80.6], [75.9, 30.2], [100.4, 90.8]])
  p = sum(_blob(x, y, cx, cy) for cx, cy in truth)
  peaks = vp.extract_peaks(
      jnp.asarray(p[None], jnp.float32), 3, min_separation_px=8.0
  )
  got = np.asarray(peaks[0])
  # Match each truth point to its nearest extraction (order-free).
  for t in truth:
    err = np.min(np.linalg.norm(got - t, axis=-1))
    assert err < 0.5, (t, got)


def test_extract_peaks_close_pair():
  """Two blobs one suppression radius apart stay distinct."""
  x, y = _pixel_grids()
  truth = np.array([[60.0, 60.0], [69.0, 62.0]])
  p = sum(_blob(x, y, cx, cy) for cx, cy in truth)
  peaks = np.asarray(
      vp.extract_peaks(
          jnp.asarray(p[None], jnp.float32), 2, min_separation_px=8.0
      )[0]
  )
  d = np.linalg.norm(peaks[0] - peaks[1])
  assert d > 6.0, peaks
  for t in truth:
    assert np.min(np.linalg.norm(peaks - t, axis=-1)) < 1.0


def _make_env(anchor_order, observation_mode='vector', num_dopants=2):
  return multi_dopant.MultiDopantEnv(
      lattice=lattice_lib.make_lattice(30),
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=8,
      num_dopants=num_dopants,
      dwell_seconds=5.0,
      observation_mode=observation_mode,
      anchor_order=anchor_order,
  )


def test_position_anchor_order_is_lexicographic():
  env = _make_env('position')
  state, ts = env.reset(jax.random.PRNGKey(0))
  si = np.asarray(env._si_positions(state))  # (B, D, 2)
  pick = np.asarray(env._anchor_index(state, jnp.asarray(si)))
  key = si[..., 0] * 4096.0 + si[..., 1]
  np.testing.assert_array_equal(pick, np.argmin(key, axis=-1))

  # Observations are listed in that same order: per-dopant [x, y] blocks
  # sorted by the lexicographic key.
  obs = np.asarray(ts.observation).reshape(8, 2, 4)
  order = np.argsort(key, axis=-1)
  np.testing.assert_allclose(
      obs[..., 0:2],
      np.take_along_axis(si, order[..., None], axis=1),
      atol=1e-5,
  )


def test_position_anchor_skips_latched():
  env = _make_env('position')
  state, _ = env.reset(jax.random.PRNGKey(1))
  si = env._si_positions(state)
  key = np.asarray(si[..., 0] * 4096.0 + si[..., 1])
  first = np.argmin(key, axis=-1)
  latched = np.zeros((8, 2), bool)
  latched[np.arange(8), first] = True  # latch the lexicographic-first
  state = state.replace(latched=jnp.asarray(latched))
  pick = np.asarray(env._anchor_index(state, si))
  np.testing.assert_array_equal(pick, 1 - first)


def _multi_si_honeycomb(si_list, bond_px, theta0):
  """Full honeycomb maps with len(si_list) silicon sites. si_list entries
  are (xy, sublattice): 'A' sites have neighbors at theta0 + 120k deg,
  'B' at theta0 + 60 + 120k deg."""
  x, y = _pixel_grids()
  c, s = np.cos(theta0), np.sin(theta0)
  rot = np.array([[c, -s], [s, c]])
  a1 = rot @ (bond_px * np.array([1.5, np.sqrt(3) / 2]))
  a2 = rot @ (bond_px * np.array([1.5, -np.sqrt(3) / 2]))
  d = rot @ (bond_px * np.array([1.0, 0.0]))
  origin = np.asarray(si_list[0][0])
  if si_list[0][1] == 'B':
    origin = origin - d
  si_xy = []
  for xy, sub in si_list:
    si_xy.append(np.asarray(xy, np.float64))
  p_c = np.zeros((S, S))
  p_si = np.zeros((S, S))
  n = int(S / bond_px) + 2
  for n1 in range(-n, n + 1):
    for n2 in range(-n, n + 1):
      base = origin + n1 * a1 + n2 * a2
      for site in (base, base + d):
        if not (-5 < site[0] < S + 5 and -5 < site[1] < S + 5):
          continue
        if any(np.linalg.norm(site - sxy) < 0.25 for sxy in si_xy):
          p_si += _blob(x, y, site[0], site[1])
        else:
          p_c += _blob(x, y, site[0], site[1])
  return np.clip(p_si, 0, 1), np.clip(p_c, 0, 1)


@pytest.mark.parametrize('theta0', [0.15, -0.8])
def test_multi_dopant_vision_policy_matches_truth_planner(theta0):
  """With ideal detector maps, the vision policy's action for the anchor
  matches the planner given ground-truth geometry."""
  bond_px = 9.0
  c, s = np.cos(theta0), np.sin(theta0)
  rot = np.array([[c, -s], [s, c]])
  a1 = rot @ (bond_px * np.array([1.5, np.sqrt(3) / 2]))
  d = rot @ (bond_px * np.array([1.0, 0.0]))
  # Anchor (A sublattice, lexicographically FIRST) + a second dopant on
  # the B sublattice a few cells away.
  si_a = np.array([52.0, 61.0])
  si_b = si_a + 3 * a1 + d
  p_si, p_c = _multi_si_honeycomb(
      [(si_a, 'A'), (si_b, 'B')], bond_px, theta0
  )
  # Ideal class logits (background, carbon, silicon).
  p_bg = np.clip(1.0 - p_si - p_c, 1e-6, 1.0)
  logits = np.log(
      np.stack([p_bg, np.maximum(p_c, 1e-6), np.maximum(p_si, 1e-6)], -1)
  )
  detector_fn = lambda img: jnp.asarray(logits[None], jnp.float32)

  # Anchor's goal: one bond along its first neighbor direction (A
  # sublattice -> neighbors at theta0 + 120k). Second dopant latched.
  goal_delta_a = BOND * np.array([np.cos(theta0), np.sin(theta0)])
  key_a = si_a[0] * 4096.0 + si_a[1]
  key_b = si_b[0] * 4096.0 + si_b[1]
  assert key_a < key_b  # si_a is the lexicographic anchor
  deltas_sorted = np.stack([goal_delta_a, np.zeros(2)])  # (D, 2)

  obs = {
      'image': jnp.zeros((1, S, S, 1), jnp.float32),
      'goal_delta_angstroms': jnp.asarray(
          deltas_sorted.reshape(1, -1), jnp.float32
      ),
  }
  candidates = planner_lib.make_candidate_offsets(max_radius=2 * BOND)
  action = np.asarray(
      vp.multi_dopant_vision_planner_policy(
          None,
          obs,
          detector_fn=detector_fn,
          rate_fn=rates_lib.simple_canonical_rates,
          num_dopants=2,
          dwell_seconds=5.0,
          max_distance_angstroms=2 * BOND,
          candidates=candidates,
          min_separation_px=8.0,
      )
  )[0]

  # Ground-truth single-dopant planner on the anchor's true geometry.
  angles = theta0 + np.array([0.0, 2 * np.pi / 3, 4 * np.pi / 3])
  nbr = BOND * np.stack([np.cos(angles), np.sin(angles)], -1)
  truth_obs = jnp.asarray(
      np.concatenate(
          [np.zeros(2), nbr.reshape(6), goal_delta_a]
      ).reshape(1, 10),
      jnp.float32,
  )
  want = np.asarray(
      planner_lib.planner_policy(
          None,
          truth_obs,
          rate_fn=rates_lib.simple_canonical_rates,
          dwell_seconds=5.0,
          candidates=candidates,
      )
  )[0] / (2 * BOND)

  np.testing.assert_allclose(action, want, atol=0.15)


def test_multi_dopant_registry_names():
  from putting_dune_tpu.experiments import registry

  names = set(registry.multi_dopant_experiment_names())
  for want in [
      'multi_dopant_2_vision_planner',
      'multi_dopant_3_vision_planner',
      'multi_dopant_2_distilled',
      'multi_dopant_3_distilled',
  ]:
    assert want in names, want


def test_shipped_multi_dopant_distilled_reaches_goals():
  """The distilled multi-dopant MLP (runs/distill_multidopant.py) loads
  through the registry and reaches goals."""
  import os

  from putting_dune_tpu import eval_lib
  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__),
      'model_weights',
      'multi_dopant_2_distilled',
  )
  if not os.path.isdir(weights):
    pytest.skip('multi_dopant_2_distilled weights not shipped yet')

  exp = registry.create_multi_dopant_experiment('multi_dopant_2_distilled')
  env = exp.make_env(8, step_limit=300)
  agent = exp.get_agent(None, None)
  results = eval_lib.evaluate_batched(
      env, agent.policy(), list(range(8)), max_steps=300
  )
  agg = eval_lib.aggregate_results(results)
  assert agg.average_num_times_reached_goal >= 0.75


def test_multi_dopant_vision_registry_smoke():
  """The registry experiment wires up end-to-end: env (image obs,
  position anchors) + shipped detector + policy produce finite actions
  over a short rollout."""
  import os

  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'atom_detector'
  )
  if not os.path.isdir(weights):
    pytest.skip('detector weights not shipped yet')

  exp = registry.create_multi_dopant_experiment(
      'multi_dopant_2_vision_planner'
  )
  env = exp.make_env(2, step_limit=50)
  agent = exp.get_agent(None, None)
  policy = agent.policy()
  state, ts = env.reset(jax.random.PRNGKey(0))
  key = jax.random.PRNGKey(1)
  for _ in range(2):
    action = policy(None, ts.observation)
    assert np.isfinite(np.asarray(action)).all()
    assert np.abs(np.asarray(action)).max() <= 1.0 + 1e-6
    key, k = jax.random.split(key)
    state, ts = env.step(state, action, k)
