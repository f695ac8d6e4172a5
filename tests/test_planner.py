"""Tests for the rate-aware planning controller (agents/planner.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import planner as planner_lib

BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


def _canonical_observation(goal_angle_rad: float, goal_dist: float = 6.0):
  """One env: si at (3, -2), graphene neighbors at 90/210/330 degrees,
  goal at the given angle/distance from si (material frame)."""
  si = np.array([3.0, -2.0], np.float32)
  angles = np.deg2rad([90.0, 210.0, 330.0]).astype(np.float32)
  deltas = BOND * np.stack([np.cos(angles), np.sin(angles)], axis=-1)
  goal_delta = goal_dist * np.array(
      [np.cos(goal_angle_rad), np.sin(goal_angle_rad)], np.float32
  )
  obs = np.concatenate([si, deltas.reshape(-1), goal_delta])
  return jnp.asarray(obs[None]), deltas


def test_candidate_grid_shape_and_radii():
  cand = planner_lib.make_candidate_offsets(
      num_radii=5, num_angles=8, min_radius=0.5, max_radius=2.0
  )
  assert cand.shape == (40, 2)
  radii = np.linalg.norm(cand, axis=-1)
  np.testing.assert_allclose(radii.min(), 0.5, rtol=1e-5)
  np.testing.assert_allclose(radii.max(), 2.0, rtol=1e-5)


def test_planner_targets_goalward_neighbor_simple_rates():
  """With simple (inverse-square, peaked on-neighbor) rates and the goal
  straight past neighbor 0, the chosen beam lands near neighbor 0."""
  obs, deltas = _canonical_observation(np.deg2rad(90.0))
  cand = planner_lib.make_candidate_offsets()
  action = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      dwell_seconds=5.0,
      candidates=cand,
  )
  assert action.shape == (1, 2)
  # Beam within half a bond of the goal-ward neighbor.
  assert float(jnp.linalg.norm(action[0] - deltas[0])) < 0.5 * BOND


def test_planner_adapts_to_reflected_prior():
  """The reference prior peaks at the REFLECTION of each neighbor's angle
  (graphene.py:223). The planner's chosen beam must induce a higher
  first-transition probability toward the goal-ward neighbor than greedy's
  fixed on-neighbor placement does."""
  obs, deltas = _canonical_observation(np.deg2rad(90.0))
  si = np.asarray(obs[0, 0:2])
  nbr = jnp.asarray((si + deltas)[None])

  def p_toward_0(beam_offset):
    r = rates_lib.prior_rates(
        jnp.asarray(si[None]), nbr, jnp.asarray((si + beam_offset)[None])
    )
    total = float(jnp.sum(r))
    return float(r[0, 0]) / total * (1.0 - np.exp(-total * 5.0))

  cand = planner_lib.make_candidate_offsets()
  action = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.prior_rates,
      dwell_seconds=5.0,
      candidates=cand,
  )
  assert p_toward_0(np.asarray(action[0])) > p_toward_0(deltas[0]) + 0.05


def test_lookahead_second_hop_sites_are_lattice_sites():
  """The geometric lookahead's second-hop positions must be real lattice
  sites: from neighbor n_i, the vacated site plus the +-120 degree
  rotations of (si - n_i) are all at bond distance from n_i and 120
  degrees apart."""
  _, deltas = _canonical_observation(0.0)
  back = -deltas  # si - n_i
  for s in (1.0, -1.0):
    c, sn = -0.5, s * np.sqrt(3.0) / 2.0
    rotated = np.stack(
        [c * back[:, 0] - sn * back[:, 1], sn * back[:, 0] + c * back[:, 1]],
        axis=-1,
    )
    np.testing.assert_allclose(
        np.linalg.norm(rotated, axis=-1), BOND, rtol=1e-5
    )
    cosang = np.sum(rotated * back, axis=-1) / BOND**2
    np.testing.assert_allclose(cosang, -0.5, rtol=1e-5)


def test_planner_with_lookahead_still_targets_goal():
  obs, deltas = _canonical_observation(np.deg2rad(90.0))
  action = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      dwell_seconds=5.0,
      candidates=planner_lib.make_candidate_offsets(),
      lookahead_discount=0.3,
  )
  assert float(jnp.linalg.norm(action[0] - deltas[0])) < 0.5 * BOND


def test_planner_reaches_goals_end_to_end():
  """Registry-driven batched eval: the planner solves simple-rate episodes
  about as fast as the canonical greedy controller (which takes ~9.4
  actions on this suite)."""
  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import run_helpers
  from putting_dune_tpu.experiments import registry

  experiment = registry.create_eval_experiment('planner_simple_rates')
  agent = experiment.get_agent(
      np.random.default_rng(0), experiment.get_adapters_and_goal()
  )
  env = run_helpers.create_batched_env(
      experiment.get_adapters_and_goal,
      experiment.get_simulator_config,
      batch_size=10,
  )
  results = eval_lib.evaluate_batched(env, agent.policy(), list(range(10)))
  reached = sum(r.reached_goal for r in results)
  actions = np.mean([r.num_actions_taken for r in results if r.reached_goal])
  assert reached >= 9
  assert actions < 20.0


def test_variable_dwell_shape_and_bounds():
  obs, _ = _canonical_observation(np.deg2rad(90.0))
  grid = np.linspace(1.5, 20.0, 8, dtype=np.float32)
  action = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      candidates=planner_lib.make_candidate_offsets(),
      dwell_grid_seconds=grid,
  )
  assert action.shape == (1, 3)
  assert 0.0 <= float(action[0, 2]) <= 1.0


def test_variable_dwell_tradeoff():
  """High rates saturate P(transition) quickly -> short dwell maximizes
  progress/second; near-zero rates make P ~ R*t -> the longest dwell
  wins (t/(t+image) is increasing)."""
  obs, _ = _canonical_observation(np.deg2rad(90.0))
  grid = np.linspace(1.5, 20.0, 8, dtype=np.float32)

  def weak_rates(si, nbr, beam):
    return 1e-3 * rates_lib.simple_canonical_rates(si, nbr, beam)

  strong = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      candidates=planner_lib.make_candidate_offsets(),
      dwell_grid_seconds=grid,
  )
  weak = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=weak_rates,
      candidates=planner_lib.make_candidate_offsets(),
      dwell_grid_seconds=grid,
  )
  assert float(strong[0, 2]) < 0.2
  assert float(weak[0, 2]) > 0.8


def test_multi_dopant_vector_neighbors_observation():
  """The 'vector_neighbors' mode appends the anchor dopant's 3 neighbor
  deltas (bond-length vectors) to the vector observation."""
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu.env import multi_dopant

  env = multi_dopant.MultiDopantEnv(
      lattice=lattice_lib.make_lattice(20),
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=4,
      num_dopants=2,
      observation_mode='vector_neighbors',
  )
  _, ts = env.reset(jax.random.PRNGKey(0))
  assert ts.observation.shape == (4, 2 * 4 + 6)
  nbr = np.asarray(ts.observation[:, 8:]).reshape(4, 3, 2)
  np.testing.assert_allclose(
      np.linalg.norm(nbr, axis=-1), BOND, rtol=2e-2
  )


def test_multi_dopant_planner_reaches_goals():
  """Registry-driven: the planner solves the 2-dopant task with zero
  training (the PPO checkpoint needed millions of env steps)."""
  from putting_dune_tpu import eval_lib
  from putting_dune_tpu.experiments import registry

  experiment = registry.create_multi_dopant_experiment(
      'multi_dopant_2_planner'
  )
  env = experiment.make_env(8)
  agent = experiment.get_agent(None, None)
  results = eval_lib.evaluate_batched(env, agent.policy(), list(range(8)))
  reached = sum(r.reached_goal for r in results)
  assert reached >= 7


def test_planner_drives_microscope_agent_loop():
  """The planner (with the shipped learned rate model) works in the
  inverted-control real-microscope loop via the registry experiment."""
  import datetime as dt
  import os

  import pytest

  from putting_dune_tpu import microscope_agent as ma
  from putting_dune_tpu import microscope_data as md
  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'rate_predictor'
  )
  if not os.path.isdir(weights):
    pytest.skip('rate_predictor weights not shipped')

  experiment = registry.create_microscope_experiment('planner_learned_rates')
  rng = np.random.default_rng(0)
  agent = ma.MicroscopeAgent(rng, experiment)

  # A minimal single-silicon observation: silicon at the center of a
  # 20 A FOV with its 3 graphene neighbors.
  angles = np.deg2rad([90.0, 210.0, 330.0])
  positions_material = np.concatenate(
      [
          np.zeros((1, 2)),
          BOND * np.stack([np.cos(angles), np.sin(angles)], -1),
      ],
      axis=0,
  )
  fov = md.MicroscopeFieldOfView(
      lower_left=np.array([-10.0, -10.0]), upper_right=np.array([10.0, 10.0])
  )
  grid = md.AtomicGrid(
      (positions_material - (-10.0)) / 20.0,
      np.array([14, 6, 6, 6]),
  )
  obs = md.MicroscopeObservation(
      grid=grid, fov=fov, controls=(),
      elapsed_time=dt.timedelta(seconds=2.0),
  )
  agent.reset(rng, obs)
  controls = agent.step(obs)
  assert len(controls) == 1
  assert ((controls[0].position >= 0) & (controls[0].position <= 1)).all()


def test_planner_agent_host_step():
  """Host dm_env-style step returns a (2,) material-frame action."""
  import dm_env

  obs, _ = _canonical_observation(np.deg2rad(45.0))
  agent = planner_lib.PlannerAgent(
      rate_fn=rates_lib.simple_canonical_rates, dwell_seconds=5.0
  )
  ts = dm_env.transition(reward=0.0, observation=np.asarray(obs[0]))
  action = agent.step(ts)
  assert action.shape == (2,)
  assert np.linalg.norm(action) <= 3.3


def test_per_frame_dwell_objective_prefers_longer_dwells():
  """Under the per-frame objective (drift stress: each frame costs one
  drift increment) the chosen dwell is at least as long as under the
  per-second objective, and overshoot still bounds it below the max when
  rates are strong."""
  obs, _ = _canonical_observation(np.deg2rad(90.0))
  grid = np.linspace(1.5, 20.0, 8, dtype=np.float32)

  per_second = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      candidates=planner_lib.make_candidate_offsets(),
      dwell_grid_seconds=grid,
  )
  per_frame = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      candidates=planner_lib.make_candidate_offsets(),
      dwell_grid_seconds=grid,
      dwell_objective='per_frame',
  )
  assert float(per_frame[0, 2]) >= float(per_second[0, 2])

  # With heavy overshoot penalty the per-frame dwell shortens again —
  # the Poisson extra-hop term really gates it.
  heavy = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      candidates=planner_lib.make_candidate_offsets(),
      dwell_grid_seconds=grid,
      dwell_objective='per_frame',
      overshoot_penalty_angstroms=50.0,
  )
  assert float(heavy[0, 2]) <= float(per_frame[0, 2])
