"""Tests for the vision planner (agents/vision_planner.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu import constants
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import planner as planner_lib
from putting_dune_tpu.agents import vision_planner as vp

BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS
S = 128


def _gaussian_blob(x, y, cx, cy, sigma=1.6):
  return np.exp(-0.5 * ((x - cx) ** 2 + (y - cy) ** 2) / sigma**2)


def _synthetic_maps(si_xy, bond_px, theta0, shells=2):
  """Si + honeycomb-carbon probability maps in the math pixel frame
  (x right, y up; row 0 = image top)."""
  xs = np.arange(S) + 0.5
  x = np.tile(xs[None, :], (S, 1))
  y = np.tile((S - xs)[:, None], (1, S))
  p_si = _gaussian_blob(x, y, si_xy[0], si_xy[1])
  p_c = np.zeros((S, S))
  # First shell: 3 neighbors; second shell: 6 atoms at distance
  # sqrt(3)*bond at the interleaved angles (honeycomb geometry).
  for k in range(3):
    a = theta0 + 2 * np.pi * k / 3
    p_c += _gaussian_blob(
        x, y, si_xy[0] + bond_px * np.cos(a), si_xy[1] + bond_px * np.sin(a)
    )
  if shells >= 2:
    for k in range(6):
      a = theta0 + np.pi / 3 * k + np.pi / 6
      rr = np.sqrt(3.0) * bond_px
      p_c += _gaussian_blob(
          x, y, si_xy[0] + rr * np.cos(a), si_xy[1] + rr * np.sin(a)
      )
  return p_si, np.clip(p_c, 0.0, 1.0)


@pytest.mark.parametrize('theta0', [0.1, 0.9, -1.2])
@pytest.mark.parametrize('bond_px', [7.0, 12.0])
def test_estimate_lattice_frame_recovers_geometry(theta0, bond_px):
  si_xy = (61.3, 70.8)
  p_si, p_c = _synthetic_maps(si_xy, bond_px, theta0)
  si_hat, bond_hat, theta_hat = vp.estimate_lattice_frame(
      jnp.asarray(p_si[None]), jnp.asarray(p_c[None])
  )
  np.testing.assert_allclose(np.asarray(si_hat[0]), si_xy, atol=0.5)
  assert abs(float(bond_hat[0]) - bond_px) < 0.6
  # Orientation modulo the 3-fold neighbor symmetry.
  diff = (float(theta_hat[0]) - theta0) % (2 * np.pi / 3)
  diff = min(diff, 2 * np.pi / 3 - diff)
  assert diff < np.deg2rad(2.0), f'theta error {np.rad2deg(diff):.2f} deg'


def _full_honeycomb_maps(si_xy, bond_px, theta0):
  """Si + carbon maps for a FULL honeycomb sheet covering the image (all
  shells, like a real frame), Si on an A-sublattice site whose neighbors
  sit at theta0 + 120k deg."""
  xs = np.arange(S) + 0.5
  x = np.tile(xs[None, :], (S, 1))
  y = np.tile((S - xs)[:, None], (1, S))
  c, s = np.cos(theta0), np.sin(theta0)
  rot = np.array([[c, -s], [s, c]])
  a1 = rot @ (bond_px * np.array([1.5, np.sqrt(3) / 2]))
  a2 = rot @ (bond_px * np.array([1.5, -np.sqrt(3) / 2]))
  d = rot @ (bond_px * np.array([1.0, 0.0]))
  p_c = np.zeros((S, S))
  n = int(S / bond_px) + 2
  for n1 in range(-n, n + 1):
    for n2 in range(-n, n + 1):
      base = np.asarray(si_xy) + n1 * a1 + n2 * a2
      for site in (base, base + d):
        if np.allclose(site, si_xy):
          continue
        if -5 < site[0] < S + 5 and -5 < site[1] < S + 5:
          p_c += _gaussian_blob(x, y, site[0], site[1])
  p_si = _gaussian_blob(x, y, si_xy[0], si_xy[1])
  return p_si, np.clip(p_c, 0.0, 1.0)


@pytest.mark.parametrize('bond_px', [6.0, 8.5, 14.0])
def test_estimate_lattice_frame_full_sheet_small_bond(bond_px):
  """Regression: on a FULL honeycomb sheet at small bond_px (wide FOV),
  raw radial mass grows with shell radius (3 atoms at bond, 6 at
  sqrt(3)*bond, merging shells beyond), which used to drop the first
  shell below the peak-significance cut and lock theta0 onto a farther
  shell (~60 deg error). Circumference-normalized histogram keeps shell
  prominence scale-invariant."""
  theta0 = 0.45
  si_xy = (63.0, 67.0)
  p_si, p_c = _full_honeycomb_maps(si_xy, bond_px, theta0)
  si_hat, bond_hat, theta_hat = vp.estimate_lattice_frame(
      jnp.asarray(p_si[None]), jnp.asarray(p_c[None])
  )
  np.testing.assert_allclose(np.asarray(si_hat[0]), si_xy, atol=1.0)
  assert abs(float(bond_hat[0]) - bond_px) < 1.0
  diff = (float(theta_hat[0]) - theta0) % (2 * np.pi / 3)
  diff = min(diff, 2 * np.pi / 3 - diff)
  assert diff < np.deg2rad(3.0), f'theta error {np.rad2deg(diff):.2f} deg'


def test_estimate_lattice_frame_with_map_noise():
  """Geometry recovery degrades gracefully under map corruption: uniform
  probability noise plus spurious blobs."""
  rng = np.random.default_rng(3)
  theta0, bond_px = 0.7, 9.0
  si_xy = (60.0, 66.0)
  p_si, p_c = _synthetic_maps(si_xy, bond_px, theta0)
  xs = np.arange(S) + 0.5
  x = np.tile(xs[None, :], (S, 1))
  y = np.tile((S - xs)[:, None], (1, S))
  noisy_si = np.clip(p_si + 0.05 * rng.random((S, S)), 0, 1)
  noisy_c = p_c + 0.1 * rng.random((S, S))
  for _ in range(6):  # false-positive carbon blobs
    noisy_c += 0.5 * _gaussian_blob(
        x, y, rng.uniform(10, 118), rng.uniform(10, 118)
    )
  si_hat, bond_hat, theta_hat = vp.estimate_lattice_frame(
      jnp.asarray(noisy_si[None]), jnp.asarray(np.clip(noisy_c, 0, 1)[None])
  )
  np.testing.assert_allclose(np.asarray(si_hat[0]), si_xy, atol=2.0)
  assert abs(float(bond_hat[0]) - bond_px) < 1.5
  diff = (float(theta_hat[0]) - theta0) % (2 * np.pi / 3)
  diff = min(diff, 2 * np.pi / 3 - diff)
  assert diff < np.deg2rad(8.0)


def test_vision_planner_policy_targets_goalward_neighbor():
  """With ideal maps the policy's beam lands by the goal-ward neighbor."""
  theta0, bond_px = 0.5, 10.0
  si_xy = (64.0, 64.0)
  p_si, p_c = _synthetic_maps(si_xy, bond_px, theta0)
  # Logits consistent with the maps (background soaks up the rest).
  eps = 1e-4
  probs = np.stack(
      [np.clip(1.0 - p_si - p_c, eps, 1.0), p_c + eps, p_si + eps], -1
  )
  logits = jnp.asarray(np.log(probs)[None])

  goal_delta = 5.0 * BOND * np.asarray([np.cos(theta0), np.sin(theta0)])
  obs = {
      'image': jnp.zeros((1, S, S, 1), jnp.float32),
      'goal_delta_angstroms': jnp.asarray(goal_delta[None], jnp.float32),
  }
  max_dist = 2 * BOND
  action = vp.vision_planner_policy(
      None,
      obs,
      detector_fn=lambda img: jnp.broadcast_to(
          logits, (img.shape[0],) + logits.shape[1:]
      ),
      rate_fn=rates_lib.simple_canonical_rates,
      dwell_seconds=5.0,
      max_distance_angstroms=max_dist,
      candidates=planner_lib.make_candidate_offsets(max_radius=max_dist),
  )
  beam_angstroms = np.asarray(action[0]) * max_dist
  target = BOND * np.asarray([np.cos(theta0), np.sin(theta0)])
  assert np.linalg.norm(beam_angstroms - target) < 0.5 * BOND


def test_vision_planner_agent_with_shipped_detector():
  """End-to-end wiring: the shipped UNet detector drives the policy on a
  real rendered frame (2 env steps, registry experiment)."""
  import os

  from putting_dune_tpu import run_helpers
  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'atom_detector'
  )
  if not os.path.isdir(weights):
    pytest.skip('atom_detector weights not shipped')

  experiment = registry.create_eval_experiment('vision_planner_simple_rates')
  agent = experiment.get_agent(
      np.random.default_rng(0), experiment.get_adapters_and_goal()
  )
  env = run_helpers.create_batched_env(
      experiment.get_adapters_and_goal,
      experiment.get_simulator_config,
      batch_size=2,
  )
  policy = agent.policy()
  state, ts = env.reset(jax.random.PRNGKey(0))
  for i in range(2):
    action = policy(jax.random.PRNGKey(i), ts.observation)
    assert action.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(action)))
    state, ts = env.step(state, jnp.asarray(action), jax.random.PRNGKey(10 + i))


def test_vision_planner_learned_rates_agent():
  """Both shipped learned artifacts (UNet detector + distilled rate
  model) compose into one policy: the vision_planner_learned_rates
  registry experiment produces finite, sane actions on a real frame."""
  import os

  from putting_dune_tpu import run_helpers
  from putting_dune_tpu.experiments import registry

  base = os.path.join(os.path.dirname(registry.__file__), 'model_weights')
  if not os.path.isdir(os.path.join(base, 'atom_detector')):
    pytest.skip('atom_detector weights not shipped')
  if not os.path.isdir(os.path.join(base, 'rate_predictor')):
    pytest.skip('rate_predictor weights not shipped')

  experiment = registry.create_eval_experiment('vision_planner_learned_rates')
  agent = experiment.get_agent(
      np.random.default_rng(0), experiment.get_adapters_and_goal()
  )
  env = run_helpers.create_batched_env(
      experiment.get_adapters_and_goal,
      experiment.get_simulator_config,
      batch_size=2,
  )
  policy = agent.policy()
  _, ts = env.reset(jax.random.PRNGKey(0))
  action = policy(jax.random.PRNGKey(1), ts.observation)
  assert action.shape == (2, 2)
  action = np.asarray(action)
  assert np.all(np.isfinite(action))
  # Actions are in units of max_distance_angstroms and the planner
  # clamps candidates to the adapter's reach.
  assert np.all(np.abs(action) <= 1.0 + 1e-6)
