"""Episode-level distributional equivalence: batched env vs a numpy oracle.

test_statistical_parity.py proves the KMC kernel matches a reference-style
oracle; this file proves the COMPOSED system does — simulator clock +
FOV-recenter semantics + goal/termination rules compounding over whole
episodes (reference simulator.py:107-182 + putting_dune_environment.py:
113-158 + goals.py:130-185). The oracle re-implements one full episode in
plain numpy with its own RNG; agreement is distributional (KS tests /
rate comparisons within joint standard error), never bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.agents import agent_lib
from putting_dune_tpu.env import action_adapters
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import features as features_lib

LATTICE = lattice_lib.make_lattice(num_cols=20)
POS = np.asarray(LATTICE.positions)
NBR = np.asarray(LATTICE.neighbors)
BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS
GAMMA = constants.GAMMA_PER_SECOND
IMAGE_DURATION = 2.0
DWELL = 1.5
GOAL_RADIUS = 0.5 * BOND


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


def _simple_rates_np(si_pos, neighbor_pos, beam_pos):
  """Reference simple_canonical_rate_function (graphene.py:133-166)."""
  del si_pos
  dist = np.linalg.norm(beam_pos - neighbor_pos, axis=1) / BOND
  return 1.0 / ((dist * 4.0) ** 2 + 1.0)


def _oracle_kmc(rng, si_index, beam, dwell, world, rates_np):
  """Reference-style per-env KMC while loop (graphene.py:646-694)."""
  elapsed = 0.0
  while elapsed < dwell:
    nbr_idx = NBR[si_index]
    rates = rates_np(world[si_index], world[nbr_idx], beam)
    total = rates.sum()
    wait = min(rng.exponential(1.0 / total), 3600.0)
    elapsed += wait
    if elapsed <= dwell:
      si_index = nbr_idx[rng.choice(3, p=rates / total)]
  return si_index


def _oracle_episode(rng, step_limit, policy, rates_np=_prior_rates_np):
  """One full episode with reference semantics.

  Returns (length, recenters, reached, total_time).
  reset: simulator.py:65-105 (FOV ~U(15,30) centered on Si, +image time);
  step: simulator.py:107-182 (dwell+image clock, [0.25,0.75]^2 safe-area
  recenter costing another image) -> goals.py:130-185 (0.5-bond radius) ->
  step-limit truncation (run_helpers.py:33-46).
  """
  offset = rng.uniform(-BOND / 2, BOND / 2, 2)
  theta = rng.uniform(0.0, 2 * np.pi)
  c, s = np.cos(theta), np.sin(theta)
  rot = np.array([[c, -s], [s, c]])
  world = (POS + offset) @ rot.T
  si = int(np.argmin(np.sum((POS + offset) ** 2, axis=1)))

  fov_scale = rng.uniform(15.0, 30.0)
  ll = world[si] - fov_scale / 2
  ur = world[si] + fov_scale / 2

  dist = np.linalg.norm(world - world[si], axis=1)
  in_fov = np.all((world >= ll) & (world <= ur), axis=1)
  valid = np.flatnonzero(in_fov & (dist > 0.1) & (dist < 50.0))
  goal = world[rng.choice(valid)]

  total_time = IMAGE_DURATION
  recenters = 0
  for step in range(1, step_limit + 1):
    si_pos = world[si]
    extent = ur - ll
    # Policy -> material-frame beam target -> adapter conversion
    # (action_adapters.py RelativeToSiliconMaterialFrameActionAdapter).
    target = si_pos + policy(rng, world[NBR[si]] - si_pos, goal - si_pos)
    beam_micro = np.clip((target - ll) / extent, 0.0, 1.0)
    beam = ll + beam_micro * extent

    si = _oracle_kmc(rng, si, beam, DWELL, world, rates_np)
    elapsed = DWELL + IMAGE_DURATION

    si_pos = world[si]
    si_micro = (si_pos - ll) / extent
    if np.any((si_micro < 0.25) | (si_micro > 0.75)):
      ll = si_pos - fov_scale / 2
      ur = si_pos + fov_scale / 2
      elapsed += IMAGE_DURATION
      recenters += 1
    total_time += elapsed

    if np.linalg.norm(si_pos - goal) < GOAL_RADIUS:
      return step, recenters, True, total_time
  return step_limit, recenters, False, total_time


def _greedy_np(rng, neighbor_deltas, goal_delta):
  """Beam on the neighbor closest to the goal (agent_lib.greedy_policy)."""
  del rng
  best = np.argmin(
      np.linalg.norm(neighbor_deltas - goal_delta[None], axis=1)
  )
  return neighbor_deltas[best]


def _random_np(rng, neighbor_deltas, goal_delta):
  """Uniform material-frame beam delta in [-1, 1]^2 angstroms."""
  del neighbor_deltas, goal_delta
  return rng.uniform(-1.0, 1.0, 2)


def _run_batched(policy_fn, step_limit, batch, total_steps, seed,
                 rate_fn=None):
  """Runs the batched env, returning per-completed-episode statistics."""
  from putting_dune_tpu import rates as rates_lib

  env = env_lib.PuttingDuneEnv(
      lattice=LATTICE,
      rate_fn=rate_fn if rate_fn is not None else rates_lib.prior_rates,
      adapter=action_adapters.RelativeToSiliconMaterialFrameActionAdapter(),
      features=features_lib.SingleSiliconMaterialFrameFeatures(),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(grid_columns=20),
          step_limit=step_limit,
      ),
      batch_size=batch,
  )
  key = jax.random.PRNGKey(seed)
  key, k0 = jax.random.split(key)
  state, ts = env.reset(k0)

  lengths, recenters, reached, times = [], [], [], []
  cur_steps = np.zeros(batch, np.int64)
  cur_recenters = np.zeros(batch, np.int64)
  cur_time = np.asarray(ts.elapsed_seconds, np.float64).copy()

  for _ in range(total_steps):
    key, k_act, k_step = jax.random.split(key, 3)
    action = policy_fn(k_act, ts.observation)
    prev_ll = np.asarray(state.sim.fov.lower_left)
    state, ts = env.step(state, action, k_step)

    step_type = np.asarray(ts.step_type)
    first = step_type == env_lib.FIRST
    stepped = ~first
    new_ll = np.asarray(state.sim.fov.lower_left)
    moved = np.any(np.abs(new_ll - prev_ll) > 1e-9, axis=-1)

    cur_steps[stepped] += 1
    cur_recenters[stepped & moved] += 1
    cur_time[stepped] += np.asarray(ts.elapsed_seconds)[stepped]
    # Fresh episodes restart the accounting.
    cur_steps[first] = 0
    cur_recenters[first] = 0
    cur_time[first] = np.asarray(ts.elapsed_seconds)[first]

    done = step_type == env_lib.LAST
    if np.any(done):
      rew = np.asarray(ts.reward)
      lengths.extend(cur_steps[done].tolist())
      recenters.extend(cur_recenters[done].tolist())
      reached.extend((rew[done] > 0).tolist())
      times.extend(cur_time[done].tolist())
  return (
      np.asarray(lengths),
      np.asarray(recenters),
      np.asarray(reached, bool),
      np.asarray(times),
  )


def _assert_rates_close(p_a, n_a, p_b, n_b, what):
  se = np.sqrt(
      p_a * (1 - p_a) / max(n_a, 1) + p_b * (1 - p_b) / max(n_b, 1)
  )
  assert abs(p_a - p_b) < 5 * max(se, 1e-3), (what, p_a, p_b, se)


def test_greedy_episode_distributions_match_oracle():
  """Episode length / recenter count / reach rate / simulated time, greedy."""
  step_limit = 60
  rng = np.random.default_rng(0)
  o_len, o_rec, o_reach, o_time = [], [], [], []
  for _ in range(700):
    l, r, g, t = _oracle_episode(
        rng, step_limit, _greedy_np, rates_np=_simple_rates_np
    )
    o_len.append(l)
    o_rec.append(r)
    o_reach.append(g)
    o_time.append(t)
  o_len, o_rec = np.asarray(o_len), np.asarray(o_rec)
  o_reach, o_time = np.asarray(o_reach), np.asarray(o_time)

  def greedy(key, obs):
    del key
    return agent_lib.greedy_policy(None, obs)

  from putting_dune_tpu import rates as rates_lib

  b_len, b_rec, b_reach, b_time = _run_batched(
      greedy, step_limit, batch=256, total_steps=120, seed=1,
      rate_fn=rates_lib.simple_canonical_rates,
  )
  assert len(b_len) >= 700, len(b_len)

  ks = scipy.stats.ks_2samp(o_len, b_len)
  assert ks.pvalue > 1e-3, ('episode length', ks, o_len.mean(), b_len.mean())
  ks = scipy.stats.ks_2samp(o_rec, b_rec)
  assert ks.pvalue > 1e-3, ('recenters', ks, o_rec.mean(), b_rec.mean())
  ks = scipy.stats.ks_2samp(o_time, b_time)
  assert ks.pvalue > 1e-3, ('sim time', ks, o_time.mean(), b_time.mean())
  _assert_rates_close(
      o_reach.mean(), len(o_reach), b_reach.mean(), len(b_reach),
      'goal-reach rate (greedy)',
  )


def test_random_agent_reach_rate_matches_oracle():
  """Random-agent goal-reach rate + episode stats over >=1k episodes."""
  step_limit = 40
  rng = np.random.default_rng(2)
  o_len, o_rec, o_reach = [], [], []
  for _ in range(1000):
    l, r, g, _ = _oracle_episode(rng, step_limit, _random_np)
    o_len.append(l)
    o_rec.append(r)
    o_reach.append(g)
  o_len, o_rec = np.asarray(o_len), np.asarray(o_rec)
  o_reach = np.asarray(o_reach)

  def random_policy(key, obs):
    return agent_lib.uniform_random_policy(key, obs)

  b_len, b_rec, b_reach, _ = _run_batched(
      random_policy, step_limit, batch=256, total_steps=165, seed=3
  )
  assert len(b_len) >= 1000, len(b_len)

  _assert_rates_close(
      o_reach.mean(), len(o_reach), b_reach.mean(), len(b_reach),
      'goal-reach rate (random)',
  )
  ks = scipy.stats.ks_2samp(o_len, b_len)
  assert ks.pvalue > 1e-3, ('episode length', ks, o_len.mean(), b_len.mean())
  # Recenter-count distribution under an undirected walk.
  ks = scipy.stats.ks_2samp(o_rec, b_rec)
  assert ks.pvalue > 1e-3, ('recenters', ks, o_rec.mean(), b_rec.mean())
