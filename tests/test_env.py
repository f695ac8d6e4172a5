"""Batched environment tests: dm_env contract semantics + end-to-end control.

Mirrors reference putting_dune_environment_test.py (reset-on-create,
termination, discounting, determinism) plus end-to-end greedy goal-reaching.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.agents import agent_lib
from putting_dune_tpu.env import action_adapters
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import features as features_lib
from putting_dune_tpu.env import goals as goals_lib

LATTICE = lattice_lib.make_lattice(num_cols=20)
SIM_CONFIG = simulator_lib.SimulatorConfig(grid_columns=20)


def zero_rates(si_pos, neighbor_pos, beam_pos):
  del neighbor_pos, beam_pos
  return jnp.full(si_pos.shape[:-1] + (3,), 1e-12)


def make_env(batch_size=4, rate_fn=rates_lib.prior_rates, step_limit=600,
             material_frame=False, dwell=1.5):
  return env_lib.PuttingDuneEnv(
      lattice=LATTICE,
      rate_fn=rate_fn,
      adapter=(
          action_adapters.RelativeToSiliconMaterialFrameActionAdapter(
              min_dwell_seconds=dwell, max_dwell_seconds=dwell,
              max_distance_angstroms=2 * 1.42,
          )
          if material_frame
          else action_adapters.RelativeToSiliconActionAdapter()
      ),
      features=(
          features_lib.SingleSiliconMaterialFrameFeatures()
          if material_frame
          else features_lib.SingleSiliconPristineGrapheneFeatures()
      ),
      config=env_lib.EnvConfig(sim=SIM_CONFIG, step_limit=step_limit),
      batch_size=batch_size,
  )


def test_reset_returns_first_with_time_discount():
  env = make_env()
  state, ts = env.reset(jax.random.PRNGKey(0))
  assert np.asarray(ts.step_type).tolist() == [env_lib.FIRST] * 4
  np.testing.assert_allclose(np.asarray(ts.reward), 0.0)
  # Initial observation costs one image (2 s): discount = gamma^2.
  np.testing.assert_allclose(
      np.asarray(ts.discount), constants.GAMMA_PER_SECOND**2.0, rtol=1e-5
  )
  assert ts.observation.shape == (4, 10)
  assert not np.asarray(state.needs_reset).any()


def test_features_layout():
  env = make_env()
  _, ts = env.reset(jax.random.PRNGKey(1))
  obs = np.asarray(ts.observation)
  # Microscope-frame features: si at FOV center, unit neighbor deltas.
  np.testing.assert_allclose(obs[:, 0:2], 0.5, atol=1e-5)
  deltas = obs[:, 2:8].reshape(-1, 3, 2)
  np.testing.assert_allclose(
      np.linalg.norm(deltas, axis=-1), 1.0, atol=1e-5
  )
  # Goal delta within the sampling ring.
  goal_dist = np.linalg.norm(obs[:, 8:10], axis=-1)
  assert (goal_dist > 0.1).all() and (goal_dist < 50.0).all()


def test_step_mid_semantics_and_discount():
  env = make_env(rate_fn=zero_rates)
  state, _ = env.reset(jax.random.PRNGKey(2))
  action = jnp.zeros((4, 2))
  state, ts = env.step(state, action, jax.random.PRNGKey(3))
  assert np.asarray(ts.step_type).tolist() == [env_lib.MID] * 4
  # dwell 1.5 + image 2.0 => discount gamma^3.5.
  np.testing.assert_allclose(
      np.asarray(ts.discount), constants.GAMMA_PER_SECOND**3.5, rtol=1e-5
  )
  np.testing.assert_allclose(np.asarray(ts.reward), 0.0)


def test_step_limit_truncates_with_nonzero_discount():
  env = make_env(rate_fn=zero_rates, step_limit=3)
  state, ts = env.reset(jax.random.PRNGKey(4))
  action = jnp.zeros((4, 2))
  key = jax.random.PRNGKey(5)
  for i in range(3):
    key, k = jax.random.split(key)
    state, ts = env.step(state, action, k)
  assert np.asarray(ts.step_type).tolist() == [env_lib.LAST] * 4
  assert (np.asarray(ts.discount) > 0.0).all()  # truncation, not terminal
  assert np.asarray(state.needs_reset).all()
  # Next step auto-resets to FIRST.
  key, k = jax.random.split(key)
  state, ts = env.step(state, action, k)
  assert np.asarray(ts.step_type).tolist() == [env_lib.FIRST] * 4
  assert np.asarray(state.step_count).tolist() == [0] * 4


def test_subbatch_autoreset_and_overflow_fallback():
  # reset_chunk=2 < batch_size=8 exercises the compacted sub-batch reset
  # (2 finished envs) and the full-batch fallback (8 finished at once).
  env = env_lib.PuttingDuneEnv(
      lattice=LATTICE,
      rate_fn=zero_rates,
      config=env_lib.EnvConfig(sim=SIM_CONFIG, step_limit=3, reset_chunk=2),
      batch_size=8,
  )
  state, _ = env.reset(jax.random.PRNGKey(20))
  action = jnp.zeros((8, 2))

  # Make exactly envs 1 and 5 terminal by moving their goals onto the Si.
  si_material = state.sim.fov.microscope_to_material(jnp.full((8, 2), 0.5))
  on_si = jnp.isin(jnp.arange(8), jnp.array([1, 5]))[:, None]
  goal_pos = jnp.where(on_si, si_material, state.goal.position_material)
  state = state.replace(goal=state.goal.replace(position_material=goal_pos))
  state, ts = env.step(state, action, jax.random.PRNGKey(21))
  expect = np.where(np.asarray(on_si[:, 0]), env_lib.LAST, env_lib.MID)
  assert np.asarray(ts.step_type).tolist() == expect.tolist()

  # Next step: the 2 finished envs reset through the sub-batch path.
  old_goals = np.asarray(state.goal.position_material)
  state, ts = env.step(state, action, jax.random.PRNGKey(22))
  expect = np.where(np.asarray(on_si[:, 0]), env_lib.FIRST, env_lib.MID)
  assert np.asarray(ts.step_type).tolist() == expect.tolist()
  counts = np.asarray(state.step_count)
  assert counts[[1, 5]].tolist() == [0, 0]
  assert (counts[[0, 2, 3, 4, 6, 7]] == 2).all()
  # Unfinished envs keep their goal; reset envs draw a fresh one in the
  # sampling ring around their (re-centered) silicon.
  new_goals = np.asarray(state.goal.position_material)
  keep = [0, 2, 3, 4, 6, 7]
  np.testing.assert_allclose(new_goals[keep], old_goals[keep])
  # Fresh episodes start with the silicon at the FOV center.
  si_new = np.asarray(
      state.sim.fov.microscope_to_material(jnp.full((8, 2), 0.5))
  )
  d = np.linalg.norm(new_goals[[1, 5]] - si_new[[1, 5]], axis=-1)
  assert (d > 0.1).all() and (d < 50.0).all()
  # FIRST rows carry the fresh-episode discount gamma^image_duration.
  np.testing.assert_allclose(
      np.asarray(ts.discount)[[1, 5]],
      constants.GAMMA_PER_SECOND**2.0,
      rtol=1e-5,
  )

  # Overflow: all 8 truncate simultaneously at the step limit -> the
  # full-batch fallback resets every env.
  state, ts = env.reset(jax.random.PRNGKey(23))
  key = jax.random.PRNGKey(24)
  for _ in range(3):
    key, k = jax.random.split(key)
    state, ts = env.step(state, action, k)
  assert np.asarray(ts.step_type).tolist() == [env_lib.LAST] * 8
  key, k = jax.random.split(key)
  state, ts = env.step(state, action, k)
  assert np.asarray(ts.step_type).tolist() == [env_lib.FIRST] * 8
  assert np.asarray(state.step_count).tolist() == [0] * 8


def test_terminal_on_goal_reached():
  env = make_env(rate_fn=zero_rates)
  state, _ = env.reset(jax.random.PRNGKey(6))
  # Move the goal onto the silicon: next step must be terminal with
  # discount 0 and reward gamma^elapsed.
  si_material = state.sim.fov.microscope_to_material(jnp.full((4, 2), 0.5))
  state = state.replace(
      goal=state.goal.replace(position_material=si_material)
  )
  state, ts = env.step(state, jnp.zeros((4, 2)), jax.random.PRNGKey(7))
  assert np.asarray(ts.step_type).tolist() == [env_lib.LAST] * 4
  np.testing.assert_allclose(np.asarray(ts.discount), 0.0)
  np.testing.assert_allclose(
      np.asarray(ts.reward), constants.GAMMA_PER_SECOND**3.5, rtol=1e-5
  )


def test_determinism_under_fixed_keys():
  env = make_env()
  s1, t1 = env.reset(jax.random.PRNGKey(8))
  s2, t2 = env.reset(jax.random.PRNGKey(8))
  np.testing.assert_array_equal(
      np.asarray(t1.observation), np.asarray(t2.observation)
  )
  s1, t1 = env.step(s1, jnp.zeros((4, 2)), jax.random.PRNGKey(9))
  s2, t2 = env.step(s2, jnp.zeros((4, 2)), jax.random.PRNGKey(9))
  np.testing.assert_array_equal(
      np.asarray(t1.observation), np.asarray(t2.observation)
  )


def test_greedy_agent_reaches_goals():
  """End-to-end: the reference 'greedy_on_neighbor' experiment combination
  (greedy agent + simple canonical rates + material-frame adapters with 5 s
  dwell, registry.py:287-298) reaches most goals.

  Note: the HUMAN-PRIOR rate function is not used here because its peak
  is reflected about the x-axis relative to the targeted neighbor (a
  preserved reference quirk, see rates.prior_rates docstring), which breaks
  a beam-on-neighbor greedy controller except at special angles.
  """
  batch = 16
  env = make_env(
      batch_size=batch, material_frame=True, step_limit=400,
      rate_fn=rates_lib.simple_canonical_rates, dwell=5.0,
  )
  policy = functools.partial(agent_lib.greedy_policy, None)

  @jax.jit
  def run(key):
    k_reset, k_loop = jax.random.split(key)
    state, ts = env.reset(k_reset)

    def body(carry):
      state, ts, key, reached, done, i = carry
      key, k = jax.random.split(key)
      action = policy(ts.observation)
      state, ts = env.step(state, action, k)
      terminal = (ts.step_type == env_lib.LAST) & (ts.discount == 0.0)
      reached = reached | (terminal & ~done)
      done = done | (ts.step_type == env_lib.LAST)
      return state, ts, key, reached, done, i + 1

    def cond(carry):
      _, _, _, _, done, i = carry
      return jnp.logical_and(~jnp.all(done), i < 400)

    init = (
        state, ts, k_loop,
        jnp.zeros((batch,), bool), jnp.zeros((batch,), bool),
        jnp.asarray(0, jnp.int32),
    )
    _, _, _, reached, done, steps = jax.lax.while_loop(cond, body, init)
    return reached, done, steps

  reached, done, steps = jax.device_get(run(jax.random.PRNGKey(10)))
  # Prior-rate transitions with a greedy controller should reliably reach
  # goals sampled <= ~21 A away (tens of hops at most).
  assert reached.mean() >= 0.8, (reached.mean(), steps)


def test_image_features_env_end_to_end():
  """BASELINE config 3: image observations through the batched env."""
  import putting_dune_tpu.simulator as sim_lib
  from putting_dune_tpu.env import features as features_lib

  env = env_lib.PuttingDuneEnv(
      lattice=LATTICE,
      rate_fn=rates_lib.simple_canonical_rates,
      adapter=action_adapters.RelativeToSiliconActionAdapter(),
      features=features_lib.ImageFeatures(image_size=128),
      config=env_lib.EnvConfig(
          sim=sim_lib.SimulatorConfig(grid_columns=20, image_size=128)
      ),
      batch_size=2,
  )
  state, ts = env.reset(jax.random.PRNGKey(20))
  assert ts.observation['image'].shape == (2, 128, 128, 1)
  assert ts.observation['goal_delta_angstroms'].shape == (2, 2)
  img0 = np.asarray(ts.observation['image'])
  assert np.isfinite(img0).all() and img0.max() <= 1.0 + 1e-5

  state, ts = env.step(state, jnp.zeros((2, 2)), jax.random.PRNGKey(21))
  assert ts.observation['image'].shape == (2, 128, 128, 1)
  # Images vary across steps (fresh noise and possibly moved atoms).
  assert not np.array_equal(img0, np.asarray(ts.observation['image']))


def test_evaluate_batched_writes_videos(tmp_path):
  """Batched eval records per-env GIFs (pose + si_index replay)."""
  from putting_dune_tpu import eval_lib

  batch = 4
  env = make_env(
      batch_size=batch, material_frame=True, step_limit=60,
      rate_fn=rates_lib.simple_canonical_rates, dwell=5.0,
  )

  def policy(key, obs):
    del key
    return agent_lib.greedy_policy(None, obs)

  results = eval_lib.evaluate_batched(
      env, policy, seeds=list(range(batch)),
      video_save_dir=str(tmp_path), video_envs=2,
  )
  assert len(results) == batch
  import os
  gifs = sorted(os.listdir(tmp_path))
  assert gifs == ['0.gif', '1.gif']
  assert os.path.getsize(tmp_path / '0.gif') > 1000


def test_evaluate_batched_wall_clock_budget(monkeypatch):
  """The combined sim+wall 10-min budget (reference eval_lib.py:82,128)
  holds on device: with an artificially fast wall clock, episodes are
  truncated long before the step limit, marked not-reached, and agent
  wall time is NaN ('n/a'), never 0.0."""
  from putting_dune_tpu import eval_lib

  env = make_env(batch_size=4, rate_fn=zero_rates, step_limit=600)

  def policy(key, obs):
    del key
    return jnp.zeros((obs.shape[0], 2))

  # (a) Host-side wall break between chunks: the clock jumps 350 s per
  # call, so after ONE 16-step chunk the wall budget alone is exhausted.
  ticks = {'t': 0.0}

  def fake_clock():
    ticks['t'] += 350.0
    return ticks['t']

  monkeypatch.setattr(eval_lib.time, 'perf_counter', fake_clock)
  results = eval_lib.evaluate_batched(
      env, policy, seeds=list(range(4)), chunk_steps=16
  )
  assert [r.num_actions_taken for r in results] == [16] * 4
  assert not any(r.reached_goal for r in results)
  assert all(np.isnan(r.agent_seconds_to_goal) for r in results)
  assert all(r.evaluator == eval_lib.BATCHED_EVALUATOR for r in results)
  agg = eval_lib.aggregate_results(results)
  assert agg.evaluator == eval_lib.BATCHED_EVALUATOR

  # (b) In-chunk combined check: smaller wall offset, one big chunk —
  # each episode stops once env_seconds + wall > 600 (at ~3.5 simulated
  # seconds per step that is ~100 steps, far under the 600-step limit).
  ticks['t'] = 0.0

  def fake_clock_2():
    ticks['t'] += 250.0
    return ticks['t']

  monkeypatch.setattr(eval_lib.time, 'perf_counter', fake_clock_2)
  results = eval_lib.evaluate_batched(
      env, policy, seeds=list(range(4)), chunk_steps=512
  )
  for r in results:
    assert not r.reached_goal
    assert 80 <= r.num_actions_taken <= 120


class DmEnvConformanceTest(
    __import__('dm_env.test_utils', fromlist=['EnvironmentTestMixin']
               ).EnvironmentTestMixin,
    __import__('absl.testing.absltest', fromlist=['TestCase']).TestCase,
):
  """dm_env's OFFICIAL conformance suite over the single-env wrapper.

  The reference's environment is a dm_env.Environment; this locks the
  wrapper (env/dm_env_wrapper.py) to the same contract — reset-on-first-
  step, StepType sequencing, spec validation of every emitted timestep.
  """

  def make_object_under_test(self):
    from putting_dune_tpu import run_helpers
    from putting_dune_tpu.experiments import registry

    exp = registry.create_eval_experiment('relative_random_simple')
    return run_helpers.create_putting_dune_env(
        seed=3,
        get_adapters_and_goal=exp.get_adapters_and_goal,
        get_simulator_config=exp.get_simulator_config,
        grid_columns=10,
        simulator_step_limit=20,
    )


def test_kmc_truncation_count_surfaces_capped_physics():
  """A misbehaving rate fn that trips the KMC max_events cap is VISIBLE at
  the env level: EnvState.kmc_truncation_count counts capped steps per
  episode (and stays 0 under sane rates / after auto-reset)."""

  def runaway_rates(si_pos, neighbor_pos, beam_pos):
    del neighbor_pos, beam_pos
    return jnp.full(si_pos.shape[:-1] + (3,), 1e6)

  config = env_lib.EnvConfig(
      sim=simulator_lib.SimulatorConfig(
          grid_columns=20, max_kmc_events_per_step=25
      ),
      step_limit=600,
  )
  env = env_lib.PuttingDuneEnv(
      lattice=LATTICE, rate_fn=runaway_rates, config=config, batch_size=4
  )
  state, _ = env.reset(jax.random.PRNGKey(0))
  assert np.asarray(state.kmc_truncation_count).tolist() == [0] * 4
  action = jnp.zeros((4, 2), jnp.float32)
  state, _ = env.step(state, action, jax.random.PRNGKey(1))
  assert np.asarray(state.kmc_truncation_count).tolist() == [1] * 4
  state, _ = env.step(state, action, jax.random.PRNGKey(2))
  assert np.asarray(state.kmc_truncation_count).tolist() == [2] * 4

  # Sane rates never trip the default cap.
  env_sane = make_env()
  s, _ = env_sane.reset(jax.random.PRNGKey(0))
  for i in range(3):
    s, _ = env_sane.step(s, action, jax.random.PRNGKey(10 + i))
  assert np.asarray(s.kmc_truncation_count).tolist() == [0] * 4


def test_evaluate_batched_warns_on_kmc_truncation(caplog):
  """A rate fn that trips the KMC cap during evaluation is surfaced as a
  warning with the number of truncated steps."""
  import logging as _logging

  from putting_dune_tpu import eval_lib

  def runaway_rates(si_pos, neighbor_pos, beam_pos):
    del neighbor_pos, beam_pos
    return jnp.full(si_pos.shape[:-1] + (3,), 1e6)

  config = env_lib.EnvConfig(
      sim=simulator_lib.SimulatorConfig(
          grid_columns=20, max_kmc_events_per_step=25
      ),
      step_limit=600,
  )
  env = env_lib.PuttingDuneEnv(
      lattice=LATTICE, rate_fn=runaway_rates, config=config, batch_size=4
  )

  def zero_policy(key, obs):
    del key
    return jnp.zeros((obs.shape[0], 2), jnp.float32)

  with caplog.at_level(_logging.WARNING):
    results = eval_lib.evaluate_batched(
        env, zero_policy, seeds=[0, 1, 2, 3], max_steps=3
    )
  assert len(results) == 4
  assert any(
      'max_events safety cap truncated' in r.message for r in caplog.records
  )

  # Sane rates: no warning.
  caplog.clear()
  env_sane = make_env()
  with caplog.at_level(_logging.WARNING):
    eval_lib.evaluate_batched(
        env_sane, zero_policy, seeds=[0, 1, 2, 3], max_steps=3
    )
  assert not any(
      'max_events safety cap' in r.message for r in caplog.records
  )
