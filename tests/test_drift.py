"""Instrument-drift semantics (BASELINE stress config 5).

The drift model: `SimulatorState.drift` is the cumulative offset between
where the instrument believes its FOV sits and where the sample actually
is. Observations (si/neighbors/window/image) come from the drifted world;
physics (KMC transitions, goal checks) stays in the true frame; the beam
lands off-target by exactly one drift increment relative to the frame the
controller aimed with. Reference quantity: microscope_utils.py:760-835
(Drift labels); per-frame law matches image_alignment/data.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.env import env as env_lib

LATTICE = lattice_lib.make_lattice(num_cols=20)
CONFIG = simulator_lib.SimulatorConfig(grid_columns=20)
DRIFT_CONFIG = simulator_lib.SimulatorConfig(
    grid_columns=20, drift_per_frame_angstroms=0.5
)


def _step(state, key, config, dwell=1.5, position=None, batch=None):
  batch = batch or state.material.theta.shape[0]
  if position is None:
    position = jnp.full((batch, 2), 0.5)
  control = structures.BeamControl(
      position=position,
      dwell_seconds=jnp.full((batch,), dwell),
  )
  return simulator_lib.step(state, key, control, LATTICE, config=config)


def test_drift_disabled_stays_zero_and_matches_default():
  """With drift off the state drift stays exactly zero and the RNG path is
  unchanged (default config == explicit drift=0 config, bitwise)."""
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(0), LATTICE, config=CONFIG, batch_size=4
  )
  s1, o1, _ = _step(state, jax.random.PRNGKey(1), CONFIG)
  assert s1.drift is not None
  np.testing.assert_array_equal(np.asarray(s1.drift), 0.0)
  np.testing.assert_array_equal(
      np.asarray(o1.si_position_microscope),
      np.asarray(
          s1.fov.material_to_microscope(
              lattice_lib.site_position(
                  LATTICE, s1.material.si_index, s1.material.offset,
                  s1.material.theta,
              )
          )
      ),
  )


def test_drift_accumulates_with_bounded_increments():
  d = DRIFT_CONFIG.drift_per_frame_angstroms
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(0), LATTICE, config=DRIFT_CONFIG, batch_size=64
  )
  np.testing.assert_array_equal(np.asarray(state.drift), 0.0)
  key = jax.random.PRNGKey(1)
  prev = np.zeros((64, 2))
  for t in range(5):
    key, k = jax.random.split(key)
    state, _, _ = _step(state, k, DRIFT_CONFIG)
    cur = np.asarray(state.drift)
    inc = cur - prev
    assert (np.abs(inc) <= d + 1e-6).all()
    assert np.abs(inc).max() > 0.0
    assert np.abs(cur).max() <= (t + 1) * d + 1e-6
    prev = cur
  # Uniform increments: batch variance after 5 steps ~ 5 * d^2 / 3.
  var = np.asarray(state.drift).var(axis=0).mean()
  expected = 5 * d * d / 3.0
  assert 0.4 * expected < var < 1.8 * expected


def test_observation_reports_drifted_world():
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(2), LATTICE, config=DRIFT_CONFIG, batch_size=8
  )
  state, obs, _ = _step(state, jax.random.PRNGKey(3), DRIFT_CONFIG)
  si_true = lattice_lib.site_position(
      LATTICE, state.material.si_index, state.material.offset,
      state.material.theta,
  )
  np.testing.assert_allclose(
      np.asarray(obs.si_position_microscope),
      np.asarray(state.fov.material_to_microscope(si_true + state.drift)),
      atol=1e-5,
  )


def test_beam_drift_semantics():
  """Relative aiming off the OBSERVED silicon cancels cumulative drift
  (residual error = one per-step increment), while an ABSOLUTE aim in the
  believed frame misses by the full cumulative drift."""

  def run(drift_value, aim_observed):
    state, _ = simulator_lib.reset(
        jax.random.PRNGKey(4), LATTICE, config=DRIFT_CONFIG, batch_size=32
    )
    state = state.replace(
        drift=jnp.full((32, 2), drift_value, jnp.float32)
    )
    # The prior-law rate maximum sits 0.85 A from the silicon toward a
    # neighbor; aim there as observed (true + drift) or as an absolute
    # believed-frame coordinate ignoring what the camera shows.
    si_true = lattice_lib.site_position(
        LATTICE, state.material.si_index, state.material.offset,
        state.material.theta,
    )
    nbr_idx = LATTICE.neighbors[state.material.si_index][:, 0]
    nbr_true = lattice_lib.site_position(
        LATTICE, nbr_idx, state.material.offset, state.material.theta
    )
    unit = (nbr_true - si_true) / jnp.linalg.norm(
        nbr_true - si_true, axis=-1, keepdims=True
    )
    target = si_true + 0.85 * unit
    if aim_observed:
      target = target + state.drift
    aim = state.fov.material_to_microscope(target)
    before = np.asarray(state.material.si_index).copy()
    state, _, _ = _step(
        state, jax.random.PRNGKey(5), DRIFT_CONFIG, dwell=60.0, position=aim
    )
    return (np.asarray(state.material.si_index) != before).mean()

  # Relative-to-observation control: drift cancels (this is why the
  # RelativeToSilicon adapter family stays usable under drift).
  assert run(0.0, aim_observed=True) > 0.8
  assert run(500.0, aim_observed=True) > 0.8
  # Absolute believed-frame control: the beam lands 500 A off-lattice.
  assert run(500.0, aim_observed=False) == 0.0


def test_recenter_follows_observed_silicon():
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(6), LATTICE, config=DRIFT_CONFIG, batch_size=4
  )
  big = jnp.full((4, 2), 40.0, jnp.float32)  # way outside the safe area
  state = state.replace(drift=big)
  state, obs, _ = _step(state, jax.random.PRNGKey(7), DRIFT_CONFIG)
  si_true = lattice_lib.site_position(
      LATTICE, state.material.si_index, state.material.offset,
      state.material.theta,
  )
  # The believed FOV recentered on the OBSERVED silicon, so the observed
  # silicon sits at the center and the true one does not.
  np.testing.assert_allclose(
      np.asarray(state.fov.offset), np.asarray(si_true + state.drift),
      atol=1e-4,
  )
  np.testing.assert_allclose(
      np.asarray(obs.si_position_microscope), 0.5, atol=1e-4
  )


def test_env_goal_judged_in_true_frame_and_features_degrade():
  """Env: goal delta in features is off by the cumulative drift, while the
  reward/terminal check stays attached to the true sample."""
  env = env_lib.PuttingDuneEnv(
      lattice=LATTICE,
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(
              grid_columns=20, drift_per_frame_angstroms=0.4
          )
      ),
      batch_size=16,
  )
  state, ts = env.reset(jax.random.PRNGKey(8))
  key = jax.random.PRNGKey(9)
  for _ in range(4):
    key, k_act, k_step = jax.random.split(key, 3)
    action = jax.random.uniform(k_act, (16, 2), minval=-1.0, maxval=1.0)
    state, ts = env.step(state, action, k_step)
  drift = np.asarray(state.sim.drift)
  active = ~np.asarray(state.needs_reset)
  assert active.any()
  assert np.abs(drift[active]).max() > 0.0

  si_true = np.asarray(
      lattice_lib.site_position(
          LATTICE, state.sim.material.si_index, state.sim.material.offset,
          state.sim.material.theta,
      )
  )
  goal_delta_true = np.asarray(state.goal.position_material) - si_true
  goal_delta_feat = np.asarray(ts.observation[..., 8:10])
  # Feature goal delta = true delta - drift (the observed silicon sits at
  # si_true + drift). Rows that auto-reset this step have zero drift.
  np.testing.assert_allclose(
      goal_delta_feat[active],
      (goal_delta_true - drift)[active],
      atol=1e-3,
  )


def test_env_default_config_unaffected():
  """Smoke: the default (drift-free) env still runs and drift stays 0."""
  env = env_lib.PuttingDuneEnv(
      lattice=LATTICE,
      config=env_lib.EnvConfig(sim=CONFIG),
      batch_size=8,
  )
  state, ts = env.reset(jax.random.PRNGKey(10))
  state, ts = env.step(
      state, jnp.zeros((8, 2)), jax.random.PRNGKey(11)
  )
  np.testing.assert_array_equal(np.asarray(state.sim.drift), 0.0)


def test_learned_aligner_recovers_simulated_drift(tmp_path):
  """The SHIPPED learned ImageAligner, driven through the
  align_trajectories pipeline, recovers the device simulator's OWN
  cumulative drift — the two subsystems (drift model + learned aligner)
  compose: frames rendered by the drifting simulator are correctable by
  the artifact that would correct them on a real microscope."""
  import datetime as dt
  import os

  import pytest

  from putting_dune_tpu import microscope_data as md
  from putting_dune_tpu.experiments import registry
  from putting_dune_tpu.io import records
  from putting_dune_tpu.pipeline import align_trajectories as at

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'image_aligner'
  )
  if not os.path.isdir(weights):
    pytest.skip('image_aligner weights not shipped')
  if not os.path.exists(os.path.join(weights, 'LABELS_CUMULATIVE')):
    pytest.skip('shipped aligner predates the cumulative-drift labels')

  lattice = lattice_lib.make_lattice(50)
  config = simulator_lib.SimulatorConfig(
      image_size=128, drift_per_frame_angstroms=0.5
  )
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(11), lattice, config=config, batch_size=1,
      return_image=True,
  )

  def tiny_rates(si_pos, neighbor_pos, beam_pos):
    del neighbor_pos, beam_pos
    return jnp.full(si_pos.shape[:-1] + (3,), 1e-12)

  num_frames = 12
  believed_ll0 = np.asarray(state.fov.lower_left)[0].copy()
  grid = md.AtomicGrid(np.zeros((1, 2)), np.asarray([6]))
  observations = [
      md.MicroscopeObservation(
          grid=grid,
          fov=md.MicroscopeFieldOfView(
              np.asarray(state.fov.lower_left)[0].copy(),
              np.asarray(state.fov.upper_right)[0].copy(),
          ),
          controls=(),
          elapsed_time=dt.timedelta(seconds=0.0),
          image=np.asarray(obs.image)[0],
      )
  ]
  true_drift = [np.zeros(2)]
  key = jax.random.PRNGKey(12)
  for t in range(1, num_frames):
    key, k = jax.random.split(key)
    control = structures.BeamControl(
        position=jnp.full((1, 2), 0.5),
        dwell_seconds=jnp.full((1,), 1.5),
    )
    state, obs, _ = simulator_lib.step(
        state, k, control, lattice, tiny_rates, config=config,
        return_image=True,
    )
    observations.append(
        md.MicroscopeObservation(
            grid=grid,
            fov=md.MicroscopeFieldOfView(
                np.asarray(state.fov.lower_left)[0].copy(),
                np.asarray(state.fov.upper_right)[0].copy(),
            ),
            controls=(),
            elapsed_time=dt.timedelta(seconds=float(t)),
            image=np.asarray(obs.image)[0],
        )
    )
    true_drift.append(np.asarray(state.drift)[0].copy())
  true_drift = np.stack(true_drift)  # (T, 2)

  source = str(tmp_path / 'sim_drifting.tfrecords')
  target = str(tmp_path / 'sim_aligned.tfrecords')
  records.write_records(source, [md.Trajectory(tuple(observations))])
  at.main(at.Args(
      source_path=source, target_path=target, aligner_workdir=weights
  ))

  (aligned,) = records.read_records(target, md.Trajectory)
  believed_ll = np.stack(
      [np.asarray(o.fov.lower_left) for o in observations]
  )
  aligned_ll = np.stack(
      [np.asarray(o.fov.lower_left) for o in aligned.observations]
  )
  # A frame rendered with cumulative drift D was truly looking at
  # believed_fov - D (simulator._observe), so the corrected claims should
  # sit at believed - D.
  recovered = aligned_ll - believed_ll  # (T, 2), should track -true_drift
  err_aligned = np.linalg.norm(recovered + true_drift, axis=1)
  err_nothing = np.linalg.norm(true_drift, axis=1)
  assert err_nothing[-3:].mean() > 0.8  # the drift is material

  # The aligner's real guarantee is INCREMENT tracking: each per-frame
  # correction matches the true per-frame view shift to within its
  # measured per-frame drift error (~0.2 A noisy). Both the corrected
  # residual and the raw drift are random walks (sigma 0.25 vs 0.41 per
  # step), so cumulative improvement is real but bounded.
  inc_est = np.diff(-recovered, axis=0)   # estimated per-frame drift
  inc_true = np.diff(true_drift, axis=0)
  inc_err = np.linalg.norm(inc_est - inc_true, axis=1)
  assert inc_err.mean() < 0.35
  assert err_aligned[-3:].mean() < 0.8 * err_nothing[-3:].mean()


def test_multi_dopant_drift_semantics():
  """D-dopant env: drift accumulates, observations report the drifted
  world, goal checks stay in the true frame, and the default config keeps
  drift at exactly zero."""
  from putting_dune_tpu.env import multi_dopant

  batch = 8
  env = multi_dopant.MultiDopantEnv(
      lattice=LATTICE,
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=batch,
      num_dopants=2,
      drift_per_frame_angstroms=0.5,
  )
  state, ts = env.reset(jax.random.PRNGKey(20))
  np.testing.assert_array_equal(np.asarray(state.drift), 0.0)
  key = jax.random.PRNGKey(21)
  for _ in range(3):
    key, k_act, k_step = jax.random.split(key, 3)
    action = jax.random.uniform(k_act, (batch, 2), minval=-1.0, maxval=1.0)
    state, ts = env.step(state, action, k_step)
  drift = np.asarray(state.drift)
  live_env = ~np.asarray(state.needs_reset) & (
      np.asarray(state.steps) >= 3
  )
  assert np.abs(drift[live_env]).max() > 0.0
  assert np.abs(drift).max() <= 3 * 0.5 + 1e-6

  # Vector observation reports OBSERVED positions (true + drift) and goal
  # deltas stale by the drift for unlatched dopants.
  si_true = np.asarray(
      lattice_lib.site_position(
          LATTICE, state.si_indices, state.offset, state.theta
      )
  )  # (B, D, 2)
  obs = np.asarray(ts.observation).reshape(batch, 2, 4)
  unlatched = ~np.asarray(state.latched)
  si_obs = obs[..., 0:2]
  delta_obs = obs[..., 2:4]
  sel = live_env[:, None] & unlatched
  if sel.any():
    np.testing.assert_allclose(
        si_obs[sel], (si_true + drift[:, None, :])[sel], atol=1e-3
    )
    np.testing.assert_allclose(
        delta_obs[sel],
        (np.asarray(state.goals) - si_true - drift[:, None, :])[sel],
        atol=1e-3,
    )

  # Default config: drift stays exactly zero.
  env0 = multi_dopant.MultiDopantEnv(
      lattice=LATTICE,
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=4,
      num_dopants=2,
  )
  s0, _ = env0.reset(jax.random.PRNGKey(22))
  s0, _ = env0.step(
      s0, jnp.zeros((4, 2)), jax.random.PRNGKey(23)
  )
  np.testing.assert_array_equal(np.asarray(s0.drift), 0.0)


def test_multi_dopant_drift_corrected_registry_wiring():
  """The stress-config registry experiments build, and the corrected
  agent's stateful policy runs one init+step on device."""
  from putting_dune_tpu.experiments import registry

  for name in (
      'multi_dopant_2_vision_planner_drift',
      'multi_dopant_2_vision_planner_drift_corrected',
  ):
    exp = registry.create_multi_dopant_experiment(name)
    env = exp.make_env(2, step_limit=5)
    assert env.drift_per_frame_angstroms > 0.0
    assert env.include_fov

  exp = registry.create_multi_dopant_experiment(
      'multi_dopant_2_vision_planner_drift_corrected'
  )
  env = exp.make_env(2, step_limit=5)
  agent = exp.get_agent(None, None)
  policy = agent.policy()
  state, ts = env.reset(jax.random.PRNGKey(24))
  assert 'fov_lower_left' in ts.observation
  pstate = policy.init(ts.observation)
  pstate, action = policy.step(
      pstate, jax.random.PRNGKey(25), ts.observation, ts.first()
  )
  assert action.shape == (2, 2)
  assert np.isfinite(np.asarray(action)).all()


def test_ppo_drift_checkpoint_reaches_goals():
  """The drift-trained PPO checkpoint (when shipped) solves the drifting
  task through the registry + batched evaluator."""
  import os

  import pytest

  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import run_helpers
  from putting_dune_tpu.experiments import registry

  path = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'ppo_simple_drift'
  )
  if not os.path.isdir(path):
    pytest.skip('ppo_simple_drift weights not shipped')
  exp = registry.create_eval_experiment('ppo_simple_drift')
  agent = exp.get_agent(np.random.default_rng(0), None)
  seeds = list(range(20))
  env = run_helpers.create_batched_env(
      exp.get_adapters_and_goal,
      exp.get_simulator_config,
      batch_size=len(seeds),
      step_limit=300,
  )
  results = eval_lib.evaluate_batched(env, agent.policy(), seeds)
  agg = eval_lib.aggregate_results(results)
  assert agg.average_num_times_reached_goal >= 0.5


def test_hardware_loop_rehearsal_with_aligner_under_drift(tmp_path):
  """The production composition, rehearsed end-to-end: MicroscopeAgent
  (inverted control) drives a DRIFTING SimulatedMicroscope; the shipped
  learned ImageAligner corrects the FOV claims in the loop. With
  correction the true silicon converges to the original goal site; the
  uncorrected loop chases a goal vector stale by the cumulative drift."""
  import os

  import pytest

  from putting_dune_tpu import microscope_agent as ma
  from putting_dune_tpu import microscope_data as md
  from putting_dune_tpu.experiments import registry
  from putting_dune_tpu.image_alignment import inference as aligner_lib

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'image_aligner'
  )
  if not os.path.isdir(weights):
    pytest.skip('image_aligner weights not shipped')
  if not os.path.exists(os.path.join(weights, 'LABELS_CUMULATIVE')):
    pytest.skip('shipped aligner predates the cumulative-drift labels')

  def run(correct: bool) -> float:
    mic = ma.SimulatedMicroscope(
        seed=5,
        grid_columns=50,
        drift_per_frame_angstroms=0.5,
        image_size=128,
    )
    experiment = registry.create_microscope_experiment('greedy_on_neighbor')
    rng = np.random.default_rng(3)
    agent = ma.MicroscopeAgent(rng, experiment)
    obs = mic.reset()
    agent.reset(rng, obs)
    # Captured at reset, where drift == 0: believed == true frame.
    goal = agent.goal.goal_position_material_frame.copy()

    aligner = None
    cumulative = np.zeros(2)
    if correct:
      aligner = aligner_lib.ImageAligner.from_checkpoint(weights)
      aligner.reset()

    closest = np.inf
    for _ in range(35):
      if correct:
        claim = obs.fov.shift(-cumulative)
        _, new_shift, _ = aligner(obs.image, claim)
        cumulative = cumulative - new_shift
        fixed_fov = obs.fov.shift(-cumulative)
        aligner.amend_last_fov(fixed_fov)
        aligner.refine_history_claims()
        agent_obs = md.MicroscopeObservation(
            grid=obs.grid,
            fov=fixed_fov,
            controls=obs.controls,
            elapsed_time=obs.elapsed_time,
        )
      else:
        agent_obs = obs
      controls = agent.step(agent_obs)
      obs = mic.apply(controls)
      closest = min(
          closest,
          float(np.linalg.norm(mic.true_silicon_position() - goal)),
      )
    final = float(np.linalg.norm(mic.true_silicon_position() - goal))
    return closest, final

  corrected_min, corrected_final = run(True)
  uncorrected_min, uncorrected_final = run(False)
  # Corrected: the true silicon actually REACHES the goal site (the
  # greedy agent keeps acting afterwards, so the final pose may sit one
  # KMC hop away).
  assert corrected_min < 0.72, (corrected_min, corrected_final)
  assert corrected_final < 2.0
  # Uncorrected: the loop converges a cumulative-drift away from it.
  assert uncorrected_final > corrected_final + 1.0, (
      corrected_final, uncorrected_final,
  )


def test_simulated_microscope_host_interface_contract():
  """The rehearsal rig honors the host-interface contract the reference
  simulator defines (simulator.py:224-250): apply() before reset()
  raises, and the post-step observation carries the applied controls so
  recorded trajectories feed trajectories_to_transitions ->
  train_rate_learner (which drops controls-free transitions)."""
  import datetime as dt

  import pytest

  from putting_dune_tpu import microscope_agent as ma
  from putting_dune_tpu import microscope_data as md

  mic = ma.SimulatedMicroscope(seed=0, grid_columns=20)
  control = md.BeamControl(
      position=np.array([0.5, 0.5]),
      dwell_time=dt.timedelta(seconds=1.5),
  )
  with pytest.raises(RuntimeError, match='reset'):
    mic.apply([control])
  with pytest.raises(RuntimeError, match='reset'):
    mic.true_silicon_position()
  with pytest.raises(RuntimeError, match='reset'):
    mic.true_drift()

  obs = mic.reset()
  assert obs.controls == ()
  # Multi-control requests fail loudly (single-beam device model).
  with pytest.raises(ValueError, match='single beam'):
    mic.apply([control, control])
  obs = mic.apply([control])
  assert len(obs.controls) == 1
  # The recorded control is a defensive copy: mutating the caller's
  # buffer must not corrupt the recorded trajectory.
  assert obs.controls[0] is not control
  recorded_position = obs.controls[0].position.copy()
  control.position[:] = -1.0
  np.testing.assert_allclose(obs.controls[0].position, recorded_position)
  assert obs.controls[0].dwell_time == control.dwell_time
