"""In-loop drift correction (agents/drift_correction.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import eval_lib
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.agents import drift_correction as dc
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import features as features_lib


def _smooth_random_image(key, s):
  """Band-limited random image (so correlation peaks are well-defined)."""
  noise = jax.random.normal(key, (s, s))
  f = jnp.fft.rfft2(noise)
  ky = jnp.fft.fftfreq(s)[:, None]
  kx = jnp.fft.rfftfreq(s)[None, :]
  f = f * jnp.exp(-((kx**2 + ky**2) / (2 * 0.05**2)))
  img = jnp.fft.irfft2(f, s=(s, s))
  return (img - img.min()) / (img.max() - img.min())


def test_estimator_recovers_known_integer_shifts():
  s = 64
  base = _smooth_random_image(jax.random.PRNGKey(0), s)
  shifts = np.array([[3, -5], [0, 0], [-7, 2], [10, 10]], np.int32)
  prev = jnp.stack([base] * len(shifts))
  cur = jnp.stack(
      [jnp.roll(base, (r, c), axis=(0, 1)) for r, c in shifts]
  )
  est = dc.estimate_content_shift_px(
      prev,
      cur,
      expected_row_col=jnp.zeros((len(shifts), 2)),
      max_residual_px=jnp.full((len(shifts),), 16.0),  # circular radius
  )
  # Parabolic refinement on a Hann-windowed phase-correlation peak
  # carries a bias that grows with the shift (<0.7 px here); integer-
  # branch recovery is the contract, per-step accuracy is covered by
  # test_policy_tracks_true_cumulative_drift.
  np.testing.assert_allclose(np.asarray(est), shifts, atol=0.75)


def test_estimator_mask_resolves_periodic_ambiguity():
  """With a periodic pattern, the window around the expectation picks the
  correct lattice branch."""
  s = 64
  x = jnp.arange(s)
  period = 16
  base = (
      jnp.sin(2 * jnp.pi * x[:, None] / period)
      * jnp.sin(2 * jnp.pi * x[None, :] / period)
  )
  true = np.array([[18, 0]], np.int32)  # one period + 2 px
  prev = base[None]
  cur = jnp.roll(base, (18, 0), axis=(0, 1))[None]
  est = dc.estimate_content_shift_px(
      prev,
      cur,
      expected_row_col=jnp.asarray([[16.0, 0.0]]),
      max_residual_px=jnp.asarray([4.0]),
  )
  np.testing.assert_allclose(np.asarray(est), true, atol=0.75)


def test_policy_tracks_true_cumulative_drift():
  """Rolling the corrector over a drifting env: the drift estimate stays
  close to the simulator's true cumulative drift. Correlates the shipped
  detector's carbon-class maps at its 256-px training pitch — raw noisy
  frames carry frame-fixed artifacts (CLAHE tiling, row jitter) that bias
  phase correlation."""
  from putting_dune_tpu.agents import vision_planner as vp

  batch = 4
  lattice = lattice_lib.make_lattice(20)
  env = env_lib.PuttingDuneEnv(
      lattice=lattice,
      features=features_lib.ImageFeatures(image_size=256, include_fov=True),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(
              grid_columns=20,
              image_size=256,
              drift_per_frame_angstroms=0.5,
          )
      ),
      batch_size=batch,
  )

  def base(key, obs):
    del key
    return jnp.zeros((obs['image'].shape[0], 2), jnp.float32)

  detector = vp.load_shipped_detector()
  policy = dc.DriftCorrectedPolicy(
      base,
      map_fn=lambda obs: jax.nn.softmax(detector(obs['image']), -1)[..., 1],
      max_increment_angstroms=1.0,
  )

  state, ts = env.reset(jax.random.PRNGKey(0))
  pstate = policy.init(ts.observation)
  first = ts.first()
  key = jax.random.PRNGKey(1)
  for _ in range(5):
    key, k_pol, k_act, k_step = jax.random.split(key, 4)
    pstate, _ = policy.step(pstate, k_pol, ts.observation, first)
    action = jax.random.uniform(k_act, (batch, 2), minval=-1.0, maxval=1.0)
    state, ts = env.step(state, action, k_step)
    first = ts.first()
  # One more estimator update for the final frame.
  key, k_pol = jax.random.split(key)
  pstate, _ = policy.step(pstate, k_pol, ts.observation, first)

  live = ~np.asarray(state.needs_reset) & ~np.asarray(first)
  assert live.any()
  true_drift = np.asarray(state.sim.drift)[live]
  est_drift = np.asarray(pstate['drift'])[live]
  err = np.linalg.norm(est_drift - true_drift, axis=-1)
  mag = np.linalg.norm(true_drift, axis=-1)
  assert mag.mean() > 0.6  # the stress is real...
  # ...and the corrector keeps the residual under the half-site radius
  # where honeycomb goal snapping recovers the exact displacement.
  assert err.mean() < 0.6
  assert err.mean() < 0.6 * mag.mean()


def test_snap_to_honeycomb_recovers_exact_displacements():
  from putting_dune_tpu.agents import vision_planner as vp

  rng = np.random.default_rng(3)
  theta0 = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(64,)), jnp.float32)
  b0 = vp.BOND * np.stack(
      [np.cos(np.asarray(theta0)), np.sin(np.asarray(theta0))], -1
  )
  b1 = vp.BOND * np.stack(
      [
          np.cos(np.asarray(theta0) + 2 * np.pi / 3),
          np.sin(np.asarray(theta0) + 2 * np.pi / 3),
      ],
      -1,
  )
  a1 = b0 - b1
  a2 = b0 - vp.BOND * np.stack(
      [
          np.cos(np.asarray(theta0) + 4 * np.pi / 3),
          np.sin(np.asarray(theta0) + 4 * np.pi / 3),
      ],
      -1,
  )
  m = rng.integers(-4, 5, size=(64, 1))
  n = rng.integers(-4, 5, size=(64, 1))
  sub = rng.integers(0, 2, size=(64, 1))
  exact = m * a1 + n * a2 + sub * b0
  noise = rng.uniform(-0.4, 0.4, size=(64, 2))  # < half site spacing
  snapped = np.asarray(
      vp.snap_to_honeycomb(jnp.asarray(exact + noise, jnp.float32), theta0)
  )
  np.testing.assert_allclose(snapped, exact, atol=1e-3)


def test_evaluate_batched_accepts_stateful_policy():
  batch = 4
  lattice = lattice_lib.make_lattice(20)
  env = env_lib.PuttingDuneEnv(
      lattice=lattice,
      features=features_lib.ImageFeatures(image_size=64, include_fov=True),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(
              grid_columns=20,
              image_size=64,
              drift_per_frame_angstroms=0.5,
          ),
          step_limit=5,
      ),
      batch_size=batch,
  )

  def base(key, obs):
    del key
    return jnp.zeros((obs['image'].shape[0], 2), jnp.float32)

  policy = dc.DriftCorrectedPolicy(base)
  results = eval_lib.evaluate_batched(env, policy, seeds=list(range(batch)))
  assert len(results) == batch
  assert all(r.num_actions_taken <= 5 for r in results)


def test_registry_drift_experiments_wire_up():
  from putting_dune_tpu.experiments import registry

  for name in ('vision_planner_drift', 'vision_planner_drift_corrected'):
    exp = registry.create_eval_experiment(name)
    spec = exp.get_simulator_config()
    assert spec.drift_per_frame_angstroms > 0.0
    feats = exp.get_adapters_and_goal().feature_constructor
    assert feats.include_fov
