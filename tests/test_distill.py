"""Planner-to-policy distillation (agents/distill.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.agents import distill
from putting_dune_tpu.agents import eval_agent
from putting_dune_tpu.agents import planner as planner_lib
from putting_dune_tpu.env import action_adapters
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import features as features_lib

BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


def _make_env(batch_size=16):
  return env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(20),
      rate_fn=rates_lib.simple_canonical_rates,
      adapter=action_adapters.RelativeToSiliconMaterialFrameActionAdapter(
          min_dwell_seconds=5.0,
          max_dwell_seconds=5.0,
          max_distance_angstroms=2 * BOND,
      ),
      features=features_lib.SingleSiliconMaterialFrameFeatures(),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(grid_columns=20)
      ),
      batch_size=batch_size,
  )


TINY = distill.DistillConfig(
    num_iterations=3,
    rollout_length=8,
    sgd_steps_per_iteration=60,
    minibatch_size=128,
    hidden=(32, 32),
    num_radii=5,
    num_angles=16,
)


def test_distillation_loss_decreases_and_tracks_teacher():
  env = _make_env()
  params, metrics = distill.distill(
      env, rates_lib.simple_canonical_rates, TINY, seed=0
  )
  losses = metrics['loss']
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]

  # The student should be meaningfully closer to the teacher than an
  # untrained head on fresh on-policy states.
  module = distill.student_module(TINY)
  init_params = module.init(jax.random.PRNGKey(99), jnp.zeros((1, 10)))[
      'params'
  ]
  candidates = planner_lib.make_candidate_offsets(
      num_radii=TINY.num_radii, num_angles=TINY.num_angles
  )
  state, ts = env.reset(jax.random.PRNGKey(3))
  key = jax.random.PRNGKey(4)
  trained_err, init_err, count = 0.0, 0.0, 0
  for _ in range(4):
    obs = ts.observation
    teach = planner_lib.planner_policy(
        None,
        obs,
        rate_fn=rates_lib.simple_canonical_rates,
        dwell_seconds=TINY.dwell_seconds,
        candidates=candidates,
    )
    trained = module.apply({'params': params}, obs)
    init = module.apply({'params': init_params}, obs)
    trained_err += float(jnp.mean(jnp.sum((trained - teach) ** 2, -1)))
    init_err += float(jnp.mean(jnp.sum((init - teach) ** 2, -1)))
    count += 1
    key, k = jax.random.split(key)
    state, ts = env.step(state, teach, k)
  assert trained_err / count < 0.6 * (init_err / count), (
      trained_err / count,
      init_err / count,
  )


def test_variable_dwell_distillation_tracks_teacher_dwell():
  """3-dim (variable-dwell) distillation: the student's dwell fraction
  converges toward the teacher's on on-policy states."""
  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(20),
      rate_fn=rates_lib.simple_canonical_rates,
      adapter=action_adapters.RelativeToSiliconMaterialFrameActionAdapter(
          min_dwell_seconds=1.5,
          max_dwell_seconds=20.0,
          max_distance_angstroms=2 * BOND,
      ),
      features=features_lib.SingleSiliconMaterialFrameFeatures(),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(grid_columns=20)
      ),
      batch_size=16,
  )
  config = distill.DistillConfig(
      num_iterations=3,
      rollout_length=8,
      sgd_steps_per_iteration=60,
      minibatch_size=128,
      hidden=(32, 32),
      num_radii=5,
      num_angles=16,
      dwell_range_seconds=(1.5, 20.0),
      num_dwells=4,
  )
  assert config.action_dim == 3
  params, metrics = distill.distill(
      env, rates_lib.simple_canonical_rates, config, seed=0
  )
  assert np.isfinite(metrics['loss']).all()
  assert metrics['loss'][-1] < metrics['loss'][0]

  module = distill.student_module(config)
  candidates = planner_lib.make_candidate_offsets(
      num_radii=config.num_radii, num_angles=config.num_angles
  )
  dwell_grid = np.linspace(1.5, 20.0, config.num_dwells, dtype=np.float32)
  state, ts = env.reset(jax.random.PRNGKey(3))
  obs = ts.observation
  teach = planner_lib.planner_policy(
      None,
      obs,
      rate_fn=rates_lib.simple_canonical_rates,
      candidates=candidates,
      dwell_grid_seconds=dwell_grid,
  )
  assert teach.shape == (16, 3)
  student = module.apply({'params': params}, obs)
  assert student.shape == (16, 3)
  # Dwell dim lands near the teacher's [0, 1] fractions, not at the tanh
  # rails (output_scale covers the angstrom dims).
  dwell_err = float(jnp.mean(jnp.abs(student[:, 2] - teach[:, 2])))
  assert dwell_err < 0.45, dwell_err


def test_external_teacher_multi_dopant_distillation():
  """distill() with an external teacher (the multi-dopant planner over
  'vector_neighbors' observations) — the runs/distill_multidopant.py
  path."""
  from putting_dune_tpu.env import multi_dopant

  env = multi_dopant.MultiDopantEnv(
      lattice=lattice_lib.make_lattice(20),
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=8,
      num_dopants=2,
      dwell_seconds=5.0,
      observation_mode='vector_neighbors',
  )
  agent = planner_lib.MultiDopantPlannerAgent(
      rate_fn=rates_lib.simple_canonical_rates,
      num_dopants=2,
      dwell_seconds=5.0,
      max_distance_angstroms=2 * BOND,
      num_radii=5,
      num_angles=16,
  )
  teacher = agent.policy()
  config = distill.DistillConfig(
      num_iterations=2,
      rollout_length=8,
      sgd_steps_per_iteration=50,
      minibatch_size=128,
      hidden=(32, 32),
      output_scale=1.0,
  )
  params, metrics = distill.distill(
      env, None, config, seed=0, teacher=lambda obs: teacher(None, obs)
  )
  losses = metrics['loss']
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]
  module = distill.student_module(config)
  state, ts = env.reset(jax.random.PRNGKey(2))
  out = module.apply({'params': params}, ts.observation)
  assert out.shape == (8, 2)
  assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6


def test_train_and_save_roundtrip(tmp_path):
  env = _make_env(batch_size=8)
  config = distill.DistillConfig(
      num_iterations=1,
      rollout_length=4,
      sgd_steps_per_iteration=8,
      minibatch_size=32,
      hidden=(16,),
      num_radii=4,
      num_angles=8,
  )
  agent = distill.train_and_save(
      env, str(tmp_path / 'ckpt'), rates_lib.simple_canonical_rates, config
  )
  loaded = eval_agent.EvalAgent.load(str(tmp_path / 'ckpt'))
  obs = jnp.linspace(-2.0, 2.0, 80).reshape(8, 10)
  got = loaded.policy()(None, obs)
  want = agent.policy()(None, obs)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
  # Material-frame scale survives the round trip: outputs can exceed 1 A.
  assert float(jnp.max(jnp.abs(got))) <= config.output_scale + 1e-6


def test_mlp_output_scale_backward_compat(tmp_path):
  """Checkpoints saved before output_scale existed load at scale 1."""
  import json
  import os

  module = eval_agent.MLPPolicy(hidden=(8,), action_dim=2)
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))['params']
  agent = eval_agent.EvalAgent(module, params)
  d = str(tmp_path / 'old')
  agent.save(d)
  # Strip the new key, emulating a pre-output_scale checkpoint.
  with open(os.path.join(d, 'policy.json')) as f:
    meta = json.load(f)
  del meta['arch']['output_scale']
  with open(os.path.join(d, 'policy.json'), 'w') as f:
    json.dump(meta, f)
  loaded = eval_agent.EvalAgent.load(d)
  obs = jnp.ones((2, 10))
  np.testing.assert_allclose(
      np.asarray(loaded.policy()(None, obs)),
      np.asarray(agent.policy()(None, obs)),
      atol=1e-6,
  )
