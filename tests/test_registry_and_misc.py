"""Registry parity, GMM-in-simulator, dm_env wrapper render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.experiments import registry


def test_registry_names_match_reference():
  # Same names as reference registry.py:262-468.
  microscope = set(registry.microscope_experiment_names())
  for name in [
      'relative_random', 'relative_random_long',
      'relative_random_extra_long', 'greedy_on_neighbor',
      'greedy_short_of_neighbor', 'greedy_on_neighbor_offset_horizontally',
      'greedy_from_learned_rates_v3', 'greedy_from_learned_rates_v5',
      'ppo_simple_images_tf', 'ppo_learned_tf_2s', 'ppo_learned_tf_3s',
      'ppo_learned_tf_4s', 'ppo_v3_2s', 'ppo_v3_3s', 'ppo_v3_4s',
  ]:
    assert name in microscope, name
  train = set(registry.train_experiment_names())
  for name in [
      'relative_simple_rates', 'relative_prior_rates',
      'relative_simple_rates_from_images',
      'relative_simple_rates_from_images_variable_time',
      'direct_simple_rates_from_images',
  ]:
    assert name in train, name
  eval_names = set(registry.eval_experiment_names())
  for name in [
      'relative_random_simple', 'relative_random_prior_rates',
      'ppo_simple_images_tf',
  ]:
    assert name in eval_names, name


def test_all_eval_experiments_wire_up():
  """Every registered eval experiment's adapters, goal, and simulator
  config instantiate (catches registry wiring typos without running
  episodes; checkpoint loads are covered by the zoo tests)."""
  for name in registry.eval_experiment_names():
    experiment = registry.create_eval_experiment(name)
    adapters_and_goal = experiment.get_adapters_and_goal()
    assert adapters_and_goal.action_adapter.spec() is not None, name
    sim = experiment.get_simulator_config()
    assert callable(sim.rate_fn), name


def test_register_eval_experiment():
  experiment = registry.create_eval_experiment('relative_random_simple')
  registry.register_eval_experiment('custom_test_exp', experiment)
  assert 'custom_test_exp' in registry.eval_experiment_names()
  # Does not overwrite existing entries (reference :471-478).
  registry.register_eval_experiment('relative_random_simple', None)
  assert (
      registry.create_eval_experiment('relative_random_simple') is not None
  )


def test_gmm_rate_function_drives_simulator():
  rng = np.random.default_rng(5)
  gmm = rates_lib.GaussianMixtureRateFunction.sample_new(rng)
  lattice = lattice_lib.make_lattice(20)
  config = simulator_lib.SimulatorConfig(grid_columns=20)
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(0), lattice, config=config, batch_size=4
  )
  control = structures.BeamControl(
      position=jnp.full((4, 2), 0.5), dwell_seconds=jnp.full((4,), 2.0)
  )
  state, obs, result = simulator_lib.step(
      state, jax.random.PRNGKey(1), control, lattice, gmm, config=config
  )
  assert np.isfinite(np.asarray(result.num_transitions)).all()
  assert np.asarray(obs.silicon_in_view).all()


def test_dm_env_wrapper_render():
  from putting_dune_tpu import test_utils
  from putting_dune_tpu.env import dm_env_wrapper

  env = dm_env_wrapper.DmEnvWrapper(
      test_utils.create_simple_environment(batch_size=1), seed=0
  )
  env.reset()
  frame = env.render()
  assert frame.ndim == 3 and frame.shape[-1] == 3
  assert frame.dtype == np.uint8


def test_shipped_policy_checkpoints_load_and_reach_goals():
  """The model_weights checkpoints (native replacements for the
  reference's GCS TF agents) load through the registry and perform."""
  import os

  import numpy as np

  from putting_dune_tpu import eval_lib, run_helpers
  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights'
  )
  if not os.path.isdir(os.path.join(weights, '230127_from_state_2s')):
    import pytest

    pytest.skip('policy weights not shipped yet')

  exp = registry.create_microscope_experiment('ppo_learned_tf_2s')
  agent = exp.get_agent(
      np.random.default_rng(0), exp.get_adapters_and_goal()
  )
  env = run_helpers.create_batched_env(
      exp.get_adapters_and_goal,
      registry.create_eval_experiment(
          'relative_random_prior_rates'
      ).get_simulator_config,
      batch_size=4,
  )
  results = eval_lib.evaluate_batched(
      env, agent.policy(), list(range(4)), max_steps=200
  )
  agg = eval_lib.aggregate_results(results)
  assert agg.average_num_times_reached_goal >= 0.75


def test_shipped_distilled_planner_reaches_goals():
  """The distilled-planner checkpoint (agents/distill.py DAgger student)
  loads through the registry and solves the prior-rate task the
  reference's greedy controller cannot (~2% goals)."""
  import os

  import pytest

  from putting_dune_tpu import eval_lib, run_helpers
  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights'
  )
  if not os.path.isdir(os.path.join(weights, 'planner_distilled_prior')):
    pytest.skip('distilled planner weights not shipped yet')

  exp = registry.create_eval_experiment('planner_distilled_prior')
  agent = exp.get_agent(None, exp.get_adapters_and_goal())
  env = run_helpers.create_batched_env(
      exp.get_adapters_and_goal,
      exp.get_simulator_config,
      batch_size=8,
  )
  results = eval_lib.evaluate_batched(
      env, agent.policy(), list(range(8)), max_steps=200
  )
  agg = eval_lib.aggregate_results(results)
  assert agg.average_num_times_reached_goal >= 0.75


def test_eval_cli_rejects_mesh_with_host_loop():
  """--mesh with --nobatched must fail loudly: the per-seed host loop is
  single-device, and silently dropping the flag would let the user
  believe the suite was sharded."""
  from putting_dune_tpu import eval as eval_cli

  args = eval_cli.Args(
      experiment_name='greedy_simple_rates', eval_suite='tiny_eval',
      batched=False, mesh='data',
  )
  with pytest.raises(ValueError, match='batched'):
    eval_cli.main(args)


def test_multi_dopant_registry_checkpoint_reaches_goals():
  """The shipped multi_dopant_2 policy drives both dopants to their goals
  through the registry + batched evaluator (end-to-end CLI path)."""
  import os

  from putting_dune_tpu import eval_lib

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'multi_dopant_2'
  )
  if not os.path.isdir(weights):
    pytest.skip('multi_dopant_2 weights not shipped')

  exp = registry.create_multi_dopant_experiment('multi_dopant_2_ppo')
  env = exp.make_env(4, step_limit=200)
  agent = exp.get_agent(None, None)
  results = eval_lib.evaluate_batched(
      env, agent.policy(), list(range(4)), max_steps=200
  )
  agg = eval_lib.aggregate_results(results)
  assert agg.average_num_times_reached_goal >= 0.75
  assert agg.evaluator == eval_lib.BATCHED_EVALUATOR


def test_multi_dopant_3_registry_checkpoint_reaches_goals():
  """The shipped multi_dopant_3 policy drives all three dopants to their
  goals through the registry + batched evaluator (skips until the
  checkpoint ships)."""
  import os

  import pytest

  from putting_dune_tpu import eval_lib

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'multi_dopant_3'
  )
  if not os.path.isdir(weights):
    pytest.skip('multi_dopant_3 weights not shipped')

  exp = registry.create_multi_dopant_experiment('multi_dopant_3_ppo')
  env = exp.make_env(4, step_limit=300)
  agent = exp.get_agent(None, None)
  results = eval_lib.evaluate_batched(
      env, agent.policy(), list(range(4)), max_steps=300
  )
  agg = eval_lib.aggregate_results(results)
  assert agg.average_num_times_reached_goal >= 0.5
  assert agg.evaluator == eval_lib.BATCHED_EVALUATOR
