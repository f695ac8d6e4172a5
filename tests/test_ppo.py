"""PPO trainer tests: the jitted train program runs, improves, and exports
a loadable eval-agent checkpoint."""

import jax
import numpy as np

from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import test_utils
from putting_dune_tpu.agents import eval_agent
from putting_dune_tpu.agents import ppo


def test_ppo_trains_and_exports(tmp_path):
  env = test_utils.create_simple_environment(batch_size=32)
  config = ppo.PPOConfig(
      num_updates=6,
      rollout_length=16,
      num_epochs=2,
      num_minibatches=4,
      hidden=(32, 32),
  )
  agent, metrics = ppo.train_and_save(
      env, str(tmp_path / 'policy'), config=config, seed=0
  )
  assert np.isfinite(metrics['loss']).all()
  assert metrics['mean_reward'].shape == (6,)
  # Some terminals should occur within the rollouts (goals get reached by
  # chance under simple rates with random-ish actions).
  assert np.isfinite(metrics['terminal_rate']).all()

  # The exported checkpoint loads and acts within the action bounds.
  restored = eval_agent.EvalAgent.load(str(tmp_path / 'policy'))
  import dm_env as _dm

  obs = np.zeros(10, np.float32)
  ts = _dm.restart(obs)
  action = restored.step(ts)
  assert action.shape == (2,)
  assert (np.abs(action) <= 1.0).all()

  # And the policy function works batched for the fast evaluator.
  policy = restored.policy()
  batch_obs = jax.numpy.zeros((8, 10))
  actions = policy(None, batch_obs)
  assert actions.shape == (8, 2)


def test_ppo_chunked_training(tmp_path):
  """Chunked mode: rolling checkpoints, concatenated metrics."""
  env = test_utils.create_simple_environment(batch_size=16)
  config = ppo.PPOConfig(
      num_updates=4,
      rollout_length=8,
      num_epochs=1,
      num_minibatches=2,
      hidden=(16,),
  )
  agent, metrics = ppo.train_and_save(
      env, str(tmp_path / 'policy'), config=config, seed=0,
      updates_per_chunk=2,
  )
  assert metrics['loss'].shape == (4,)
  # The rolling checkpoint from the last chunk is loadable.
  restored = eval_agent.EvalAgent.load(str(tmp_path / 'policy'))
  actions = restored.policy()(None, jax.numpy.zeros((4, 10)))
  assert actions.shape == (4, 2)


def test_ppo_from_pixels(tmp_path):
  """Image-observation PPO: trains, exports, reloads (64x64 images)."""
  import jax.numpy as jnp
  import putting_dune_tpu.simulator as sim_lib
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu import rates as rates_lib
  from putting_dune_tpu.env import action_adapters, env as env_lib
  from putting_dune_tpu.env import features as features_lib

  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(20),
      rate_fn=rates_lib.simple_canonical_rates,
      adapter=action_adapters.RelativeToSiliconActionAdapter(),
      features=features_lib.ImageFeatures(image_size=64),
      config=env_lib.EnvConfig(
          sim=sim_lib.SimulatorConfig(grid_columns=20, image_size=64)
      ),
      batch_size=8,
  )
  config = ppo.PPOConfig(
      num_updates=2,
      rollout_length=8,
      num_epochs=1,
      num_minibatches=2,
      hidden=(32,),
      conv_features=(4, 8),
  )
  agent, metrics = ppo.train_and_save(
      env, str(tmp_path / 'pixel_policy'), config=config, seed=0
  )
  assert np.isfinite(metrics['loss']).all()

  restored = eval_agent.EvalAgent.load(str(tmp_path / 'pixel_policy'))
  policy = restored.policy()
  obs = {
      'image': jnp.zeros((4, 64, 64, 1)),
      'goal_delta_angstroms': jnp.zeros((4, 2)),
  }
  actions = policy(None, obs)
  assert actions.shape == (4, 2)
  assert (np.abs(np.asarray(actions)) <= 1.0).all()


def test_ppo_warm_start_from_actor_critic(tmp_path):
  """A continuation run seeds its params from a saved actor_critic
  checkpoint (lossless for image policies, which keep the critic)."""
  import jax
  import jax.numpy as jnp
  import putting_dune_tpu.simulator as sim_lib
  import pytest
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu import rates as rates_lib
  from putting_dune_tpu.env import action_adapters, env as env_lib
  from putting_dune_tpu.env import features as features_lib

  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(20),
      rate_fn=rates_lib.simple_canonical_rates,
      adapter=action_adapters.RelativeToSiliconActionAdapter(),
      features=features_lib.ImageFeatures(image_size=64),
      config=env_lib.EnvConfig(
          sim=sim_lib.SimulatorConfig(grid_columns=20, image_size=64)
      ),
      batch_size=8,
  )
  config = ppo.PPOConfig(
      num_updates=1,
      rollout_length=4,
      num_epochs=1,
      num_minibatches=2,
      hidden=(32,),
      conv_features=(4, 8),
  )
  first_dir = str(tmp_path / 'first')
  ppo.train_and_save(env, first_dir, config=config, seed=0)

  # The warm-started carry must hold exactly the checkpoint's params.
  init_carry, _, _ = ppo.make_train_fns(env, config)
  loaded = eval_agent.EvalAgent.load(first_dir).params
  carry = init_carry(jax.random.PRNGKey(3), loaded)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_array_equal(
          np.asarray(a), np.asarray(b)
      ),
      carry[0], loaded,
  )

  # And a full continuation run accepts init_params_from end-to-end.
  agent, metrics = ppo.train_and_save(
      env, str(tmp_path / 'second'), config=config, seed=1,
      init_params_from=first_dir,
  )
  assert np.isfinite(metrics['loss']).all()

  # MLP (vector) checkpoints are rejected with a clear error.
  vec_env = test_utils.create_simple_environment(batch_size=8)
  vec_config = ppo.PPOConfig(
      num_updates=1, rollout_length=4, num_epochs=1, num_minibatches=2,
      hidden=(16,),
  )
  vec_dir = str(tmp_path / 'vec')
  ppo.train_and_save(vec_env, vec_dir, config=vec_config, seed=0)
  with pytest.raises(ValueError, match='actor_critic'):
    ppo.train_and_save(
        vec_env, str(tmp_path / 'vec2'), config=vec_config, seed=1,
        init_params_from=vec_dir,
    )


def test_ppo_reward_shaping_runs():
  """Shaped training runs and produces finite metrics (vector env)."""
  env = test_utils.create_simple_environment(batch_size=16)
  config = ppo.PPOConfig(
      num_updates=3,
      rollout_length=8,
      num_epochs=1,
      num_minibatches=2,
      hidden=(16,),
      reward_shaping_coef=0.05,
  )
  train, _ = ppo.make_train(env, config)
  _, metrics = train(jax.random.PRNGKey(0))
  assert np.isfinite(np.asarray(metrics['loss'])).all()
  # Shaped rewards are dense: mean_reward should not be exactly the sparse
  # terminal-only signal (nonzero on most updates).
  assert np.abs(np.asarray(metrics['mean_reward'])).max() > 0.0
