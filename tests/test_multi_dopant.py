"""Multi-dopant env (beyond-parity extension): contract + physics."""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import multi_dopant

LATTICE = lattice_lib.make_lattice(20)


def make_env(batch=8, dopants=3, **kwargs):
  return multi_dopant.MultiDopantEnv(
      lattice=LATTICE,
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=batch,
      num_dopants=dopants,
      step_limit=50,
      **kwargs,
  )


def test_reset_contract():
  env = make_env()
  state, ts = env.reset(jax.random.PRNGKey(0))
  assert ts.observation.shape == (8, 12)
  assert (np.asarray(ts.step_type) == env_lib.FIRST).all()
  # Dopant sites are distinct within each env.
  si = np.asarray(state.si_indices)
  for b in range(si.shape[0]):
    assert len(set(si[b].tolist())) == 3
  # Goals are valid lattice atoms in the annulus.
  obs = np.asarray(ts.observation).reshape(8, 3, 4)
  delta = np.linalg.norm(obs[..., 2:], axis=-1)
  assert (delta >= 0.1 - 1e-6).all() and (delta <= 50.0 + 1e-6).all()


def test_step_moves_dopants_and_keeps_them_distinct():
  env = make_env(batch=16, dopants=2)
  state, ts = env.reset(jax.random.PRNGKey(1))

  @jax.jit
  def run(state, ts, key):
    def body(carry, _):
      state, ts, key = carry
      key, k_act, k_step = jax.random.split(key, 3)
      # Aim the beam at dopant 0's goal direction (rough heuristic).
      action = jax.random.uniform(k_act, (16, 2), minval=-1, maxval=1)
      state, ts = env.step(state, action, k_step)
      distinct = state.si_indices[:, 0] != state.si_indices[:, 1]
      return (state, ts, key), (ts.step_type, distinct,
                                state.si_indices)

    (state, ts, key), (types, distinct, sites) = jax.lax.scan(
        body, (state, ts, jax.random.PRNGKey(2)), None, length=60
    )
    return state, types, distinct, sites

  state, types, distinct, sites = run(state, ts, jax.random.PRNGKey(2))
  # Dopants never collide.
  assert np.asarray(distinct).all()
  # Transitions actually happen (sites change over the rollout).
  sites = np.asarray(sites)
  assert (sites[0] != sites[-1]).any()
  # Step limit of 50 forces LAST steps inside a 60-step rollout.
  assert (np.asarray(types) == env_lib.LAST).any()
  # After LAST, envs auto-reset to FIRST on the next step.
  types = np.asarray(types)
  last_steps = np.argwhere(types == env_lib.LAST)
  t, b = last_steps[0]
  if t + 1 < types.shape[0]:
    assert types[t + 1, b] == env_lib.FIRST


def test_terminal_reward_when_all_reach_goals():
  env = make_env(batch=4, dopants=2, action_mode='absolute')
  state, ts = env.reset(jax.random.PRNGKey(3))
  # Force goals equal to current positions -> immediate terminal.
  si = lattice_lib.site_position(
      env.lattice, state.si_indices, state.offset, state.theta
  )
  state = state.replace(goals=si)
  # Beam at the far FOV corner: transition rates are ~0 there, so the
  # dopants stay put and the at-goal check fires.
  action = -jnp.ones((4, 2))
  state, ts = env.step(state, action, jax.random.PRNGKey(4))
  assert (np.asarray(ts.step_type) == env_lib.LAST).all()
  assert (np.asarray(ts.reward) > 0.9).all()
  assert (np.asarray(ts.discount) == 0.0).all()


def test_ppo_trains_on_multi_dopant_env():
  """The PPO trainer runs unchanged on the multi-dopant env."""
  from putting_dune_tpu.agents import ppo

  env = make_env(batch=16, dopants=2)
  config = ppo.PPOConfig(
      num_updates=2,
      rollout_length=8,
      num_epochs=1,
      num_minibatches=2,
      hidden=(16,),
  )
  train, _ = ppo.make_train(env, config)
  _, metrics = train(jax.random.PRNGKey(0))
  assert np.isfinite(np.asarray(metrics['loss'])).all()


def test_goals_are_distinct_per_env():
  """Two dopants can never draw the same goal atom (sequential masking)."""
  env = make_env(batch=64, dopants=3)
  for seed in range(3):
    state, _ = env.reset(jax.random.PRNGKey(seed))
    goals = np.asarray(state.goals)  # (B, D, 2)
    for b in range(goals.shape[0]):
      d2 = np.linalg.norm(
          goals[b][:, None] - goals[b][None], axis=-1
      )
      off_diag = d2[~np.eye(3, dtype=bool)]
      assert (off_diag > 1e-6).all(), (b, goals[b])


def test_sticky_latch_is_permanent_and_counter_stays_consecutive():
  """latched persists after the dopant leaves its goal; the counter is a
  true consecutive count (no max() overload)."""
  env = make_env(batch=4, dopants=2, action_mode='absolute')
  state, _ = env.reset(jax.random.PRNGKey(5))
  si = lattice_lib.site_position(
      env.lattice, state.si_indices, state.offset, state.theta
  )
  # Dopant 0 at its goal, dopant 1 far away -> latch d0 only.
  goals = np.asarray(state.goals).copy()
  goals[:, 0] = np.asarray(si)[:, 0]
  goals[:, 1] = np.asarray(si)[:, 1] + 30.0
  state = state.replace(goals=jnp.asarray(goals))
  action = -jnp.ones((4, 2))  # beam far away: no transitions
  state, ts = env.step(state, action, jax.random.PRNGKey(6))
  assert np.asarray(state.latched)[:, 0].all()
  assert not np.asarray(state.latched)[:, 1].any()
  assert (np.asarray(ts.step_type) == env_lib.MID).all()

  # Move dopant 0's goal away: counter resets to 0, latch persists.
  goals2 = np.asarray(state.goals).copy()
  goals2[:, 0] += 30.0
  state = state.replace(goals=jnp.asarray(goals2))
  state, ts = env.step(state, action, jax.random.PRNGKey(7))
  assert np.asarray(state.latched)[:, 0].all()
  assert (np.asarray(state.consecutive)[:, 0] == 0).all()

  # Latched dopants read a zero goal delta in the observation.
  obs = np.asarray(ts.observation).reshape(4, 2, 4)
  assert (np.abs(obs[:, 0, 2:]) < 1e-6).all()
  assert (np.abs(obs[:, 1, 2:]) > 1.0).any()


def test_image_observations_contain_d_dopants():
  """Image mode renders a STEM frame with D silicon atoms + goal deltas."""
  from putting_dune_tpu import constants

  env = make_env(batch=4, dopants=3, observation_mode='image',
                 image_size=64)
  spec = env.observation_spec()
  assert spec['image'].shape == (64, 64, 1)
  assert spec['goal_delta_angstroms'].shape == (6,)

  state, ts = env.reset(jax.random.PRNGKey(11))
  obs = ts.observation
  assert obs['image'].shape == (4, 64, 64, 1)
  assert np.isfinite(np.asarray(obs['image'])).all()
  assert obs['goal_delta_angstroms'].shape == (4, 6)
  # All D dopants render as silicon in the FOV window.
  window = env._atom_window(state)
  n_si = np.asarray(
      (np.asarray(window.atomic_numbers) == constants.SILICON).sum(-1)
  )
  assert (n_si == 3).all(), n_si

  # Steps produce fresh frames and keep the dict layout.
  state, ts = env.step(
      state, jnp.zeros((4, 2)), jax.random.PRNGKey(12)
  )
  assert ts.observation['image'].shape == (4, 64, 64, 1)
  # Shaping distance works on dict observations.
  d = env.shaping_distance(ts.observation)
  assert d.shape == (4,) and (np.asarray(d) > 0).all()


def test_ppo_trains_on_multi_dopant_image_env():
  """The PPO conv path runs unchanged on D-dopant image observations."""
  from putting_dune_tpu.agents import ppo

  env = make_env(batch=8, dopants=2, observation_mode='image',
                 image_size=32)
  config = ppo.PPOConfig(
      num_updates=1,
      rollout_length=4,
      num_epochs=1,
      num_minibatches=2,
      hidden=(16,),
      conv_features=(4, 8),
      reward_shaping_coef=0.05,
  )
  train, _ = ppo.make_train(env, config)
  _, metrics = train(jax.random.PRNGKey(0))
  assert np.isfinite(np.asarray(metrics['loss'])).all()


def test_kmc_truncation_count_surfaces_capped_physics():
  """The KMC max_events cap is visible at the env level (parity with
  PuttingDuneEnv.kmc_truncation_count)."""

  def runaway_rates(si_pos, neighbor_pos, beam_pos):
    del neighbor_pos, beam_pos
    return jnp.full(si_pos.shape[:-1] + (3,), 1e6)

  env = multi_dopant.MultiDopantEnv(
      lattice=LATTICE,
      rate_fn=runaway_rates,
      batch_size=4,
      num_dopants=2,
      step_limit=50,
      max_kmc_events_per_step=25,
  )
  state, _ = env.reset(jax.random.PRNGKey(0))
  assert np.asarray(state.kmc_truncation_count).tolist() == [0] * 4
  action = jnp.zeros((4, 2), jnp.float32)
  state, _ = env.step(state, action, jax.random.PRNGKey(1))
  assert np.asarray(state.kmc_truncation_count).tolist() == [1] * 4

  # Sane rates: never tripped.
  env_sane = make_env(batch=4, dopants=2)
  s, _ = env_sane.reset(jax.random.PRNGKey(0))
  s, _ = env_sane.step(s, action, jax.random.PRNGKey(2))
  assert np.asarray(s.kmc_truncation_count).tolist() == [0] * 4
