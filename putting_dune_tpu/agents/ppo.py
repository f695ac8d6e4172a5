"""Native PPO training on the batched device environment.

The reference ships frozen `ppo_*` TF policies trained outside the repo
(experiments/registry.py:71-164). This framework closes that loop: with the
simulator stepping >1M env-steps/sec on one chip, PPO trains end-to-end
on device — rollout collection, GAE, and clipped-objective updates all
inside jit. The resulting policies save as EvalAgent checkpoints, which is
what the registry's PolicyCheckpointAgent loads.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from putting_dune_tpu.env import env as env_lib


class ActorCritic(nn.Module):
  """Gaussian policy + value head over vector or image-dict observations.

  Vector obs: (B, D) array -> tanh MLP tower. Image obs: the env's
  {'image': (B, H, W, 1), 'goal_delta_angstroms': (B, 2)} dict -> strided
  conv encoder concatenated with the goal delta (the natural counterpart
  of the reference's ppo_simple_images agents).
  """

  action_dim: int = 2
  hidden: Tuple[int, ...] = (256, 256)
  conv_features: Tuple[int, ...] = (16, 32, 64)

  @nn.compact
  def __call__(self, obs):
    if isinstance(obs, dict):
      x = obs['image']
      for f in self.conv_features:
        x = nn.Conv(f, (3, 3), strides=(2, 2), name=f'conv_{f}')(x)
        x = nn.relu(x)
      x = x.reshape((x.shape[0], -1))
      x = jnp.concatenate([x, obs['goal_delta_angstroms']], axis=-1)
    else:
      x = obs
    for width in self.hidden:
      x = nn.tanh(nn.Dense(width)(x))
    mean = nn.tanh(nn.Dense(self.action_dim, name='policy_mean')(x))
    log_std = self.param(
        'log_std', nn.initializers.constant(-0.5), (self.action_dim,)
    )
    value = nn.Dense(1, name='value')(x)[..., 0]
    return mean, jnp.broadcast_to(log_std, mean.shape), value


def _goal_delta(obs):
  """Extracts the goal-delta feature (angstroms) from either obs layout."""
  if isinstance(obs, dict):
    return obs['goal_delta_angstroms']
  return obs[..., -2:]  # both vector feature layouts end with goal delta


@dataclasses.dataclass(frozen=True)
class PPOConfig:
  num_updates: int = 200
  rollout_length: int = 64
  learning_rate: float = 3e-4
  gamma_fallback: float = 0.99  # unused: the env supplies per-step discounts
  gae_lambda: float = 0.95
  clip_epsilon: float = 0.2
  value_coef: float = 0.5
  entropy_coef: float = 1e-3
  num_epochs: int = 4
  num_minibatches: int = 8
  max_grad_norm: float = 0.5
  hidden: Tuple[int, ...] = (256, 256)
  conv_features: Tuple[int, ...] = (16, 32, 64)
  # Potential-based reward shaping (training-time only): adds
  # discount * phi(s') - phi(s) with phi = -coef * ||goal_delta|| / bond.
  # Preserves the optimal policy (Ng et al., 1999) while densifying the
  # sparse goal-reaching reward; useful for pixel policies. 0 disables.
  reward_shaping_coef: float = 0.0


def _gaussian_logprob(mean, log_std, action):
  var = jnp.exp(2 * log_std)
  return jnp.sum(
      -0.5 * jnp.square(action - mean) / var
      - log_std
      - 0.5 * jnp.log(2 * jnp.pi),
      axis=-1,
  )


def make_train_fns(
    env: env_lib.PuttingDuneEnv, config: PPOConfig = PPOConfig(),
    mesh=None,
):
  """Builds (init_carry, run_updates, module) for chunked PPO training.

  init_carry(key) -> carry initializes params/optimizer/env state;
  run_updates(carry, num_updates) -> (carry, metrics) runs a jitted
  lax.scan of `num_updates` PPO updates (static arg — reuse the same
  chunk size to avoid recompiles). Chunking lets multi-hour runs save
  rolling checkpoints between device calls; make_train() wraps both into
  the single-call form.

  mesh: optional jax.sharding.Mesh with a 'data' axis. The environment
  batch (env state, timesteps, and therefore rollouts) is sharded over
  it while params/optimizer state stay replicated — the same GSPMD
  data-parallel pattern as the perception train loops
  (atom_detection/train.py): rollouts are communication-free (envs are
  independent), gradient/metric reductions ride ICI psums inserted by
  the compiler, and the minibatch permutation's cross-device gathers are
  handled by GSPMD.
  """
  action_dim = env.action_spec().shape[0]
  module = ActorCritic(
      action_dim=action_dim,
      hidden=config.hidden,
      conv_features=config.conv_features,
  )
  batch = env.batch_size

  optimizer = optax.chain(
      optax.clip_by_global_norm(config.max_grad_norm),
      optax.adam(config.learning_rate),
  )

  def init_carry(key: jax.Array, init_params=None):
    key, k_init, k_reset = jax.random.split(key, 3)
    spec = env.observation_spec()
    if isinstance(spec, dict):
      dummy = {
          k: jnp.zeros((1,) + tuple(v.shape)) for k, v in spec.items()
      }
    else:
      dummy = jnp.zeros((1,) + tuple(spec.shape))
    params = module.init(k_init, dummy)['params']
    if init_params is not None:
      # Warm start (continuation runs): adopt the given actor-critic
      # params; the template init above pins the expected tree/shape.
      params = jax.tree_util.tree_map(
          lambda t, p: jnp.asarray(p).astype(t.dtype).reshape(t.shape),
          params, init_params,
      )
    opt_state = optimizer.init(params)
    env_state, ts = env.reset(k_reset)
    if mesh is not None:
      from putting_dune_tpu.parallel import mesh as mesh_lib

      replicated = mesh_lib.replicated_sharding(mesh)
      params = jax.device_put(params, replicated)
      opt_state = jax.device_put(opt_state, replicated)
      env_state = mesh_lib.shard_batch(env_state, mesh)
      ts = mesh_lib.shard_batch(ts, mesh)
    return (params, opt_state, env_state, ts, key)

  def run_updates(carry, num_updates: int):
    def policy_step(carry, _):
      params, env_state, ts, key = carry
      key, k_act, k_step = jax.random.split(key, 3)
      mean, log_std, value = module.apply({'params': params},
                                          ts.observation)
      action = mean + jnp.exp(log_std) * jax.random.normal(
          k_act, mean.shape
      )
      logprob = _gaussian_logprob(mean, log_std, action)
      next_state, next_ts = env.step(env_state, action, k_step)
      reward = next_ts.reward
      if config.reward_shaping_coef:
        from putting_dune_tpu import constants as _constants

        coef = (
            config.reward_shaping_coef
            / _constants.CARBON_BOND_DISTANCE_ANGSTROMS
        )
        # Envs may define their own potential distance (e.g. the
        # multi-dopant env sums per-dopant goal distances); default is
        # the trailing goal-delta feature.
        if hasattr(env, 'shaping_distance'):
          dist = env.shaping_distance
        else:
          dist = lambda o: jnp.linalg.norm(_goal_delta(o), axis=-1)
        phi_s = -coef * dist(ts.observation)
        phi_sp = -coef * dist(next_ts.observation)
        # Skip shaping across auto-reset boundaries (s' belongs to the
        # next episode there); terminal discount=0 drops phi(s') itself.
        shaped = next_ts.discount * phi_sp - phi_s
        reward = reward + jnp.where(next_ts.first(), 0.0, shaped)
      transition = {
          'obs': ts.observation,
          'action': action,
          'logprob': logprob,
          'value': value,
          'reward': reward,
          # discount is 0 at terminals and gamma**elapsed otherwise, which
          # is exactly the GAE bootstrap factor for this env.
          'discount': next_ts.discount,
          'next_is_first': next_ts.first(),
      }
      return (params, next_state, next_ts, key), transition

    def update(carry, _):
      params, opt_state, env_state, ts, key = carry

      (params_c, env_state, ts, key), traj = jax.lax.scan(
          policy_step,
          (params, env_state, ts, key),
          None,
          length=config.rollout_length,
      )
      del params_c

      _, _, last_value = module.apply({'params': params}, ts.observation)

      def gae_step(carry, t):
        gae, next_value = carry
        # Auto-reset boundaries: no bootstrap across a FIRST step.
        boot = jnp.where(t['next_is_first'], 0.0, t['discount'])
        delta = t['reward'] + boot * next_value - t['value']
        gae = delta + boot * config.gae_lambda * gae
        return (gae, t['value']), gae

      (_, _), advantages = jax.lax.scan(
          gae_step,
          (jnp.zeros((batch,)), last_value),
          traj,
          reverse=True,
      )
      returns = advantages + traj['value']

      flat = jax.tree_util.tree_map(
          lambda x: x.reshape((config.rollout_length * batch,) + x.shape[2:]),
          {**traj, 'advantage': advantages, 'return': returns},
      )

      def epoch(carry, _):
        params, opt_state, key = carry
        key, k_perm = jax.random.split(key)
        n = config.rollout_length * batch
        perm = jax.random.permutation(k_perm, n)
        mb_size = n // config.num_minibatches
        idx = perm[: mb_size * config.num_minibatches].reshape(
            config.num_minibatches, mb_size
        )

        def minibatch(carry, mb_idx):
          params, opt_state = carry
          mb = jax.tree_util.tree_map(lambda x: x[mb_idx], flat)

          def loss_fn(params):
            mean, log_std, value = module.apply(
                {'params': params}, mb['obs']
            )
            logprob = _gaussian_logprob(mean, log_std, mb['action'])
            ratio = jnp.exp(logprob - mb['logprob'])
            adv = mb['advantage']
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            unclipped = ratio * adv
            clipped = jnp.clip(
                ratio, 1 - config.clip_epsilon, 1 + config.clip_epsilon
            ) * adv
            policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
            value_loss = 0.5 * jnp.mean(
                jnp.square(value - mb['return'])
            )
            entropy = jnp.mean(
                jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e),
                        axis=-1)
            )
            total = (
                policy_loss
                + config.value_coef * value_loss
                - config.entropy_coef * entropy
            )
            return total, (policy_loss, value_loss, entropy)

          (loss, aux), grads = jax.value_and_grad(
              loss_fn, has_aux=True
          )(params)
          updates, opt_state = optimizer.update(grads, opt_state, params)
          params = optax.apply_updates(params, updates)
          return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            minibatch, (params, opt_state), idx
        )
        return (params, opt_state, key), jnp.mean(losses)

      (params, opt_state, key), losses = jax.lax.scan(
          epoch, (params, opt_state, key), None, length=config.num_epochs
      )

      metrics = {
          'loss': jnp.mean(losses),
          'mean_reward': jnp.mean(traj['reward']),
          'terminal_rate': jnp.mean(
              (traj['discount'] == 0.0).astype(jnp.float32)
          ),
          'mean_value': jnp.mean(traj['value']),
      }
      return (params, opt_state, env_state, ts, key), metrics

    carry, metrics = jax.lax.scan(update, carry, None, length=num_updates)
    return carry, metrics

  return (
      jax.jit(init_carry),
      jax.jit(run_updates, static_argnums=(1,)),
      module,
  )


def make_train(
    env: env_lib.PuttingDuneEnv, config: PPOConfig = PPOConfig(),
    mesh=None,
):
  """Builds a jitted PPO train function for the given batched env.

  Returns train(key) -> (params, metrics) where metrics hold per-update
  mean episode returns and losses. The entire optimization — rollouts, GAE
  with the env's per-step simulated-time discounts, minibatched clipped
  updates — is ONE jitted lax.scan program. With a mesh, the env batch is
  data-parallel over its 'data' axis (see make_train_fns).
  """
  init_carry, run_updates, module = make_train_fns(env, config, mesh=mesh)

  @jax.jit
  def train(key: jax.Array):
    carry, metrics = run_updates(init_carry(key), config.num_updates)
    return carry[0], metrics

  return train, module


def dryrun_mesh_training_step(devices) -> None:
  """Proves the data-parallel PPO path on an explicit device mesh.

  Called by __graft_entry__.dryrun_multichip: builds a tiny env whose
  batch is sharded over the 'data' axis, runs two PPO updates, and
  asserts params stayed replicated while the env state stayed sharded.
  """
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu.parallel import mesh as mesh_lib

  n = len(devices)
  mesh = mesh_lib.make_mesh(
      axis_sizes=(n,), axis_names=('data',), devices=devices
  )
  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(10), batch_size=4 * n
  )
  config = PPOConfig(
      num_updates=2, rollout_length=4, num_minibatches=2,
      num_epochs=1, hidden=(16,),
  )
  init_carry, run_updates, _ = make_train_fns(env, config, mesh=mesh)
  carry0 = init_carry(jax.random.PRNGKey(0))
  # Pin the carry's sharding contract at the jit boundary: with dryrun-
  # sized arrays XLA would otherwise legally replicate the tiny env state
  # on output (at production sizes sharding wins on its own).
  rep = mesh_lib.replicated_sharding(mesh)
  bsh = mesh_lib.batch_sharding(mesh)

  def like(tree, sharding):
    return jax.tree_util.tree_map(lambda _: sharding, tree)

  carry_shardings = (
      like(carry0[0], rep),  # params
      like(carry0[1], rep),  # optimizer state
      like(carry0[2], bsh),  # env state: batch-sharded
      like(carry0[3], bsh),  # timestep: batch-sharded
      rep,  # PRNG key
  )
  fn = jax.jit(
      run_updates,
      static_argnums=(1,),
      out_shardings=(carry_shardings, None),
  )
  carry, metrics = fn(carry0, 2)
  params, env_state = carry[0], carry[2]
  jax.block_until_ready(params)
  leaf = jax.tree_util.tree_leaves(params)[0]
  assert leaf.sharding.is_fully_replicated, 'PPO params must replicate'
  state_leaf = env_state.sim.material.offset
  assert (
      not state_leaf.sharding.is_fully_replicated or n == 1
  ), 'PPO env batch must stay data-sharded'
  loss = float(jnp.asarray(metrics['loss'])[-1])
  assert jnp.isfinite(loss), 'PPO mesh step loss not finite'
  print(f'dryrun PPO data-parallel step OK on {n} devices (loss={loss:.4f})')


def as_eval_agent(params, env: env_lib.PuttingDuneEnv, config: PPOConfig):
  """Wraps trained ActorCritic params as a saveable EvalAgent."""
  from putting_dune_tpu.agents import eval_agent

  action_dim = env.action_spec().shape[0]
  spec = env.observation_spec()
  params = jax.device_get(params)
  if isinstance(spec, dict):
    # Image policies keep the full actor-critic module (mean head used at
    # inference); saved as an 'actor_critic' checkpoint.
    return eval_agent.EvalAgent.from_actor_critic(
        params,
        hidden=config.hidden,
        conv_features=config.conv_features,
        action_dim=action_dim,
        image_size=spec['image'].shape[0],
    )
  policy_module = eval_agent.MLPPolicy(
      hidden=config.hidden, action_dim=action_dim
  )
  # Transfer the actor tower + mean head into the eval policy layout:
  # MLPPolicy layers Dense_0..N then final Dense; ActorCritic shares
  # names Dense_0..N for the tower and 'policy_mean' for the head.
  policy_params = {}
  for i in range(len(config.hidden)):
    policy_params[f'Dense_{i}'] = params[f'Dense_{i}']
  policy_params[f'Dense_{len(config.hidden)}'] = params['policy_mean']
  return eval_agent.EvalAgent(policy_module, policy_params)


def train_and_save(
    env: env_lib.PuttingDuneEnv,
    save_dir: str,
    config: PPOConfig = PPOConfig(),
    seed: int = 0,
    updates_per_chunk: Optional[int] = None,
    max_wall_seconds: Optional[float] = None,
    log_every_chunk: bool = False,
    init_params_from: Optional[str] = None,
    mesh=None,
):
  """Trains PPO and saves the policy as an EvalAgent checkpoint.

  With updates_per_chunk set, training runs as repeated jitted chunks,
  saving a rolling checkpoint to save_dir after every chunk (long runs
  survive interruption) and stopping early once max_wall_seconds is
  exceeded. Without it, the whole run is one device call.

  mesh: optional 'data' mesh for data-parallel training (env batch
  sharded, params replicated; see make_train_fns).

  init_params_from warm-starts from a saved 'actor_critic' EvalAgent
  checkpoint dir (image policies keep the full actor-critic, so a
  continuation is lossless). MLP checkpoints drop the critic at save
  time and cannot seed PPO; they are rejected.
  """
  import json as _json
  import os as _os
  import time as _time

  init_params = None
  if init_params_from:
    with open(_os.path.join(init_params_from, 'policy.json')) as f:
      kind = _json.load(f)['kind']
    if kind != 'actor_critic':
      raise ValueError(
          f'init_params_from supports actor_critic checkpoints only, '
          f'got {kind!r} at {init_params_from} (MLP checkpoints keep the '
          f'actor tower but drop the critic).'
      )
    from putting_dune_tpu.agents import eval_agent as _eval_agent

    init_params = _eval_agent.EvalAgent.load(init_params_from).params

  if updates_per_chunk is None:
    init_carry, run_updates, module = make_train_fns(env, config, mesh=mesh)

    @jax.jit
    def train(key):
      carry, metrics = run_updates(
          init_carry(key, init_params), config.num_updates
      )
      return carry[0], metrics

    params, metrics = train(jax.random.PRNGKey(seed))
    agent = as_eval_agent(params, env, config)
    agent.save(save_dir)
    return agent, jax.device_get(metrics)

  init_carry, run_updates, module = make_train_fns(env, config, mesh=mesh)
  carry = init_carry(jax.random.PRNGKey(seed), init_params)
  chunks: list = []
  done = 0
  t0 = _time.monotonic()
  while done < config.num_updates:
    n = min(updates_per_chunk, config.num_updates - done)
    carry, metrics = run_updates(carry, n)
    metrics = jax.device_get(metrics)  # forces completion (host fetch)
    chunks.append(metrics)
    done += n
    agent = as_eval_agent(carry[0], env, config)
    agent.save(save_dir)
    elapsed = _time.monotonic() - t0
    if log_every_chunk:
      print(
          f'ppo: {done}/{config.num_updates} updates, {elapsed:.0f}s,'
          f" loss={metrics['loss'][-1]:.4f}"
          f" terminal_rate={float(np.mean(metrics['terminal_rate'])):.4f}",
          flush=True,
      )
    if max_wall_seconds is not None and elapsed > max_wall_seconds:
      break
  metrics = {
      k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]
  }
  return as_eval_agent(carry[0], env, config), metrics
