"""Planner-to-policy distillation (DAgger) — compile the planner into an MLP.

Beyond-parity extension. The rate-aware planner (agents/planner.py) reaches
goals the reference's GreedyAgent cannot (prior law: greedy 2% vs planner
100%), but it spends a (B, K, 3) rate evaluation per step. This module
distills that controller into the same tiny MLP head the shipped PPO
policies use, so the planner's behavior deploys at pure feed-forward cost
(one 10->256->256->2 MLP apply per step — the real-microscope inference
budget of the reference's TF eval agents, agents/tf_eval_agent.py:23-32).

The imitation loop is DAgger (Ross et al., 2011), fully on device:

  for each iteration (one jitted program per iteration):
    roll the BATCHED env `rollout_length` steps; at every visited state
      query the TEACHER (planner_policy) for its action, and execute a
      beta-mixture of teacher/student actions (beta decays per iteration,
      so later iterations label the STUDENT's own state distribution —
      the fix for compounding imitation error);
    append (obs, teacher_action) to the device-resident dataset;
    run `epochs_per_iteration` epochs of minibatch SGD on MSE(student,
      teacher) over everything collected so far.

Everything — env rollouts, teacher queries, dataset, SGD — lives in one
lax.scan-structured program per iteration; nothing crosses the host
boundary except per-iteration metrics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import eval_agent
from putting_dune_tpu.agents import planner as planner_lib
from putting_dune_tpu.env import env as env_lib


@dataclasses.dataclass(frozen=True)
class DistillConfig:
  """Defaults sized for a few TPU-minutes; shrink for tests."""

  num_iterations: int = 10
  rollout_length: int = 64
  sgd_steps_per_iteration: int = 256
  minibatch_size: int = 4096
  learning_rate: float = 3e-4
  hidden: Tuple[int, ...] = (256, 256)
  # Probability of executing the teacher's action: beta_i = init * decay^i.
  teacher_mix_init: float = 1.0
  teacher_mix_decay: float = 0.5
  # Action range of the tanh head, angstroms. Must cover the teacher's
  # candidate grid (planner_lib.make_candidate_offsets max_radius).
  output_scale: float = 3.3
  # Planner (teacher) settings — match the adapter's dwell.
  dwell_seconds: float = 5.0
  lookahead_discount: float = 0.0
  num_radii: int = 10
  num_angles: int = 64
  # Variable-dwell distillation: set to the adapter's exact
  # (min_dwell_seconds, max_dwell_seconds) range to distill the
  # dwell-optimizing planner; actions gain a 3rd dim (the dwell as a
  # [0, 1] fraction, action_adapters._dwell_from_action). The student's
  # tanh head covers it fine — MSE pulls the dim into [0, 1] and the
  # adapter clips.
  dwell_range_seconds: Optional[Tuple[float, float]] = None
  num_dwells: int = 8
  image_duration_seconds: float = 2.0

  @property
  def action_dim(self) -> int:
    return 3 if self.dwell_range_seconds is not None else 2

  @property
  def head_output_scale(self):
    """Per-dim tanh scales: angstrom deltas at output_scale; the dwell
    fraction (variable-dwell mode) at 1 so MSE weights it fairly."""
    if self.dwell_range_seconds is None:
      return self.output_scale
    return (self.output_scale, self.output_scale, 1.0)


def student_module(config: DistillConfig) -> 'eval_agent.MLPPolicy':
  return eval_agent.MLPPolicy(
      hidden=config.hidden,
      action_dim=config.action_dim,
      output_scale=config.head_output_scale,
  )


def make_distill_fns(
    env: env_lib.PuttingDuneEnv,
    rate_fn: Optional[rates_lib.RateFunction],
    config: DistillConfig = DistillConfig(),
    teacher=None,
):
  """Builds (init_carry, run_iteration, module) for chunked distillation.

  run_iteration(carry, iteration_index) is one jitted DAgger iteration;
  the dataset buffer has static capacity num_iterations * rollout_length
  * batch samples and is filled in iteration order, so the compiled
  program is shape-stable across iterations.

  teacher: optional obs -> (B, action_dim) pure function to imitate (any
  batched controller with the env's action semantics — e.g. the
  multi-dopant planner). Default: the single-dopant rate-aware planner
  built from rate_fn + the config's planner settings.
  """
  module = student_module(config)

  if teacher is None:
    candidates = planner_lib.make_candidate_offsets(
        num_radii=config.num_radii, num_angles=config.num_angles
    )
    dwell_grid = None
    if config.dwell_range_seconds is not None:
      lo, hi = config.dwell_range_seconds
      dwell_grid = np.linspace(lo, hi, config.num_dwells, dtype=np.float32)

    def teacher(obs):  # noqa: F811 — the documented default
      return planner_lib.planner_policy(
          None,
          obs,
          rate_fn=rate_fn,
          dwell_seconds=config.dwell_seconds,
          candidates=candidates,
          lookahead_discount=config.lookahead_discount,
          dwell_grid_seconds=dwell_grid,
          image_duration_seconds=config.image_duration_seconds,
      )

  batch = env.batch_size
  obs_dim = env.observation_spec().shape[0]
  samples_per_iter = config.rollout_length * batch
  capacity = config.num_iterations * samples_per_iter

  optimizer = optax.adam(config.learning_rate)

  def init_carry(key: jax.Array):
    key, k_init, k_reset = jax.random.split(key, 3)
    params = module.init(k_init, jnp.zeros((1, obs_dim)))['params']
    opt_state = optimizer.init(params)
    env_state, ts = env.reset(k_reset)
    buf_obs = jnp.zeros((capacity, obs_dim), jnp.float32)
    buf_act = jnp.zeros((capacity, config.action_dim), jnp.float32)
    return {
        'params': params,
        'opt_state': opt_state,
        'env_state': env_state,
        'ts': ts,
        'key': key,
        'buf_obs': buf_obs,
        'buf_act': buf_act,
        'filled': jnp.zeros((), jnp.int32),  # samples collected so far
    }

  def collect(carry, beta):
    """One rollout segment: execute beta-mixed actions, label with the
    teacher, write into the buffer at carry['filled']."""

    def step(scan_carry, _):
      env_state, ts, key = scan_carry
      key, k_mix, k_step = jax.random.split(key, 3)
      obs = ts.observation
      teach_act = teacher(obs)
      student_act = module.apply({'params': carry['params']}, obs)
      take_teacher = (
          jax.random.uniform(k_mix, (obs.shape[0], 1)) < beta
      )
      action = jnp.where(take_teacher, teach_act, student_act)
      env_state, ts = env.step(env_state, action, k_step)
      return (env_state, ts, key), (obs, teach_act)

    (env_state, ts, key), (obs_seq, act_seq) = jax.lax.scan(
        step,
        (carry['env_state'], carry['ts'], carry['key']),
        None,
        length=config.rollout_length,
    )
    new_obs = obs_seq.reshape(samples_per_iter, obs_dim)
    new_act = act_seq.reshape(samples_per_iter, config.action_dim)
    buf_obs = jax.lax.dynamic_update_slice(
        carry['buf_obs'], new_obs, (carry['filled'], 0)
    )
    buf_act = jax.lax.dynamic_update_slice(
        carry['buf_act'], new_act, (carry['filled'], 0)
    )
    return dict(
        carry,
        env_state=env_state,
        ts=ts,
        key=key,
        buf_obs=buf_obs,
        buf_act=buf_act,
        filled=carry['filled'] + samples_per_iter,
    )

  def fit(carry):
    """sgd_steps_per_iteration minibatch SGD steps, each on indices drawn
    uniformly (with replacement) from the filled prefix of the buffer —
    constant per-iteration work and shapes, so the jitted program is
    reused across all DAgger iterations."""

    def sgd_step(sgd_carry, _):
      params, opt_state, key = sgd_carry
      key, k_idx = jax.random.split(key)
      idx = jax.random.randint(
          k_idx, (config.minibatch_size,), 0, carry['filled']
      )
      obs = carry['buf_obs'][idx]
      act = carry['buf_act'][idx]

      def loss_fn(p):
        pred = module.apply({'params': p}, obs)
        return jnp.mean(jnp.sum((pred - act) ** 2, axis=-1))

      loss, grads = jax.value_and_grad(loss_fn)(params)
      updates, opt_state = optimizer.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)
      return (params, opt_state, key), loss

    (params, opt_state, key), losses = jax.lax.scan(
        sgd_step,
        (carry['params'], carry['opt_state'], carry['key']),
        None,
        length=config.sgd_steps_per_iteration,
    )
    return dict(carry, params=params, opt_state=opt_state, key=key), losses

  @jax.jit
  def run_iteration(carry, beta):
    carry = collect(carry, beta)
    carry, losses = fit(carry)
    return carry, {'loss': losses[-1]}

  return init_carry, run_iteration, module


def distill(
    env: env_lib.PuttingDuneEnv,
    rate_fn: rates_lib.RateFunction,
    config: DistillConfig = DistillConfig(),
    seed: int = 0,
    progress=None,
    teacher=None,
):
  """Runs the full DAgger loop; returns (params, metrics dict of lists)."""
  init_carry, run_iteration, _ = make_distill_fns(
      env, rate_fn, config, teacher=teacher
  )
  carry = init_carry(jax.random.PRNGKey(seed))
  losses = []
  for i in range(config.num_iterations):
    beta = config.teacher_mix_init * config.teacher_mix_decay**i
    carry, metrics = run_iteration(carry, jnp.float32(beta))
    loss = float(metrics['loss'])  # host fetch: forces real completion
    losses.append(loss)
    if progress is not None:
      progress(i, {'loss': loss, 'beta': beta})
  return carry['params'], {'loss': losses}


def train_and_save(
    env: env_lib.PuttingDuneEnv,
    workdir: str,
    rate_fn: rates_lib.RateFunction,
    config: DistillConfig = DistillConfig(),
    seed: int = 0,
    progress=None,
    teacher=None,
) -> eval_agent.EvalAgent:
  """Distills and saves an EvalAgent checkpoint loadable by the registry
  (experiments/registry.py PolicyCheckpointAgent)."""
  params, _ = distill(
      env, rate_fn, config, seed=seed, progress=progress, teacher=teacher
  )
  module = student_module(config)
  agent = eval_agent.EvalAgent(module, params)
  agent.save(workdir)
  return agent
