"""Agent evaluation: batched on-device suites + reference-parity host loop.

TPU-first rewrite of /root/reference/putting_dune/eval_lib.py:39-214.

Primary API: evaluate_batched() runs an entire eval suite as ONE batch of
environments on device — each env stops contributing once its episode ends
— so a 10k-seed "big_eval" takes seconds instead of hours. The device
while-loop is chunked (default 64 steps per dispatch) and the host checks
time.perf_counter() between chunks, so the reference's combined
10-minute budget (simulated env seconds + wall-clock, reference
eval_lib.py:82,128-140) holds on device too: each live episode is
truncated once env_seconds + shared wall-clock exceeds the budget. The
per-episode *agent* wall-time split is still not separable inside a batch
(reported as NaN → 'n/a'); the host-loop evaluate() keeps exact reference
per-episode timing semantics for single-env parity runs.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import logging
import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu.agents import agent_lib
from putting_dune_tpu.env import env as env_lib

EVAL_SUITES = {
    'tiny_eval': tuple(range(10)),
    'small_eval': tuple(range(100)),
    'medium_eval': tuple(range(1_000)),
    'big_eval': tuple(range(10_000)),
}

# Combined episode budget (reference eval_lib.py:82).
DEFAULT_TIMEOUT_SECONDS = 600.0

Policy = Callable[[jax.Array, jnp.ndarray], jnp.ndarray]


class StatefulPolicy:
  """Protocol for policies that carry device state across steps.

  Used by evaluate_batched for agents that need memory — e.g. the in-loop
  drift corrector (agents/drift_correction.py) tracks a frame history.
  Implementations provide:

    init(example_obs) -> pstate         # pytree, leading batch dim
    step(pstate, key, obs, first) -> (pstate, action)

  `first` is the (B,) bool FIRST-step mask: rows that auto-reset this
  step must re-initialize their slice of the carried state.
  """

  def init(self, example_obs):
    raise NotImplementedError

  def step(self, pstate, key, obs, first):
    raise NotImplementedError


# Evaluator provenance labels. The two evaluators have DIFFERENT timing
# semantics and their aggregates must not be silently mixed:
#   * 'batched': whole suite as one device batch; the 10-min budget combines
#     simulated env time with the batch-shared wall clock (checked between
#     device chunks), but the per-episode agent wall-time split is not
#     separable inside a batch and is reported as NaN ('n/a').
#   * 'host': reference-exact per-episode loop; the budget combines agent
#     wall-clock + simulated env time (reference eval_lib.py:128-144).
BATCHED_EVALUATOR = 'batched(sim+wall)'
HOST_EVALUATOR = 'host(wall+sim-time)'


@dataclasses.dataclass(frozen=True)
class EvalResult:
  """Per-episode result (reference eval_lib.py:47-59).

  evaluator: which evaluator produced this result (see the provenance
  labels above); '' only for legacy callers that construct results
  directly.
  """

  seed: int
  reached_goal: bool
  num_actions_taken: int
  agent_seconds_to_goal: float
  environment_seconds_to_goal: float
  total_reward: float
  evaluator: str = ''

  @property
  def seconds_to_goal(self) -> float:
    return self.agent_seconds_to_goal + self.environment_seconds_to_goal


@dataclasses.dataclass(frozen=True)
class AggregateEvalResults:
  """Aggregates (reference eval_lib.py:61-74): goal-reaching averages.

  evaluator: provenance + timing semantics of the results aggregated here
  ('mixed(...)' if results from both evaluators were combined — a
  comparison error downstream code can now detect).
  """

  average_num_times_reached_goal: float
  average_num_actions_taken: float
  average_agent_seconds_to_goal: float
  average_environment_seconds_to_goal: float
  average_total_reward: float
  evaluator: str = ''

  @property
  def average_seconds_to_goal(self) -> float:
    return (
        self.average_agent_seconds_to_goal
        + self.average_environment_seconds_to_goal
    )


def aggregate_results(
    results: Sequence[EvalResult],
) -> AggregateEvalResults:
  """Averages over goal-reaching episodes (reference eval_lib.py:187-214)."""
  reached = [r for r in results if r.reached_goal]
  denom = max(len(reached), 1)
  evaluators = sorted({r.evaluator for r in results})
  evaluator = (
      evaluators[0] if len(evaluators) == 1
      else 'mixed(' + ','.join(evaluators) + ')'
  )
  return AggregateEvalResults(
      average_num_times_reached_goal=len(reached) / len(results),
      average_num_actions_taken=(
          sum(r.num_actions_taken for r in reached) / denom
      ),
      average_agent_seconds_to_goal=(
          sum(r.agent_seconds_to_goal for r in reached) / denom
      ),
      average_environment_seconds_to_goal=(
          sum(r.environment_seconds_to_goal for r in reached) / denom
      ),
      average_total_reward=sum(r.total_reward for r in reached) / denom,
      evaluator=evaluator,
  )


def evaluate_batched(
    env: env_lib.PuttingDuneEnv,
    policy: Policy,
    seeds: Sequence[int],
    *,
    timeout_seconds: float = DEFAULT_TIMEOUT_SECONDS,
    max_steps: Optional[int] = None,
    video_save_dir: Optional[str] = None,
    video_envs: int = 4,
    chunk_steps: int = 64,
    mesh=None,
) -> List[EvalResult]:
  """Evaluates a pure policy over one batch of environments on device.

  Args:
    env: the batched environment; env.batch_size must equal len(seeds).
    policy: pure policy fn (key, observation) -> action.
    seeds: one seed per environment (keys are derived from them).
    timeout_seconds: combined per-episode budget in seconds (reference
      eval_lib.py:82): simulated env seconds plus the batch-shared
      wall-clock elapsed since the rollout started. Wall-clock is
      sampled on the host between device chunks, so truncation is
      accurate to one chunk.
    max_steps: optional step cap (defaults to env.config.step_limit).
    video_save_dir: if set, save per-env episode GIFs for the first
      `video_envs` environments. Within an episode the lattice pose is
      frozen (KMC transitions only relabel the silicon site), so the
      device loop records just (si_index, offset, theta, goal) per step
      and the atom cloud is rebuilt on the host — a few KB per episode
      instead of full frames.
    video_envs: number of leading environments to record.
    chunk_steps: device steps per dispatch between host wall-clock checks.
    mesh: optional jax.sharding.Mesh with a 'data' axis. The environment
      batch (seeds, env state, episode bookkeeping) is sharded over it,
      so a big_eval suite spreads across chips: rollouts are
      communication-free (envs are independent) and the only collective
      is the all-done reduction GSPMD inserts for the loop condition.
      len(seeds) should be divisible by the axis size. Incompatible with
      video_save_dir (episode video capture stays single-chip).

  Returns:
    One EvalResult per seed (agent wall-time is reported as NaN in batch
    mode — device policy compute is not separable per env).
  """
  if env.batch_size != len(seeds):
    raise ValueError(
        f'env.batch_size={env.batch_size} != len(seeds)={len(seeds)}'
    )
  if max_steps is None:
    # PuttingDuneEnv keeps the limit in config; MultiDopantEnv inline.
    config = getattr(env, 'config', None)
    max_steps = (
        (getattr(config, 'step_limit', None) if config is not None else None)
        or getattr(env, 'step_limit', None)
        or 600
    )
  if mesh is not None and video_save_dir:
    raise ValueError(
        'mesh-sharded evaluation does not support video capture; run the '
        'video pass unsharded.'
    )
  nvid = min(video_envs, env.batch_size) if video_save_dir else 0
  cap = max_steps + 1

  def video_pose(state):
    """(si (nvid, D), offset (nvid, 2), theta (nvid,), goals (nvid, D, 2));
    the single-dopant env is the D=1 case."""
    if hasattr(state, 'sim'):
      material = state.sim.material
      return (
          material.si_index[:nvid, None],
          material.offset[:nvid],
          material.theta[:nvid],
          state.goal.position_material[:nvid, None, :],
      )
    return (
        state.si_indices[:nvid],
        state.offset[:nvid],
        state.theta[:nvid],
        state.goals[:nvid],
    )

  seeds_arr = jnp.asarray(np.asarray(seeds, np.uint32))
  stateful = isinstance(policy, StatefulPolicy)

  def init_carry(seeds_arr):
    # The batched env consumes one key per step for the whole batch, and
    # splits per-env randomness internally; episode diversity comes from
    # the batch dimension. Fold the seed set into the master key so
    # different suites give independent streams.
    master = jax.random.fold_in(
        jax.random.PRNGKey(20260816), jnp.sum(seeds_arr)
    )
    k_reset, k_loop = jax.random.split(master)
    state, ts = env.reset(k_reset)

    batch = env.batch_size
    init = dict(
        state=state,
        ts=ts,
        key=k_loop,
        done=jnp.zeros((batch,), bool),
        reached=jnp.zeros((batch,), bool),
        steps=jnp.zeros((batch,), jnp.int32),
        env_seconds=ts.elapsed_seconds,
        reward=jnp.zeros((batch,), jnp.float32),
        loop_i=jnp.asarray(0, jnp.int32),
    )
    if hasattr(state, 'kmc_truncation_count'):
      # Total steps (across the whole batch) where the KMC max_events
      # safety cap cut a dwell short — nonzero means some episodes ran
      # on incomplete physics (e.g. a misbehaving learned rate model)
      # and the aggregate metrics deserve suspicion.
      init['kmc_truncations'] = jnp.asarray(0, jnp.int32)
    if stateful:
      init['pstate'] = policy.init(ts.observation)
    if nvid:
      si0, off0, th0, goal0 = video_pose(state)
      d = si0.shape[-1]
      init['video'] = dict(
          si=jnp.zeros((cap, nvid, d), jnp.int32).at[0].set(si0),
          offset=jnp.zeros((cap, nvid, 2), jnp.float32).at[0].set(off0),
          theta=jnp.zeros((cap, nvid), jnp.float32).at[0].set(th0),
          goal=jnp.zeros((cap, nvid, d, 2), jnp.float32).at[0].set(goal0),
      )
    return init

  @jax.jit
  def run_chunk(carry, wall_elapsed):
    # Up to `chunk_steps` env steps per dispatch; `wall_elapsed` is the
    # host wall-clock at chunk start, shared by every episode in the
    # batch (the reference's combined sim+wall budget, eval_lib.py:128).
    chunk_end = carry['loop_i'] + chunk_steps

    def cond(c):
      return jnp.logical_and(
          jnp.logical_not(jnp.all(c['done'])),
          jnp.logical_and(c['loop_i'] < max_steps, c['loop_i'] < chunk_end),
      )

    def body(c):
      key, k_policy, k_step = jax.random.split(c['key'], 3)
      if stateful:
        pstate, action = policy.step(
            c['pstate'], k_policy, c['ts'].observation, c['ts'].first()
        )
      else:
        action = policy(k_policy, c['ts'].observation)
      state, ts = env.step(c['state'], action, k_step)
      live = jnp.logical_not(c['done'])

      steps = c['steps'] + live.astype(jnp.int32)
      env_seconds = c['env_seconds'] + jnp.where(
          live, ts.elapsed_seconds, 0.0
      )
      reward = c['reward'] + jnp.where(live, ts.reward, 0.0)
      terminal = jnp.logical_and(live, ts.step_type == env_lib.LAST)
      reached = jnp.logical_or(
          c['reached'],
          jnp.logical_and(terminal, ts.discount == 0.0),
      )
      done = jnp.logical_or(c['done'], terminal)
      # Auto-reset FIRST steps also end the previous episode for us.
      done = jnp.logical_or(done, jnp.logical_and(live, ts.first()))
      # Episodes that exceed the combined simulated + wall budget stop
      # counting (truncated, not reached).
      done = jnp.logical_or(done, env_seconds + wall_elapsed > timeout_seconds)
      out = dict(
          state=state,
          ts=ts,
          key=key,
          done=done,
          reached=reached,
          steps=steps,
          env_seconds=env_seconds,
          reward=reward,
          loop_i=c['loop_i'] + 1,
      )
      if 'kmc_truncations' in c:
        # The per-episode counter only grows within an episode (auto-reset
        # zeroes it), so a strict increase marks a step the cap truncated.
        # Only live lanes count: done envs keep auto-resetting while the
        # rest of the batch finishes, and their filler episodes must not
        # inflate the warning total.
        out['kmc_truncations'] = c['kmc_truncations'] + jnp.sum(
            jnp.logical_and(
                live,
                state.kmc_truncation_count
                > c['state'].kmc_truncation_count,
            ).astype(jnp.int32)
        )
      if stateful:
        out['pstate'] = pstate
      if nvid:
        i = c['loop_i'] + 1
        si_i, off_i, th_i, goal_i = video_pose(state)
        vid = c['video']
        out['video'] = dict(
            si=vid['si'].at[i].set(si_i),
            offset=vid['offset'].at[i].set(off_i),
            theta=vid['theta'].at[i].set(th_i),
            goal=vid['goal'].at[i].set(goal_i),
        )
      return out

    return jax.lax.while_loop(cond, body, carry)

  if mesh is None:
    carry = jax.jit(init_carry)(seeds_arr)
  else:
    # Batch-shard every (B, ...) leaf over the 'data' axis (scalars and
    # non-divisible leaves replicate, the shard_batch rule) — declared as
    # OUT shardings on the jitted reset, so the full-suite env.reset
    # itself executes SPMD across the mesh instead of allocating the
    # whole batch on device 0 and redistributing; run_chunk then runs
    # SPMD with GSPMD-inserted reductions for the all-done condition.
    from putting_dune_tpu.parallel import mesh as mesh_lib

    batch_s = mesh_lib.batch_sharding(mesh)
    replicated_s = mesh_lib.replicated_sharding(mesh)
    axis_size = mesh.shape['data']
    batch = int(seeds_arr.shape[0])
    # Only leaves whose leading dim IS the env batch are sharded; a
    # divisibility-only rule would also catch shape coincidences like
    # the (2,) loop PRNG key on a 2-device mesh, adding pointless
    # per-step cross-chip key gathers to a communication-free rollout.
    out_shardings = jax.tree_util.tree_map(
        lambda s: (
            batch_s
            if len(s.shape) >= 1
            and s.shape[0] == batch
            and batch % axis_size == 0
            else replicated_s
        ),
        jax.eval_shape(init_carry, seeds_arr),
    )
    carry = jax.jit(init_carry, out_shardings=out_shardings)(seeds_arr)
  # Compile BEFORE starting the wall clock: the budget covers agent
  # compute + simulated time (reference eval_lib.py:128-144), never XLA
  # compilation — a cold compile cache must not truncate episodes.
  run_chunk.lower(carry, jnp.float32(0.0)).compile()
  t_start = time.perf_counter()
  while True:
    wall = time.perf_counter() - t_start
    if wall >= timeout_seconds:
      # Wall budget alone exhausted: every still-live episode is
      # truncated (env_seconds >= 0 would trip the combined check on the
      # next step anyway) — stop dispatching.
      break
    carry = run_chunk(carry, jnp.float32(wall))
    loop_i = int(carry['loop_i'])
    if loop_i >= max_steps or bool(jnp.all(carry['done'])):
      break

  reached, steps, env_seconds, reward = jax.device_get(
      (carry['reached'], carry['steps'], carry['env_seconds'],
       carry['reward'])
  )
  if 'kmc_truncations' in carry:
    kmc_truncations = int(jax.device_get(carry['kmc_truncations']))
    if kmc_truncations > 0:
      logging.warning(
          'evaluate_batched: the KMC max_events safety cap truncated %d '
          'step(s) across the batch — the rate function produced event '
          'rates beyond the configured physics budget, so affected '
          'episodes ran incomplete dynamics and these results should be '
          'treated as suspect.', kmc_truncations,
      )
  video = jax.device_get(carry['video']) if nvid else None
  if nvid:
    _save_batched_videos(
        env, seeds, steps, video, video_save_dir, nvid
    )
  results = []
  for i, seed in enumerate(seeds):
    ok = bool(reached[i])
    results.append(
        EvalResult(
            seed=int(seed),
            reached_goal=ok,
            num_actions_taken=int(steps[i]),
            # Per-env agent wall-time is not separable inside a batch:
            # NaN here (rendered as 'n/a'), never 0.0, so batched and
            # host timing numbers can't be silently conflated.
            agent_seconds_to_goal=float('nan'),
            environment_seconds_to_goal=(
                float(env_seconds[i]) if ok else float('nan')
            ),
            total_reward=float(reward[i]),
            evaluator=BATCHED_EVALUATOR,
        )
    )
  return results


def _save_batched_videos(env, seeds, steps, video, save_dir, nvid):
  """Rebuilds atom clouds from recorded poses and writes per-env GIFs."""
  import os

  from putting_dune_tpu import constants as _constants
  from putting_dune_tpu import lattice as _lattice_lib
  from putting_dune_tpu import plotting_utils

  os.makedirs(save_dir, exist_ok=True)
  cap = video['si'].shape[0]
  for i in range(nvid):
    count = min(int(steps[i]) + 1, cap)
    positions_seq = []
    numbers_seq = []
    for t in range(count):
      world = np.asarray(
          _lattice_lib.world_positions(
              env.lattice,
              jnp.asarray(video['offset'][t, i]),
              jnp.asarray(video['theta'][t, i]),
          )
      )
      numbers = np.full(world.shape[0], _constants.CARBON)
      numbers[np.asarray(video['si'][t, i], np.int64)] = _constants.SILICON
      positions_seq.append(world)
      numbers_seq.append(numbers)
    anim = plotting_utils.generate_video_from_trajectory(
        positions_seq,
        numbers_seq,
        goal_position=np.asarray(video['goal'][0, i]),  # (D, 2)
    )
    anim.save(os.path.join(save_dir, f'{int(seeds[i])}.gif'))


def _snapshot_frame(env):
  """Captures (positions, numbers, goal, beam) for video generation."""
  import numpy as _np

  from putting_dune_tpu import constants as _constants
  from putting_dune_tpu import lattice as _lattice_lib

  state = env._state  # pylint: disable=protected-access
  material = state.sim.material
  world = _np.asarray(
      _lattice_lib.world_positions(
          env._env.lattice, material.offset, material.theta  # pylint: disable=protected-access
      )
  )[0]
  numbers = _np.full(world.shape[0], _constants.CARBON)
  numbers[int(_np.asarray(material.si_index)[0])] = _constants.SILICON
  goal = _np.asarray(state.goal.position_material)[0]
  return world, numbers, goal


def evaluate(
    agent: agent_lib.Agent,
    env,
    seeds: Sequence[int],
    *,
    timeout: dt.timedelta = dt.timedelta(minutes=10),
    video_save_dir: Optional[str] = None,
) -> List[EvalResult]:
  """Host-loop evaluation with exact reference timing semantics.

  Parity: reference eval_lib.py:77-184 — per-seed episodes on a dm_env
  environment, with the timeout covering simulated env seconds + agent
  wall-clock seconds; optional per-seed episode GIFs (reference
  :104-108, 167-179). `env` is the single-env dm_env wrapper
  (putting_dune_tpu.env.dm_env_wrapper.DmEnvWrapper).
  """
  import os

  agent.set_mode(agent_lib.AgentMode.EVAL)
  results = []
  for seed in seeds:
    env.seed(seed)
    time_step = env.reset()

    agent_elapsed = 0.0
    env_elapsed = float(env.last_elapsed_seconds)
    num_actions = 0
    total_reward = 0.0
    frames = []
    if video_save_dir is not None:
      frames.append(_snapshot_frame(env))

    while agent_elapsed + env_elapsed < timeout.total_seconds():
      t0 = time.perf_counter()
      action = agent.step(time_step)
      agent_elapsed += time.perf_counter() - t0

      time_step = env.step(action)
      env_elapsed += float(env.last_elapsed_seconds)
      num_actions += 1
      if time_step.reward is not None:
        total_reward += float(time_step.reward)
      if video_save_dir is not None:
        frames.append(_snapshot_frame(env))

      if time_step.last():
        break

    if video_save_dir is not None and frames:
      from putting_dune_tpu import plotting_utils

      os.makedirs(video_save_dir, exist_ok=True)
      anim = plotting_utils.generate_video_from_trajectory(
          [f[0] for f in frames],
          [f[1] for f in frames],
          goal_position=frames[0][2],
      )
      anim.save(os.path.join(video_save_dir, f'{seed}.gif'))

    discount = 1.0 if time_step.discount is None else float(time_step.discount)
    reached_goal = bool(time_step.last() and discount == 0.0)
    results.append(
        EvalResult(
            seed=seed,
            reached_goal=reached_goal,
            num_actions_taken=num_actions,
            agent_seconds_to_goal=(
                agent_elapsed if reached_goal else float('nan')
            ),
            environment_seconds_to_goal=(
                env_elapsed if reached_goal else float('nan')
            ),
            total_reward=total_reward,
            evaluator=HOST_EVALUATOR,
        )
    )
  return results
