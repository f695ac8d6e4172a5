"""Rate-aware planning controller: per-step on-device beam optimization.

Beyond-parity extension. The reference's strongest analytic controller is
GreedyAgent (agents/agent_lib.py:81-186): pick the neighbor closest to the
goal, then place the beam at a FIXED canonical offset from it — either the
hand-chosen (1.42, 0) or an offline grid-searched argmax of a transition
function (find_argmax, :136-161). That static offset maximizes the rate
toward the chosen neighbor in isolation; it ignores the rates it induces
toward the other two neighbors (which can bounce the dopant backwards) and
cannot adapt when the rate law is not rotation-equivariant (the reference's
own human prior peaks at the REFLECTION of each neighbor angle,
graphene.py:223, so a fixed offset in the target direction is far from
optimal under it).

This planner instead optimizes the beam position EVERY STEP, on device,
against the actual rate function:

    score(c) = sum_i  p_i(c) * v_i,
    p_i(c)   = r_i(c)/R(c) * (1 - exp(-R(c) * dwell)),   R = sum_i r_i
    v_i      = (||g - s|| - ||g - n_i||)  [+ lookahead bonus]

p_i is the exact probability (under the KMC law, kmc.py:54-160) that the
first transition within the dwell moves the silicon to neighbor i; v_i is
that move's progress toward the goal in angstroms. Scoring a dense polar
grid of K candidate offsets for the whole env batch is one (B, K, 3)
elementwise rate evaluation — microseconds on TPU, and it works unchanged
with the learned neural predictor (rate_learning/predictor.py
as_rate_function), giving true model-based control with a learned dynamics
model: simulate -> record -> learn rates -> plan with them.

An optional one-step geometric lookahead adds gamma * best second-step
progress from n_i: on the honeycomb lattice the post-transition neighbor
set is known in closed form (the vacated site plus its +-120 degree
rotations), so no rollout is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import agent_lib


def make_candidate_offsets(
    num_radii: int = 10,
    num_angles: int = 64,
    min_radius: float = 0.3,
    max_radius: float = 3.2,
) -> np.ndarray:
  """Polar grid of (K, 2) candidate beam offsets from the silicon, in
  angstroms. Denser than the reference's offline find_argmax step (0.05 A
  on a square) is unnecessary: rate laws vary on the bond scale (1.42 A).
  """
  radii = np.linspace(min_radius, max_radius, num_radii, dtype=np.float32)
  angles = np.linspace(
      0.0, 2.0 * np.pi, num_angles, endpoint=False, dtype=np.float32
  )
  rr, aa = np.meshgrid(radii, angles, indexing='ij')
  return np.stack(
      [rr * np.cos(aa), rr * np.sin(aa)], axis=-1
  ).reshape(-1, 2)


def planner_policy(
    key: Optional[jax.Array],
    observation: jnp.ndarray,
    *,
    rate_fn: rates_lib.RateFunction,
    dwell_seconds: float = 5.0,
    candidates: np.ndarray,
    lookahead_discount: float = 0.0,
    dwell_grid_seconds: Optional[np.ndarray] = None,
    image_duration_seconds: float = 2.0,
    dwell_objective: str = 'per_second',
    overshoot_penalty_angstroms: float = 0.71,
) -> jnp.ndarray:
  """Batched pure planner policy over 10-dim material-frame features.

  Args:
    key: unused (the planner is deterministic); kept for the Policy API.
    observation: (B, 10) SingleSiliconMaterialFrameFeatures —
      [si_xy, 3 neighbor deltas, goal delta], angstroms.
    rate_fn: the planning model; any KMC RateFunction
      (si, neighbors, beam) -> (B, 3) rates.
    dwell_seconds: beam dwell per action (must match the adapter) when the
      dwell is fixed.
    candidates: (K, 2) candidate beam offsets from the silicon, angstroms.
    lookahead_discount: weight of the geometric second-step bonus
      (0 disables it).
    dwell_grid_seconds: if set, ALSO optimize the dwell over this (D,)
      grid of seconds, scoring expected progress PER SIMULATED SECOND
      (dwell + image time — the quantity the env clock charges and the
      terminal reward gamma**elapsed discounts, simulator.py clock). The
      returned action then has a 3rd dim: the dwell as a [0, 1] fraction
      of [grid_min, grid_max], matching the variable-dwell adapters
      (action_adapters._dwell_from_action).
    image_duration_seconds: per-action imaging time added to the clock.
    dwell_objective: 'per_second' (default) divides expected progress by
      dwell + image time — best when the terminal reward's gamma**elapsed
      clock is the scarce resource. 'per_frame' maximizes net progress
      per ACTION instead: under instrument drift every frame costs one
      drift increment regardless of dwell, so long decisive dwells beat
      many short ones. Overshoot is charged explicitly: extra transitions
      beyond the first during a dwell are Poisson, E[extra] = R*T - P(any
      transition), each costing ~overshoot_penalty_angstroms of progress.
    overshoot_penalty_angstroms: expected progress lost per unwanted
      post-first transition ('per_frame' only); ~half a bond by default.

  Returns:
    (B, 2) material-frame actions (beam deltas from the silicon,
    angstroms) for RelativeToSiliconMaterialFrameActionAdapter — or
    (B, 3) with the dwell fraction appended when dwell_grid_seconds is
    set.
  """
  del key
  if dwell_objective not in ('per_second', 'per_frame'):
    raise ValueError(
        f"dwell_objective must be 'per_second' or 'per_frame', got"
        f' {dwell_objective!r}'
    )
  batch = observation.shape[0]
  si = observation[:, 0:2]
  neighbor_deltas = observation[:, 2:8].reshape(batch, 3, 2)
  goal_delta = observation[:, 8:10]

  cand = jnp.asarray(candidates, jnp.float32)  # (K, 2)
  k = cand.shape[0]

  # Rate evaluation for all B*K (env, candidate) pairs in one call.
  si_flat = jnp.broadcast_to(si[:, None, :], (batch, k, 2)).reshape(-1, 2)
  nbr = si[:, None, :] + neighbor_deltas  # (B, 3, 2) absolute positions
  nbr_flat = jnp.broadcast_to(
      nbr[:, None, :, :], (batch, k, 3, 2)
  ).reshape(-1, 3, 2)
  beam_flat = (si[:, None, :] + cand[None, :, :]).reshape(-1, 2)
  r = rate_fn(si_flat, nbr_flat, beam_flat).reshape(batch, k, 3)
  r = jnp.maximum(r, 0.0)

  total = jnp.sum(r, axis=-1)  # (B, K)
  frac = jnp.where(
      total[..., None] > 0.0, r / jnp.maximum(total[..., None], 1e-30), 0.0
  )  # (B, K, 3)

  # Progress toward goal of each one-hop move, angstroms.
  dist_now = jnp.linalg.norm(goal_delta, axis=-1)  # (B,)
  dist_next = jnp.linalg.norm(
      goal_delta[:, None, :] - neighbor_deltas, axis=-1
  )  # (B, 3)
  value = dist_now[:, None] - dist_next  # (B, 3)

  if lookahead_discount > 0.0:
    # After s -> n_i, the new neighbor set is {s, n_i + R(+-120deg)(s - n_i)}
    # (honeycomb geometry; positions are exact because transitions only
    # relabel lattice sites — lattice.py).
    back = -neighbor_deltas  # s - n_i, (B, 3, 2)
    cos120 = -0.5
    sin120 = jnp.sqrt(3.0) / 2.0

    def rot(v, s):
      x, y = v[..., 0], v[..., 1]
      return jnp.stack(
          [cos120 * x - s * sin120 * y, s * sin120 * x + cos120 * y],
          axis=-1,
      )

    second = jnp.stack([back, rot(back, 1.0), rot(back, -1.0)], axis=2)
    # Positions of second-hop sites relative to si: n_i + second - si.
    second_abs = neighbor_deltas[:, :, None, :] + second  # (B, 3, 3, 2)
    dist_second = jnp.linalg.norm(
        goal_delta[:, None, None, :] - second_abs, axis=-1
    )  # (B, 3, 3)
    bonus = jnp.maximum(
        dist_next[..., None] - dist_second, 0.0
    ).max(axis=-1)  # (B, 3)
    value = value + lookahead_discount * bonus

  if dwell_grid_seconds is None:
    # P(first transition = i, within dwell) under the exponential
    # waiting-time law the KMC engine samples from (kmc.py).
    p_any = 1.0 - jnp.exp(-total * dwell_seconds)  # (B, K)
    score = jnp.sum(
        frac * p_any[..., None] * value[:, None, :], axis=-1
    )  # (B, K)
    best = jnp.argmax(score, axis=-1)  # (B,)
    return cand[best]

  dwells = jnp.asarray(dwell_grid_seconds, jnp.float32)  # (D,)
  p_any = 1.0 - jnp.exp(
      -total[..., None] * dwells[None, None, :]
  )  # (B, K, D)
  expected_progress = (
      jnp.sum(frac * value[:, None, :], axis=-1)[..., None] * p_any
  )  # (B, K, D)
  if dwell_objective == 'per_frame':
    # Net progress per action: expected first-transition progress minus
    # the expected cost of extra (post-first) transitions, which for a
    # Poisson(R*T) count is R*T - P(N >= 1).
    extra_hops = total[..., None] * dwells[None, None, :] - p_any
    rate_score = (
        expected_progress - overshoot_penalty_angstroms * extra_hops
    )
  else:
    rate_score = expected_progress / (
        dwells[None, None, :] + image_duration_seconds
    )  # angstroms per simulated second
  flat = rate_score.reshape(batch, -1)
  best = jnp.argmax(flat, axis=-1)
  best_k, best_d = best // dwells.shape[0], best % dwells.shape[0]
  span = jnp.maximum(dwells[-1] - dwells[0], 1e-9)
  dwell_frac = (dwells[best_d] - dwells[0]) / span
  return jnp.concatenate([cand[best_k], dwell_frac[:, None]], axis=-1)


def multi_dopant_planner_policy(
    key: Optional[jax.Array],
    observation: jnp.ndarray,
    *,
    rate_fn: rates_lib.RateFunction,
    num_dopants: int,
    dwell_seconds: float,
    max_distance_angstroms: float,
    candidates: np.ndarray,
) -> jnp.ndarray:
  """Planner for the D-dopant env (env/multi_dopant.py, 'relative' actions
  + 'vector_neighbors' observations).

  The env steers ONE beam anchored at the first unlatched dopant; this
  policy scores candidate beam offsets around that anchor by expected
  progress of the anchor toward ITS goal — the same first-transition law
  as the single-dopant planner (other dopants' rates are negligible at
  beam offsets within a couple of bonds of the anchor, and latched goals
  stay latched by construction). Zero training required: this solves the
  multi-dopant task the PPO policies had to learn.

  Args:
    key: unused.
    observation: (B, D*4 + 6) — per-dopant [x, y, goal_dx, goal_dy] plus
      the anchor's 3 neighbor deltas.
    rate_fn: the env's rate function (planning model).
    num_dopants: D.
    dwell_seconds: the env's fixed dwell.
    max_distance_angstroms: the env's action scale; actions are emitted
      in units of it (clipped to [-1, 1] by the env).
    candidates: (K, 2) candidate beam offsets, angstroms (radii should
      not exceed max_distance_angstroms or the env will clip them).

  Returns:
    (B, 2) actions in [-1, 1] (units of max_distance_angstroms).
  """
  del key
  batch = observation.shape[0]
  d = num_dopants
  per = observation[:, : d * 4].reshape(batch, d, 4)
  nbr_deltas = observation[:, d * 4 :].reshape(batch, 3, 2)

  # Anchor = first dopant with a live (nonzero) goal delta — latched
  # dopants read zero delta (multi_dopant._observation), and the env picks
  # the first unlatched one as the action anchor.
  live = jnp.linalg.norm(per[..., 2:4], axis=-1) > 1e-6  # (B, D)
  pick = jnp.argmax(live, axis=-1)  # (B,)
  anchor = jnp.take_along_axis(per, pick[:, None, None], axis=1)[:, 0]
  si = anchor[:, 0:2]
  goal_delta = anchor[:, 2:4]

  # Reuse the single-dopant scoring on the anchor's geometry.
  single_obs = jnp.concatenate(
      [si, nbr_deltas.reshape(batch, 6), goal_delta], axis=-1
  )
  action_angstroms = planner_policy(
      None,
      single_obs,
      rate_fn=rate_fn,
      dwell_seconds=dwell_seconds,
      candidates=candidates,
  )
  return action_angstroms / max_distance_angstroms


@dataclasses.dataclass
class MultiDopantPlannerAgent:
  """Registry agent for MultiDopantExperiment: exposes .policy() like
  eval_agent.EvalAgent (eval.py _eval_multi_dopant)."""

  rate_fn: rates_lib.RateFunction
  num_dopants: int
  dwell_seconds: float = 5.0
  max_distance_angstroms: float = 2.84
  num_radii: int = 10
  num_angles: int = 64

  def policy(self):
    candidates = make_candidate_offsets(
        num_radii=self.num_radii,
        num_angles=self.num_angles,
        max_radius=self.max_distance_angstroms,
    )
    return lambda key, obs: multi_dopant_planner_policy(
        key,
        obs,
        rate_fn=self.rate_fn,
        num_dopants=self.num_dopants,
        dwell_seconds=self.dwell_seconds,
        max_distance_angstroms=self.max_distance_angstroms,
        candidates=candidates,
    )


@dataclasses.dataclass
class PlannerAgent(agent_lib.Agent):
  """Host dm_env wrapper over planner_policy (material-frame features +
  RelativeToSiliconMaterialFrameActionAdapter, like GreedyAgent)."""

  rate_fn: rates_lib.RateFunction
  dwell_seconds: float = 5.0
  lookahead_discount: float = 0.0
  num_radii: int = 10
  num_angles: int = 64
  # For variable-dwell adapters: set to the adapter's exact
  # (min_dwell_seconds, max_dwell_seconds) range; the planner scores a
  # grid over it and emits the 3rd action dim as the matching fraction.
  dwell_range_seconds: Optional[tuple] = None
  num_dwells: int = 8
  image_duration_seconds: float = 2.0
  dwell_objective: str = 'per_second'

  def __post_init__(self):
    self._candidates = make_candidate_offsets(
        num_radii=self.num_radii, num_angles=self.num_angles
    )
    self._dwell_grid = None
    if self.dwell_range_seconds is not None:
      lo, hi = self.dwell_range_seconds
      self._dwell_grid = np.linspace(
          lo, hi, self.num_dwells, dtype=np.float32
      )
    self._policy = jax.jit(
        lambda obs: planner_policy(
            None,
            obs,
            rate_fn=self.rate_fn,
            dwell_seconds=self.dwell_seconds,
            candidates=self._candidates,
            lookahead_discount=self.lookahead_discount,
            dwell_grid_seconds=self._dwell_grid,
            image_duration_seconds=self.image_duration_seconds,
            dwell_objective=self.dwell_objective,
        )
    )

  def step(self, time_step) -> np.ndarray:
    obs = jnp.asarray(
        np.asarray(time_step.observation, np.float32).reshape(1, 10)
    )
    return np.asarray(self._policy(obs))[0]

  def set_mode(self, mode: agent_lib.AgentMode) -> None:
    pass

  def policy(self):
    """Batched pure policy for eval_lib.evaluate_batched."""
    return lambda key, obs: planner_policy(
        key,
        obs,
        rate_fn=self.rate_fn,
        dwell_seconds=self.dwell_seconds,
        candidates=self._candidates,
        lookahead_discount=self.lookahead_discount,
        dwell_grid_seconds=self._dwell_grid,
        image_duration_seconds=self.image_duration_seconds,
        dwell_objective=self.dwell_objective,
    )
