"""Multi-dopant batched environment (beyond-parity extension).

The reference simulates exactly one dopant (graphene.py:562,
PristineSingleDopedGraphene); its env/goal layers are single-silicon.
This module extends the same physics to D dopants per environment on top
of kmc.apply_control_multi (multi-channel KMC: one exponential waiting
time from the summed rate, one (dopant, neighbor) move per round, moves
onto occupied sites masked out).

Design: there is still ONE physical electron beam, so the action stays a
single (2,) beam position in the microscope frame ([-1, 1]^2 over the
FOV). Each dopant has its own goal atom; the episode terminates when all
dopants have sat within 0.5 bond of their goals for one step, with
terminal reward gamma^elapsed scaled by nothing else (the single-dopant
law applied jointly). Observations are per-dopant (position, goal delta)
pairs, flattened: (D * 4,) in the material frame.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from putting_dune_tpu import constants
from putting_dune_tpu import kmc
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import structures
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import goals as goals_lib
from putting_dune_tpu.imaging import params as imaging_params
from putting_dune_tpu.imaging import render as imaging_render


class MultiDopantState(struct.PyTreeNode):
  """Batched state: pose + (B, D) dopant sites + per-dopant goals."""

  offset: jnp.ndarray  # (B, 2)
  theta: jnp.ndarray  # (B,)
  si_indices: jnp.ndarray  # (B, D) int32
  fov_lower: jnp.ndarray  # (B, 2)
  fov_upper: jnp.ndarray  # (B, 2)
  goals: jnp.ndarray  # (B, D, 2) material frame
  consecutive: jnp.ndarray  # (B, D) int32 true consecutive steps-at-goal
  latched: jnp.ndarray  # (B, D) bool, dopant has completed its goal
  steps: jnp.ndarray  # (B,) int32
  needs_reset: jnp.ndarray  # (B,) bool
  # (B,) int32: steps this episode where the KMC max_events safety cap cut
  # the dwell short (KMCMultiResult.truncated). Always 0 under sane rate
  # functions; nonzero flags incomplete physics on those steps.
  kmc_truncation_count: jnp.ndarray
  imaging: structures.ImagingParams  # per-episode render randomization
  # (B, 2) cumulative instrument drift, material-frame angstroms (same
  # semantics as structures.SimulatorState.drift); None == zero.
  drift: jnp.ndarray | None = None


def _initial_sites(
    lattice: lattice_lib.Lattice, num_dopants: int
) -> jnp.ndarray:
  """D well-separated canonical sites: nearest lattice sites to anchors on
  a ring of radius 2 bonds * D around the lattice center (distinctness
  enforced by sequential masking)."""
  angles = 2.0 * jnp.pi * jnp.arange(num_dopants) / max(num_dopants, 1)
  radius = 2.0 * constants.CARBON_BOND_DISTANCE_ANGSTROMS * max(
      num_dopants - 1, 1
  )
  anchors = radius * jnp.stack(
      [jnp.cos(angles), jnp.sin(angles)], axis=-1
  )  # (D, 2)
  taken = jnp.zeros((lattice.positions.shape[0],), bool)
  sites = []
  for d in range(num_dopants):
    dist = jnp.linalg.norm(lattice.positions - anchors[d], axis=-1)
    dist = jnp.where(taken, jnp.inf, dist)
    site = jnp.argmin(dist)
    taken = taken.at[site].set(True)
    sites.append(site)
  return jnp.stack(sites).astype(jnp.int32)  # (D,)


class MultiDopantEnv(struct.PyTreeNode):
  """Batched D-dopant goal-reaching environment.

  Action: (B, 2) in [-1, 1]^2, mapped to a beam position inside the FOV.
  Observation: (B, D * 4) = per dopant [x, y, goal_dx, goal_dy] (material
  frame, angstroms).
  """

  lattice: lattice_lib.Lattice = struct.field(pytree_node=False)
  rate_fn: rates_lib.RateFunction = struct.field(pytree_node=False)
  batch_size: int = struct.field(pytree_node=False, default=64)
  num_dopants: int = struct.field(pytree_node=False, default=2)
  dwell_seconds: float = struct.field(pytree_node=False, default=1.5)
  image_duration_seconds: float = struct.field(
      pytree_node=False, default=2.0
  )
  fov_width: float = struct.field(pytree_node=False, default=25.0)
  step_limit: int = struct.field(pytree_node=False, default=600)
  sticky_goals: bool = struct.field(pytree_node=False, default=True)
  # 'relative': action is a beam offset from the first unlatched dopant
  # (in units of max_distance_angstroms), mirroring the single-dopant
  # RelativeToSilicon adapter — random exploration lands near a dopant
  # and causes transitions. 'absolute': action maps onto the whole FOV.
  action_mode: str = struct.field(pytree_node=False, default='relative')
  max_distance_angstroms: float = struct.field(
      pytree_node=False,
      default=2.0 * constants.CARBON_BOND_DISTANCE_ANGSTROMS,
  )
  # 'vector': (B, D*4) per-dopant [x, y, goal_dx, goal_dy]. 'image': dict
  # {'image' (B, S, S, 1) rendered STEM frame with D silicon dopants,
  #  'goal_delta_angstroms' (B, D*2)} — the D-dopant counterpart of the
  # single-dopant ImageFeatures (latched dopants read zero delta).
  # 'vector_neighbors': the vector observation plus the ANCHOR dopant's
  # (first unlatched — the one 'relative' actions address) 3 neighbor
  # deltas, (B, D*4 + 6): the geometry a model-based planner needs,
  # mirroring the single-dopant material-frame features.
  observation_mode: str = struct.field(pytree_node=False, default='vector')
  # 'index': the anchor ('relative' actions) is the first unlatched dopant
  # by internal index — the order goals were sampled in (what the shipped
  # PPO policies trained against). 'position': first unlatched in
  # lexicographic (x, y) MATERIAL-POSITION order, and observations list
  # dopants in that same order — an ordering an agent can reproduce from
  # pixels alone (agents/vision_planner.py multi-dopant policy), since
  # internal indices are not observable in an image.
  anchor_order: str = struct.field(pytree_node=False, default='index')
  image_size: int = struct.field(pytree_node=False, default=128)
  window_capacity: int = struct.field(pytree_node=False, default=512)
  noisy_images: bool = struct.field(pytree_node=False, default=False)
  # Instrument drift (BASELINE stress config 5: "large FOV multi-dopant
  # lattice, long-horizon KMC with drift and full observation pipeline").
  # Per-frame uniform increment, cumulative; observations report the
  # drifted world, physics/goal checks stay in the true frame, the beam
  # lands off-target by one increment (simulator.py drift semantics).
  drift_per_frame_angstroms: float = struct.field(
      pytree_node=False, default=0.0
  )
  # Expose the believed FOV in image observations (for in-loop drift
  # correctors — the multi-dopant ImageFeatures(include_fov) analogue).
  include_fov: bool = struct.field(pytree_node=False, default=False)
  # Per-env safety cap on KMC events per step (kmc.apply_control_multi
  # max_events; same semantics as SimulatorConfig.max_kmc_events_per_step):
  # bounds the batched while-loop against adversarial learned rate fns.
  max_kmc_events_per_step: Optional[int] = struct.field(
      pytree_node=False, default=10_000
  )

  # ---------------------------------------------------------------- specs

  def observation_size(self) -> int:
    if self.observation_mode == 'vector_neighbors':
      return self.num_dopants * 4 + 6
    return self.num_dopants * 4

  def action_spec(self):
    from putting_dune_tpu.env import action_adapters

    return action_adapters.ActionSpec(
        shape=(2,), minimum=-1.0, maximum=1.0
    )

  def observation_spec(self):
    from putting_dune_tpu.env import features as features_lib

    if self.observation_mode == 'image':
      spec = {
          'image': features_lib.FeatureSpec(
              shape=(self.image_size, self.image_size, 1)
          ),
          'goal_delta_angstroms': features_lib.FeatureSpec(
              shape=(self.num_dopants * 2,)
          ),
      }
      if self.include_fov:
        spec['fov_lower_left'] = features_lib.FeatureSpec(shape=(2,))
        spec['fov_upper_right'] = features_lib.FeatureSpec(shape=(2,))
      return spec
    return features_lib.FeatureSpec(shape=(self.observation_size(),))

  def shaping_distance(self, obs) -> jnp.ndarray:
    """Potential distance for reward shaping: sum of per-dopant goal
    distances (latched dopants contribute 0 — their delta reads zero)."""
    if isinstance(obs, dict):
      delta = obs['goal_delta_angstroms']
      batch = delta.shape[0]
      per = delta.reshape(batch, self.num_dopants, 2)
      return jnp.sum(jnp.linalg.norm(per, axis=-1), axis=-1)
    per = obs[:, : self.num_dopants * 4].reshape(
        obs.shape[0], self.num_dopants, 4
    )
    return jnp.sum(jnp.linalg.norm(per[..., 2:4], axis=-1), axis=-1)

  # ------------------------------------------------------------- plumbing

  def _si_positions(self, state: MultiDopantState) -> jnp.ndarray:
    # site_position broadcasts the (B,) pose over the (B, D) site dims.
    return lattice_lib.site_position(
        self.lattice, state.si_indices, state.offset, state.theta
    )  # (B, D, 2)

  def _fov(self, state: MultiDopantState) -> structures.FieldOfView:
    return structures.FieldOfView(state.fov_lower, state.fov_upper)

  def _atom_window(
      self,
      state: MultiDopantState,
      fov: Optional[structures.FieldOfView] = None,
  ) -> structures.AtomWindow:
    """Fixed-capacity FOV crop with D silicon dopants.

    The D=1 case matches simulator.atom_window (reference
    graphene.py:600-644); is_si is membership in the (B, D) dopant set.
    `fov` overrides the state's believed FOV (the drifted-view render
    passes the believed FOV shifted by -drift).
    """
    if fov is None:
      fov = self._fov(state)
    fov_lower, fov_upper = fov.lower_left, fov.upper_right
    world = lattice_lib.world_positions(
        self.lattice, state.offset, state.theta
    )  # (B, N, 2)
    in_bounds = jnp.all(
        (world >= fov_lower[:, None, :])
        & (world <= fov_upper[:, None, :]),
        axis=-1,
    )
    n = self.lattice.num_atoms
    capacity = min(self.window_capacity, n)
    order = jax.lax.broadcasted_iota(jnp.int32, in_bounds.shape, 1)
    score = jnp.where(in_bounds, n - order, -1)
    top_scores, indices = jax.lax.top_k(score, capacity)  # (B, K)
    mask = top_scores > 0

    positions_material = jnp.take_along_axis(
        world, indices[..., None], axis=-2
    )
    extent = fov_upper - fov_lower
    positions = (
        positions_material - fov_lower[:, None, :]
    ) / extent[:, None, :]
    positions = jnp.where(mask[..., None], positions, 0.0)

    is_si = jnp.any(
        indices[..., None] == state.si_indices[:, None, :], axis=-1
    )  # (B, K)
    atomic_numbers = jnp.where(
        mask,
        jnp.where(is_si, constants.SILICON, constants.CARBON),
        0,
    ).astype(jnp.int32)
    return structures.AtomWindow(
        positions=positions,
        atomic_numbers=atomic_numbers,
        mask=mask,
        si_slot=jnp.full((self.batch_size,), -1, jnp.int32),
    )

  def _position_key(self, si: jnp.ndarray) -> jnp.ndarray:
    """(B, D) lexicographic (x, y) sort key over dopant positions. 4096
    dwarfs the lattice extent (~110 A at 50 columns) so x strictly
    dominates; distinct sites are >= one bond apart in x or y."""
    return si[..., 0] * 4096.0 + si[..., 1]

  def _anchor_index(
      self, state: MultiDopantState, si: jnp.ndarray
  ) -> jnp.ndarray:
    """(B,) index of the dopant 'relative' actions address: the first
    unlatched dopant — by internal index, or by lexicographic position
    when anchor_order='position' (observable from pixels)."""
    unlatched = jnp.logical_not(state.latched)
    if self.anchor_order == 'position':
      key = jnp.where(unlatched, self._position_key(si), jnp.inf)
      return jnp.argmin(key, axis=-1)
    return jnp.argmax(unlatched, axis=-1)

  def _observation(
      self, state: MultiDopantState, key: Optional[jax.Array] = None
  ):
    si_raw = self._si_positions(state)
    # The instrument OBSERVES the drifted world: all reported geometry is
    # shifted by the cumulative drift while the recorded goals (believed
    # frame, calibrated at reset) stay put — so goal deltas go stale by
    # the drift, exactly like the single-dopant env.
    si_obs = si_raw
    if state.drift is not None:
      si_obs = si_raw + state.drift[:, None, :]
    si, delta = si_obs, state.goals - si_obs
    if self.sticky_goals:
      # Latched goals read as zero delta — "nothing left to do here".
      delta = jnp.where(state.latched[..., None], 0.0, delta)
    if self.anchor_order == 'position':
      # Observations list dopants in the observable lexicographic order
      # (matching _anchor_index), not the internal goal-sampling order.
      order = jnp.argsort(self._position_key(si), axis=-1)  # (B, D)
      si = jnp.take_along_axis(si, order[..., None], axis=1)
      delta = jnp.take_along_axis(delta, order[..., None], axis=1)
    if self.observation_mode == 'image':
      if key is None:
        raise ValueError('image observations require a PRNG key')
      # Drifted view == the true lattice through the believed FOV shifted
      # by -drift (simulator._observe).
      fov = self._fov(state)
      render_fov = fov
      if state.drift is not None:
        render_fov = fov.shift(-state.drift)
      window = self._atom_window(state, fov=render_fov)
      image = imaging_render.render_stem_image(
          key,
          window,
          render_fov,
          state.imaging,
          image_size=self.image_size,
      )
      obs = {
          'image': image[..., None],
          'goal_delta_angstroms': delta.reshape(self.batch_size, -1),
      }
      if self.include_fov:
        obs['fov_lower_left'] = fov.lower_left.astype(jnp.float32)
        obs['fov_upper_right'] = fov.upper_right.astype(jnp.float32)
      return obs
    vector = jnp.concatenate([si, delta], axis=-1).reshape(
        self.batch_size, -1
    )
    if self.observation_mode == 'vector_neighbors':
      # Anchor = first unlatched dopant, matching step()'s 'relative'
      # action anchor exactly (internal or position order per config).
      b = self.batch_size
      pick_d = self._anchor_index(state, si_raw)  # (B,)
      anchor_site = state.si_indices[jnp.arange(b), pick_d]  # (B,)
      nbr_idx = self.lattice.neighbors[anchor_site]  # (B, 3)
      nbr_pos = lattice_lib.site_position(
          self.lattice, nbr_idx, state.offset, state.theta
      )  # (B, 3, 2)
      anchor_pos = si_raw[jnp.arange(b), pick_d]  # (B, 2)
      nbr_deltas = nbr_pos - anchor_pos[:, None, :]
      vector = jnp.concatenate(
          [vector, nbr_deltas.reshape(b, 6)], axis=-1
      )
    return vector

  # ---------------------------------------------------------------- reset

  @functools.partial(jax.jit, static_argnames=())
  def reset(self, key: jax.Array) -> Tuple[MultiDopantState, env_lib.TimeStep]:
    b, d = self.batch_size, self.num_dopants
    k_pose, k_goal, k_imaging, k_render = jax.random.split(key, 4)
    k_off, k_theta = jax.random.split(k_pose)
    offset = jax.random.uniform(
        k_off, (b, 2), minval=-1.0, maxval=1.0
    ) * constants.CARBON_BOND_DISTANCE_ANGSTROMS
    theta = jax.random.uniform(
        k_theta, (b,), minval=0.0, maxval=2.0 * jnp.pi
    )
    sites = jnp.broadcast_to(
        _initial_sites(self.lattice, d), (b, d)
    ).astype(jnp.int32)

    state = MultiDopantState(
        offset=offset,
        theta=theta,
        si_indices=sites,
        fov_lower=jnp.zeros((b, 2)) - self.fov_width / 2,
        fov_upper=jnp.zeros((b, 2)) + self.fov_width / 2,
        goals=jnp.zeros((b, d, 2)),
        consecutive=jnp.zeros((b, d), jnp.int32),
        latched=jnp.zeros((b, d), bool),
        steps=jnp.zeros((b,), jnp.int32),
        needs_reset=jnp.zeros((b,), bool),
        kmc_truncation_count=jnp.zeros((b,), jnp.int32),
        imaging=imaging_params.sample_imaging_params(
            k_imaging, b, noisy=self.noisy_images
        ),
        drift=jnp.zeros((b, 2), jnp.float32),
    )
    si = self._si_positions(state)  # (B, D, 2)

    # Per-dopant goal: a lattice atom within the goal annulus of that
    # dopant AND inside the FOV (same law as the single-dopant env,
    # goals.sample_goal, applied per dopant).
    world = lattice_lib.world_positions(
        self.lattice, offset, theta
    )  # (B, N, 2)
    lo, hi = goals_lib.GOAL_RANGE_ANGSTROMS
    in_fov = jnp.all(
        (world >= state.fov_lower[:, None, :])
        & (world <= state.fov_upper[:, None, :]),
        axis=-1,
    )  # (B, N)
    dist = jnp.linalg.norm(
        world[:, None, :, :] - si[:, :, None, :], axis=-1
    )  # (B, D, N)
    valid = in_fov[:, None, :] & (dist >= lo) & (dist <= hi)
    # Sequential per-dopant choice, masking already-chosen goal atoms:
    # independent draws could give two dopants the SAME goal atom, which a
    # single site can only satisfy one dopant at a time (unsolvable with
    # sticky_goals=False, pathological with latching). Same distinctness
    # pattern as _initial_sites.
    n = world.shape[1]
    taken = jnp.zeros((b, n), bool)
    choices = []
    for dd in range(d):
      gumbel = jax.random.gumbel(jax.random.fold_in(k_goal, dd), (b, n))
      logits = jnp.where(valid[:, dd] & ~taken, gumbel, -jnp.inf)
      choice_d = jnp.argmax(logits, axis=-1)  # (B,)
      taken = taken.at[jnp.arange(b), choice_d].set(True)
      choices.append(choice_d)
    choice = jnp.stack(choices, axis=-1)  # (B, D)
    goals = jnp.take_along_axis(
        world, choice.reshape(b, d)[..., None].repeat(2, -1), axis=1
    )
    state = state.replace(goals=goals)

    ts = env_lib.TimeStep(
        step_type=jnp.full((b,), env_lib.FIRST, jnp.int32),
        reward=jnp.zeros((b,)),
        discount=jnp.ones((b,)),
        observation=self._observation(state, k_render),
        elapsed_seconds=jnp.zeros((b,)),
    )
    return state, ts

  # ----------------------------------------------------------------- step

  @functools.partial(jax.jit, static_argnames=())
  def step(
      self,
      state: MultiDopantState,
      action: jnp.ndarray,
      key: jax.Array,
  ) -> Tuple[MultiDopantState, env_lib.TimeStep]:
    b = self.batch_size
    # Drift advances once per step BEFORE the beam lands (the controller
    # aimed with the previous frame): the beam misses by exactly one
    # increment. Static branch keeps RNG bitwise-identical when off.
    drift = state.drift
    if self.drift_per_frame_angstroms > 0.0:
      k_kmc, k_reset, k_render, k_drift = jax.random.split(key, 4)
      dmax = self.drift_per_frame_angstroms
      prev = drift if drift is not None else 0.0
      drift = prev + jax.random.uniform(
          k_drift, (b, 2), minval=-dmax, maxval=dmax
      )
    else:
      k_kmc, k_reset, k_render = jax.random.split(key, 3)
    action = jnp.clip(action, -1.0, 1.0)
    if self.action_mode == 'relative':
      # Beam offset from the OBSERVED first unlatched dopant (anchor_order
      # rule); observed = true + drift at the last frame.
      si = self._si_positions(state)  # (B, D, 2)
      if state.drift is not None:
        si = si + state.drift[:, None, :]
      pick_d = self._anchor_index(state, si)  # (B,)
      anchor = si[jnp.arange(b), pick_d]  # (B, 2)
      beam = anchor + action * self.max_distance_angstroms
    else:
      # Action [-1, 1]^2 -> beam position in the FOV (material frame).
      frac = (action + 1.0) / 2.0
      beam = state.fov_lower + frac * (state.fov_upper - state.fov_lower)
    if drift is not None:
      # Believed-frame coordinates sit at +drift from the true sample.
      beam = beam - drift

    result = kmc.apply_control_multi(
        k_kmc,
        self.lattice,
        state.offset,
        state.theta,
        state.si_indices,
        beam,
        jnp.full((b,), self.dwell_seconds),
        self.rate_fn,
        max_events=self.max_kmc_events_per_step,
    )
    elapsed = jnp.full(
        (b,), self.dwell_seconds + self.image_duration_seconds
    )
    new_state = state.replace(
        si_indices=result.si_indices,
        steps=state.steps + 1,
        drift=drift,
        kmc_truncation_count=state.kmc_truncation_count
        + result.truncated.astype(jnp.int32),
    )

    si = self._si_positions(new_state)  # (B, D, 2)
    goal_radius = constants.CARBON_BOND_DISTANCE_ANGSTROMS * 0.5
    at_goal = (
        jnp.linalg.norm(si - new_state.goals, axis=-1) < goal_radius
    )  # (B, D)
    # The counter stays a TRUE consecutive count in both modes; latching is
    # a separate boolean so non-consecutive at-goal visits can never fake a
    # completion if REQUIRED_CONSECUTIVE_GOAL_STEPS is ever raised above 1.
    consecutive = jnp.where(at_goal, new_state.consecutive + 1, 0)
    reached = consecutive >= goals_lib.REQUIRED_CONSECUTIVE_GOAL_STEPS
    if self.sticky_goals:
      # A dopant's goal LATCHES once reached (the beam then works on the
      # others) — without latching, all D dopants must sit on their
      # goals at the same step under a single beam, which is nearly
      # unlearnable from scratch.
      latched = new_state.latched | reached
    else:
      latched = reached
    new_state = new_state.replace(consecutive=consecutive, latched=latched)

    all_done = jnp.all(latched, axis=-1)
    truncated = new_state.steps >= self.step_limit
    reward = jnp.where(
        all_done,
        jnp.power(constants.GAMMA_PER_SECOND, elapsed),
        0.0,
    )
    discount = jnp.where(
        all_done,
        0.0,
        jnp.power(constants.GAMMA_PER_SECOND, elapsed),
    )
    last = all_done | truncated
    step_type = jnp.where(last, env_lib.LAST, env_lib.MID).astype(
        jnp.int32
    )
    new_state = new_state.replace(needs_reset=last)
    stepped_ts = env_lib.TimeStep(
        step_type=step_type,
        reward=reward,
        discount=discount,
        observation=self._observation(new_state, k_render),
        elapsed_seconds=elapsed,
    )

    # Auto-reset on the step AFTER last (same semantics as
    # env_lib.PuttingDuneEnv.step): envs flagged needs_reset get a fresh
    # FIRST timestep instead of being stepped. lax.cond skips the whole
    # fresh-reset computation (goal resampling over (B, N) + gumbel draws)
    # on steps where no env finished — the common case.
    reset_state, reset_ts = jax.lax.cond(
        jnp.any(state.needs_reset),
        lambda _: self.reset(k_reset),
        lambda _: (new_state, stepped_ts),
        operand=None,
    )

    def pick(reset_leaf, stepped_leaf):
      mask = state.needs_reset.reshape(
          (self.batch_size,) + (1,) * (stepped_leaf.ndim - 1)
      )
      return jnp.where(mask, reset_leaf, stepped_leaf)

    out_state = jax.tree_util.tree_map(pick, reset_state, new_state)
    ts = jax.tree_util.tree_map(pick, reset_ts, stepped_ts)
    return out_state, ts
