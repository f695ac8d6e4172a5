"""The batched Putting Dune RL environment.

TPU-first rewrite of the reference PuttingDuneEnvironment + StepLimitWrapper
(/root/reference/putting_dune/putting_dune_environment.py:36-195,
run_helpers.py:27-153). The dm_env object becomes a pair of jitted pure
functions over an EnvState with a leading batch dimension:

    state, ts = env.reset(key)
    state, ts = env.step(state, action, key)

Auto-reset: environments whose previous step was terminal/truncated are
reset inside step() (both branches are computed batched and selected, which
is cheap because reset is O(N) elementwise work with no KMC loop). dm_env
semantics are preserved per-env:

  * FIRST: reward 0, discount gamma**elapsed (the reference's reset returns
    a discounted FIRST step, putting_dune_environment.py:99-111);
  * terminal: discount 0 (dm_env.termination);
  * truncation at step_limit (default 600): discount gamma**elapsed.

The single-env dm_env.Environment adapter lives in dm_env_wrapper.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

from flax import struct
import jax
import jax.numpy as jnp

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.env import action_adapters
from putting_dune_tpu.imaging import render as imaging_render
from putting_dune_tpu.env import features as features_lib
from putting_dune_tpu.env import goals as goals_lib

FIRST = 0
MID = 1
LAST = 2


class TimeStep(struct.PyTreeNode):
  """Batched dm_env-style timestep.

  step_type: (B,) int32 in {FIRST, MID, LAST}; reward/discount: (B,)
  float32; observation: features pytree with leading batch dim;
  elapsed_seconds: (B,) simulated seconds consumed by this step (a native
  extension over dm_env — the reference recovers this from the discount).
  """

  step_type: jnp.ndarray
  reward: jnp.ndarray
  discount: jnp.ndarray
  observation: Any
  elapsed_seconds: jnp.ndarray

  def first(self) -> jnp.ndarray:
    return self.step_type == FIRST

  def last(self) -> jnp.ndarray:
    return self.step_type == LAST


class EnvState(struct.PyTreeNode):
  """Full batched environment state."""

  sim: structures.SimulatorState
  goal: goals_lib.GoalState
  adapter_state: Any
  step_count: jnp.ndarray  # (B,) int32, steps taken this episode.
  needs_reset: jnp.ndarray  # (B,) bool, previous step ended the episode.
  # (B,) int32: steps this episode where the KMC max_events safety cap cut
  # the dwell short (KMCResult.truncated). Always 0 under sane rate
  # functions; nonzero means the physics of those steps is incomplete
  # (e.g. a misbehaving learned rate model) and metrics derived from the
  # episode should be treated as suspect.
  kmc_truncation_count: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EnvConfig:
  """Static environment configuration (hashable)."""

  sim: simulator_lib.SimulatorConfig = simulator_lib.SimulatorConfig()
  step_limit: Optional[int] = 600  # run_helpers.py:33-46.
  # Auto-reset sub-batch capacity: when <= this many envs finished on a
  # step, fresh states are built only for a compacted sub-batch of that
  # size and scattered back — avoiding the O(B*N) full-batch resample
  # (goal Gumbel-max over all atoms, FOV/imaging sampling) that would
  # otherwise run nearly every step at large B. When more envs finish at
  # once (e.g. synchronized step-limit truncation), a lax.cond falls back
  # to the exact full-batch reset.
  reset_chunk: int = 64


@dataclasses.dataclass(frozen=True)
class PuttingDuneEnv:
  """Batched environment: static components + jitted reset/step.

  Attributes:
    lattice: static lattice (positions + neighbor table).
    rate_fn: batched KMC rate function.
    adapter: action adapter (agent action -> beam control).
    features: feature constructor (observation -> agent features).
    config: env/simulator config.
    batch_size: number of parallel environments.
  """

  lattice: lattice_lib.Lattice
  rate_fn: rates_lib.RateFunction = rates_lib.prior_rates
  adapter: Any = action_adapters.RelativeToSiliconActionAdapter()
  features: Any = features_lib.SingleSiliconPristineGrapheneFeatures()
  config: EnvConfig = EnvConfig()
  batch_size: int = 1

  # -- internals ------------------------------------------------------------

  def _fresh_state_and_obs(
      self,
      key: jax.Array,
      render_image: bool = True,
      batch_size: Optional[int] = None,
  ):
    """Builds a freshly-reset state + initial observation for all envs.

    render_image=False skips the STEM render (the window is still
    returned when image features are in use, so the caller can render
    once after per-env branch selection — see step()).
    batch_size overrides self.batch_size (used by the sub-batch
    auto-reset path in step()).
    """
    batch_size = self.batch_size if batch_size is None else batch_size
    k_sim, k_goal, k_adapter = jax.random.split(key, 3)
    sim_state, obs = simulator_lib.reset(
        k_sim,
        self.lattice,
        config=self.config.sim,
        batch_size=batch_size,
        return_window=self.features.requires_window or (
            self.features.requires_image and render_image
        ),
        return_image=self.features.requires_image and render_image,
    )
    goal = goals_lib.sample_goal(
        k_goal, self.lattice, sim_state.material, sim_state.fov
    )
    adapter_state = self.adapter.init_state(k_adapter, batch_size)
    state = EnvState(
        sim=sim_state,
        goal=goal,
        adapter_state=adapter_state,
        step_count=jnp.zeros((batch_size,), jnp.int32),
        needs_reset=jnp.zeros((batch_size,), bool),
        kmc_truncation_count=jnp.zeros((batch_size,), jnp.int32),
    )
    return state, obs

  def _first_timestep(self, obs, goal) -> TimeStep:
    discount = jnp.power(
        constants.GAMMA_PER_SECOND, obs.elapsed_seconds
    ).astype(jnp.float32)
    return TimeStep(
        step_type=jnp.full((self.batch_size,), FIRST, jnp.int32),
        reward=jnp.zeros((self.batch_size,), jnp.float32),
        discount=discount,
        observation=self.features(obs, goal),
        elapsed_seconds=obs.elapsed_seconds,
    )

  # -- public API -----------------------------------------------------------

  @functools.partial(jax.jit, static_argnames=('self',))
  def reset(self, key: jax.Array) -> tuple[EnvState, TimeStep]:
    state, obs = self._fresh_state_and_obs(key)
    return state, self._first_timestep(obs, state.goal)

  @functools.partial(jax.jit, static_argnames=('self',))
  def step(
      self, state: EnvState, action: jnp.ndarray, key: jax.Array
  ) -> tuple[EnvState, TimeStep]:
    """Advances every environment one step (auto-resetting finished ones)."""
    k_reset, k_step = jax.random.split(key)

    # ---- stepped branch (computed for all envs) ---------------------------
    # The adapter aims relative to the silicon the instrument OBSERVED in
    # the last frame (true position + cumulative drift); with drift enabled
    # the beam then lands off-target by exactly one drift increment (see
    # simulator.step). With drift disabled this adds zeros — bitwise no-op.
    si_true_prev = lattice_lib.site_position(
        self.lattice,
        state.sim.material.si_index,
        state.sim.material.offset,
        state.sim.material.theta,
    )
    if state.sim.drift is not None:
      si_observed_prev = si_true_prev + state.sim.drift
    else:
      si_observed_prev = si_true_prev
    ctx = action_adapters.AdapterContext(
        si_position_microscope=state.sim.fov.material_to_microscope(
            si_observed_prev
        ),
        fov=state.sim.fov,
    )
    adapter_state, control = self.adapter.to_controls(
        state.adapter_state, ctx, action
    )
    # The atom window and the image are computed ONCE at the end of
    # step(), after per-env branch selection — computing them in both the
    # stepped and reset branches would double the dominant costs of
    # image-observation envs.
    sim_state, obs, kmc_result = simulator_lib.step(
        state.sim,
        k_step,
        control,
        self.lattice,
        self.rate_fn,
        config=self.config.sim,
        return_window=self.features.requires_window,
        return_image=False,
    )
    # Goal progress is a fact about the SAMPLE: judge it on the true
    # silicon site, not the drift-shifted observation (physically, reaching
    # the goal atom is frame-independent; with drift off this matches the
    # previous obs-roundtrip computation to float precision).
    si_material = lattice_lib.site_position(
        self.lattice,
        sim_state.material.si_index,
        sim_state.material.offset,
        sim_state.material.theta,
    )
    new_goal, goal_ret = goals_lib.reward_and_terminal(
        state.goal, si_material, obs.elapsed_seconds
    )
    step_count = state.step_count + 1
    terminal = goal_ret.is_terminal
    truncated = goal_ret.is_truncated
    if self.config.step_limit is not None:
      truncated = jnp.logical_or(
          truncated,
          jnp.logical_and(step_count >= self.config.step_limit, ~terminal),
      )
    discount = jnp.power(
        constants.GAMMA_PER_SECOND, obs.elapsed_seconds
    ).astype(jnp.float32)
    discount = jnp.where(terminal, 0.0, discount)
    step_type = jnp.where(
        jnp.logical_or(terminal, truncated), LAST, MID
    ).astype(jnp.int32)
    stepped_state = EnvState(
        sim=sim_state,
        goal=new_goal,
        adapter_state=adapter_state,
        step_count=step_count,
        needs_reset=jnp.logical_or(terminal, truncated),
        kmc_truncation_count=state.kmc_truncation_count
        + kmc_result.truncated.astype(jnp.int32),
    )
    # ---- reset branch (fresh episodes for envs flagged needs_reset) -------
    # lax.cond skips the whole fresh-reset computation (FOV/goal/imaging
    # sampling, window) on steps where no env finished. When only a few
    # envs finished (the common case at large B: ~B/600 per step), fresh
    # states are built for a compacted K=reset_chunk sub-batch and
    # scattered back; the exact full-batch reset remains as the fallback
    # for synchronized finishes (e.g. a whole batch truncating together).
    k_reset, k_img = jax.random.split(k_reset)
    stepped_obs = obs.replace(last_controls=None)
    needs = state.needs_reset
    chunk = min(self.config.reset_chunk, self.batch_size)

    def full_reset(_):
      reset_state, reset_obs = self._fresh_state_and_obs(
          k_reset, render_image=False
      )

      def pick(reset_leaf, stepped_leaf):
        mask = needs.reshape(
            (self.batch_size,) + (1,) * (stepped_leaf.ndim - 1)
        )
        return jnp.where(mask, reset_leaf, stepped_leaf)

      return (
          jax.tree_util.tree_map(pick, reset_state, stepped_state),
          jax.tree_util.tree_map(pick, reset_obs, stepped_obs),
      )

    def sub_reset(_):
      # Compact finished-env indices; overflow slots point past the batch
      # so mode='drop' scatters ignore them.
      idx = jnp.nonzero(needs, size=chunk, fill_value=self.batch_size)[0]
      fresh_state, fresh_obs = self._fresh_state_and_obs(
          k_reset, render_image=False, batch_size=chunk
      )

      def scatter(stepped_leaf, fresh_leaf):
        return stepped_leaf.at[idx].set(fresh_leaf, mode='drop')

      return (
          jax.tree_util.tree_map(scatter, stepped_state, fresh_state),
          jax.tree_util.tree_map(scatter, stepped_obs, fresh_obs),
      )

    def any_reset(_):
      if chunk >= self.batch_size:
        return full_reset(None)
      return jax.lax.cond(
          jnp.sum(needs) <= chunk, sub_reset, full_reset, operand=None
      )

    def no_reset(_):
      return stepped_state, stepped_obs

    # Raw observations are selected BEFORE feature construction and
    # rendering so the expensive image render happens exactly once.
    new_state, picked_obs = jax.lax.cond(
        jnp.any(needs), any_reset, no_reset, operand=None
    )
    if self.features.requires_image:
      # Render the DRIFTED world (what the camera sees): the true lattice
      # through the believed FOV shifted by -drift (see simulator._observe).
      # Numerical no-op when drift is zeros/None.
      render_fov = new_state.sim.fov
      if new_state.sim.drift is not None:
        render_fov = render_fov.shift(-new_state.sim.drift)
      window = simulator_lib.atom_window(
          self.lattice,
          new_state.sim.material,
          render_fov,
          self.config.sim.window_capacity,
      )
      image = imaging_render.render_stem_image(
          k_img,
          window,
          render_fov,
          new_state.sim.imaging,
          image_size=self.config.sim.image_size,
      )
      picked_obs = picked_obs.replace(image=image, window=window)
    observation = self.features(picked_obs, new_state.goal)

    # For reset rows, picked_obs carries the fresh elapsed time, so this
    # is the FIRST-step discount gamma**elapsed there.
    reset_discount = jnp.power(
        constants.GAMMA_PER_SECOND, picked_obs.elapsed_seconds
    ).astype(jnp.float32)
    mask = needs
    ts = TimeStep(
        step_type=jnp.where(
            mask, jnp.full_like(step_type, FIRST), step_type
        ),
        reward=jnp.where(mask, 0.0, goal_ret.reward),
        discount=jnp.where(mask, reset_discount, discount),
        observation=observation,
        elapsed_seconds=picked_obs.elapsed_seconds,
    )
    return new_state, ts

  # -- specs ----------------------------------------------------------------

  def action_spec(self) -> action_adapters.ActionSpec:
    return self.adapter.spec()

  def observation_spec(self):
    return self.features.spec()
