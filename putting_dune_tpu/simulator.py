"""Batched, functional STEM microscope simulator.

TPU-first rewrite of the reference PuttingDuneSimulator
(/root/reference/putting_dune/simulator.py:27-250). The mutable
object-with-observers design becomes two pure functions over a
``SimulatorState`` pytree with a leading batch dimension:

    state, obs = reset(key, ...)
    state, obs = step(state, key, control, ...)

Semantics preserved from the reference:
  * reset: random lattice pose, FOV width ~ U(15, 30) angstroms centered on
    the silicon, fresh imaging parameters; the initial observation costs one
    image_duration of simulated time (simulator.py:65-105).
  * step: controls arrive in the microscope frame and are converted with the
    CURRENT FOV; the dwell advances the clock by dwell + image_duration; if
    the silicon leaves the [0.25, 0.75]^2 safe area the FOV recenters on it
    and a second image is taken (+image_duration) (simulator.py:107-182).
  * Event recording replaces the observer hooks functionally: KMC event logs
    are returned in the observation instead of mutating observer lists.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from putting_dune_tpu import constants
from putting_dune_tpu import geometry
from putting_dune_tpu import kmc
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import structures
from putting_dune_tpu.imaging import params as imaging_params
from putting_dune_tpu.imaging import render as imaging_render


@dataclasses.dataclass(frozen=True)
class SimulatorConfig:
  """Static simulator configuration (hashable; safe as a jit static arg)."""

  grid_columns: int = 50
  image_duration_seconds: float = 2.0
  fov_scale_min: float = 15.0
  fov_scale_max: float = 30.0
  # Capacity of the fixed-size FOV atom window. A 30 A FOV holds ~350 atoms
  # (graphene density 0.385 atoms/A^2); 512 gives ample headroom.
  window_capacity: int = 512
  image_size: int = 512
  noisy_images: bool = False  # sample_noisy_image_parameters variant.
  # Instrument drift (BASELINE stress config 5): per-axis uniform drift
  # increment U(-d, d) angstroms added once per step, cumulative over the
  # episode — the same per-frame law the image-alignment training data uses
  # (image_alignment/data.py, reference image_alignment/dataset.py:37-48).
  # 0.0 (default) disables drift with bitwise-identical RNG consumption.
  drift_per_frame_angstroms: float = 0.0
  # Per-env safety cap on KMC events per beam control (kmc.apply_control
  # max_events). Physical rates fire ~0.2/s per neighbor so even a 20 s
  # dwell yields tens of events; the default bounds the batched while-loop
  # against a misbehaving LEARNED rate predictor (huge rates would spin
  # ~rate*dwell iterations for the whole batch) while being unreachable
  # under sane physics. Envs that trip it are flagged in
  # KMCResult.truncated. None disables the cap.
  max_kmc_events_per_step: Optional[int] = 10_000


def _fov_around(si_pos: jnp.ndarray, scale: jnp.ndarray
                ) -> structures.FieldOfView:
  half = scale[..., None] / 2.0
  return structures.FieldOfView(si_pos - half, si_pos + half)


def atom_window(
    lattice: lattice_lib.Lattice,
    material: structures.MaterialState,
    fov: structures.FieldOfView,
    capacity: int,
) -> structures.AtomWindow:
  """Fixed-capacity crop of the atoms inside the FOV (microscope frame).

  Parity: reference graphene.py:600-644 (get_atoms_in_bounds) with the
  ragged result replaced by capacity slots + mask. Selected atoms keep their
  lattice index order; ties are resolved deterministically.
  """
  world = lattice_lib.world_positions(
      lattice, material.offset, material.theta
  )  # (B, N, 2)
  in_bounds = jnp.all(
      (world >= fov.lower_left[..., None, :])
      & (world <= fov.upper_right[..., None, :]),
      axis=-1,
  )  # (B, N)

  n = lattice.num_atoms
  capacity = min(capacity, n)
  # Score in-bounds atoms by descending -index so top_k returns them in
  # ascending lattice-index order; out-of-bounds atoms sort last.
  order = jax.lax.broadcasted_iota(jnp.int32, in_bounds.shape, 1)
  score = jnp.where(in_bounds, n - order, -1)
  top_scores, indices = jax.lax.top_k(score, capacity)  # (B, K)
  mask = top_scores > 0

  positions_material = jnp.take_along_axis(world, indices[..., None], axis=-2)
  positions = geometry.material_to_microscope(
      positions_material,
      fov.lower_left[..., None, :],
      fov.upper_right[..., None, :],
  )
  positions = jnp.where(mask[..., None], positions, 0.0)

  is_si = indices == material.si_index[..., None]
  atomic_numbers = jnp.where(
      mask,
      jnp.where(is_si, constants.SILICON, constants.CARBON),
      0,
  ).astype(jnp.int32)

  si_present = jnp.any(is_si & mask, axis=-1)
  si_slot = jnp.where(
      si_present, jnp.argmax(is_si & mask, axis=-1), -1
  ).astype(jnp.int32)

  return structures.AtomWindow(
      positions=positions,
      atomic_numbers=atomic_numbers,
      mask=mask,
      si_slot=si_slot,
  )


def _observe(
    lattice: lattice_lib.Lattice,
    state: structures.SimulatorState,
    elapsed_seconds: jnp.ndarray,
    config: SimulatorConfig,
    key: Optional[jax.Array],
    *,
    return_window: bool,
    return_image: bool,
    last_controls: Optional[structures.BeamControl] = None,
    drift: Optional[jnp.ndarray] = None,
) -> structures.MicroscopeObservation:
  """Builds the observation for the current state.

  When ``drift`` is given, the observation reports the DRIFTED world: all
  observed geometry (silicon, neighbors, window, image) is shifted by the
  cumulative instrument drift while the believed FOV stays put — what a
  real microscope measures when the stage drifts under a calibrated scan
  coil (reference Drift.apply_to_observation, microscope_utils.py:781-808,
  inverted: there recorded observations are corrected, here live ones are
  corrupted). Implementation: observing the world shifted by +drift in the
  believed FOV is identical to observing the TRUE world through the FOV
  shifted by -drift — so conversions use the shifted FOV while the
  returned observation still reports the believed one. (material.offset is
  applied PRE-rotation in lattice.world_positions, so a world-frame drift
  cannot be folded into it.)
  """
  material = state.material
  fov_obs = state.fov if drift is None else state.fov.shift(-drift)
  si_pos = lattice_lib.site_position(
      lattice, material.si_index, material.offset, material.theta
  )
  nbr_idx = lattice.neighbors[material.si_index]  # (B, 3)
  nbr_pos = lattice_lib.site_position(
      lattice, nbr_idx, material.offset, material.theta
  )
  si_micro = fov_obs.material_to_microscope(si_pos)
  nbr_micro = geometry.material_to_microscope(
      nbr_pos,
      fov_obs.lower_left[..., None, :],
      fov_obs.upper_right[..., None, :],
  )
  silicon_in_view = jnp.all((si_micro >= 0.0) & (si_micro <= 1.0), axis=-1)

  window = None
  image = None
  if return_window or return_image:
    window = atom_window(lattice, material, fov_obs, config.window_capacity)
  if return_image:
    if key is None:
      raise ValueError('return_image requires a PRNG key.')
    image = imaging_render.render_stem_image(
        key,
        window,
        fov_obs,
        state.imaging,
        image_size=config.image_size,
    )
    if not return_window:
      window = None

  return structures.MicroscopeObservation(
      fov=state.fov,
      si_position_microscope=si_micro,
      neighbor_positions_microscope=nbr_micro,
      elapsed_seconds=elapsed_seconds,
      silicon_in_view=silicon_in_view,
      last_controls=last_controls,
      window=window,
      image=image,
  )


@functools.partial(
    jax.jit,
    static_argnames=('config', 'batch_size', 'return_window', 'return_image'),
)
def reset(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    *,
    config: SimulatorConfig = SimulatorConfig(),
    batch_size: int = 1,
    return_window: bool = False,
    return_image: bool = False,
) -> tuple[structures.SimulatorState, structures.MicroscopeObservation]:
  """Resets a batch of simulators to plausible initial states."""
  k_offset, k_theta, k_scale, k_imaging, k_image = jax.random.split(key, 5)

  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  offset = jax.random.uniform(
      k_offset, (batch_size, 2), minval=-bond / 2.0, maxval=bond / 2.0
  )
  theta = jax.random.uniform(
      k_theta, (batch_size,), minval=0.0, maxval=2.0 * jnp.pi
  )
  si_index = lattice_lib.initial_silicon_index(lattice, offset)
  material = structures.MaterialState(
      offset=offset, theta=theta, si_index=si_index
  )

  fov_scale = jax.random.uniform(
      k_scale,
      (batch_size,),
      minval=config.fov_scale_min,
      maxval=config.fov_scale_max,
  )
  si_pos = lattice_lib.site_position(lattice, si_index, offset, theta)
  fov = _fov_around(si_pos, fov_scale)

  imaging = imaging_params.sample_imaging_params(
      k_imaging, batch_size, noisy=config.noisy_images
  )

  state = structures.SimulatorState(
      material=material, fov=fov, imaging=imaging,
      drift=jnp.zeros((batch_size, 2), jnp.float32),
  )
  elapsed = jnp.full((batch_size,), config.image_duration_seconds,
                     dtype=jnp.float32)
  obs = _observe(
      lattice, state, elapsed, config, k_image,
      return_window=return_window, return_image=return_image,
  )
  return state, obs


@functools.partial(
    jax.jit,
    static_argnames=(
        'rate_fn', 'config', 'return_window', 'return_image', 'record_events'
    ),
)
def step(
    state: structures.SimulatorState,
    key: jax.Array,
    control: structures.BeamControl,
    lattice: lattice_lib.Lattice,
    rate_fn: rates_lib.RateFunction = None,
    *,
    config: SimulatorConfig = SimulatorConfig(),
    return_window: bool = False,
    return_image: bool = False,
    record_events: int = 0,
) -> tuple[
    structures.SimulatorState, structures.MicroscopeObservation, kmc.KMCResult
]:
  """Applies one beam control per environment and re-images.

  Args:
    state: current batched simulator state.
    key: PRNG key (consumed).
    control: BeamControl with position in the MICROSCOPE frame of the
      current FOV (position (B, 2), dwell_seconds (B,)).
    lattice: static lattice.
    rate_fn: batched rate function; defaults to the prior-physics predictor.
    config: static simulator config.
    return_window: include the FOV atom crop in the observation.
    return_image: render and include the STEM image.
    record_events: KMC event-log capacity (functional observer parity).

  Returns:
    (new_state, observation, kmc_result).
  """
  if rate_fn is None:
    rate_fn = rates_lib.prior_rates

  # Instrument drift advances once per step BEFORE the beam is applied: the
  # controller aimed using the PREVIOUS frame (previous drift), so the beam
  # lands off-target by exactly one drift increment — the physically right
  # error model (the image is older than the dwell). The static branch keeps
  # RNG consumption bitwise-identical when drift is disabled.
  drift = state.drift
  if config.drift_per_frame_angstroms > 0.0:
    k_kmc, k_image, k_drift = jax.random.split(key, 3)
    d = config.drift_per_frame_angstroms
    prev = drift if drift is not None else 0.0
    drift = prev + jax.random.uniform(
        k_drift, control.position.shape, minval=-d, maxval=d
    )
  else:
    k_kmc, k_image = jax.random.split(key)

  material = state.material
  beam_material = state.fov.microscope_to_material(control.position)
  if drift is not None:
    # Believed-frame coordinates sit at +drift from the true sample frame.
    beam_material = beam_material - drift

  result = kmc.apply_control(
      k_kmc,
      lattice,
      material.offset,
      material.theta,
      material.si_index,
      beam_material,
      control.dwell_seconds,
      rate_fn,
      record_events=record_events,
      max_events=config.max_kmc_events_per_step,
  )
  material = material.replace(si_index=result.si_index)

  elapsed = control.dwell_seconds + config.image_duration_seconds

  # FOV safe-area check in the CURRENT fov (reference simulator.py:156-169).
  # The instrument sees (and recenters on) the OBSERVED silicon — the true
  # position shifted by the cumulative drift — so the believed FOV tracks
  # what the camera measures, not ground truth.
  si_pos = lattice_lib.site_position(
      lattice, material.si_index, material.offset, material.theta
  )
  si_observed = si_pos if drift is None else si_pos + drift
  si_micro = state.fov.material_to_microscope(si_observed)
  outside = jnp.any((si_micro < 0.25) | (si_micro > 0.75), axis=-1)

  fov_scale = state.fov.width  # square FOV; preserved across recenters.
  recentered = _fov_around(si_observed, fov_scale)
  new_fov = structures.FieldOfView(
      lower_left=jnp.where(
          outside[..., None], recentered.lower_left, state.fov.lower_left
      ),
      upper_right=jnp.where(
          outside[..., None], recentered.upper_right, state.fov.upper_right
      ),
  )
  # The re-image after recentering costs another image_duration.
  elapsed = elapsed + jnp.where(
      outside, config.image_duration_seconds, 0.0
  )

  new_state = structures.SimulatorState(
      material=material, fov=new_fov, imaging=state.imaging, drift=drift
  )
  obs = _observe(
      lattice, new_state, elapsed, config, k_image,
      return_window=return_window, return_image=return_image,
      last_controls=control, drift=drift,
  )
  return new_state, obs, result
