"""In-loop drift correction: image alignment inside the control loop.

BASELINE configs 3/5 call for "image alignment in the loop" under a
drifting microscope. The simulator's drift model (simulator.py,
SimulatorConfig.drift_per_frame_angstroms) corrupts exactly one thing a
relative-control agent depends on: the goal delta, which is recorded in
the instrument frame at episode start and goes stale by the cumulative
drift. This module estimates that cumulative drift ON DEVICE, batched and
jit-safe, from the frame stream the agent already receives, and repairs
the goal delta before the base policy sees it.

Estimator: per-step masked phase correlation between consecutive frames.
The believed FOV motion (the instrument's own scan settings, exposed by
ImageFeatures(include_fov=True)) is subtracted, so the correlation peak is
searched only within one drift increment of the expected content shift —
which also resolves the graphene lattice's periodicity ambiguity (true
increments are far below half a lattice constant). Raw noisy frames carry
frame-FIXED artifacts (CLAHE tile grid, row jitter) that bias phase
correlation toward zero shift, so the production corrector correlates the
DETECTOR's carbon-class probability maps — denoised and content-locked —
sharing one perception pass per frame with the planner.

Counterpart of the reference's offline alignment stack
(alignment.py:290-581, pipeline/align_trajectories.py:47-91) moved into
the live loop; the same role the learned ImageAligner plays on the real
microscope.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from putting_dune_tpu import eval_lib
from putting_dune_tpu import rates as rates_lib


def _prep(images: jnp.ndarray) -> jnp.ndarray:
  """Mean-subtract + Hann window (reduces non-circular edge leakage)."""
  s = images.shape[-1]
  hann = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(s) / s)
  win = hann[:, None] * hann[None, :]
  centered = images - jnp.mean(images, axis=(-2, -1), keepdims=True)
  return centered * win


def estimate_content_shift_px(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    expected_row_col: jnp.ndarray,
    max_residual_px: jnp.ndarray,
) -> jnp.ndarray:
  """Phase-correlation shift of `cur` relative to `prev`, (B, 2) float.

  Args:
    prev: (B, S, S) previous frames (or probability maps).
    cur: (B, S, S) current frames.
    expected_row_col: (B, 2) expected content shift in array (row, col)
      pixels — from the believed FOV motion.
    max_residual_px: (B,) search half-window around the expectation.

  Returns:
    (B, 2) measured (row, col) content shift in pixels, subpixel-refined,
    unwrapped to lie within the search window of the expectation.
  """
  batch, s, _ = prev.shape
  f1 = jnp.fft.rfft2(_prep(prev))
  f2 = jnp.fft.rfft2(_prep(cur))
  r = f2 * jnp.conj(f1)
  r = r / (jnp.abs(r) + 1e-8)
  corr = jnp.fft.irfft2(r, s=(s, s))  # (B, S, S); peak at the shift

  idx = jnp.arange(s, dtype=jnp.float32)

  def wrap(d):
    return jnp.mod(d + s / 2.0, float(s)) - s / 2.0

  drow = wrap(idx[None, :, None] - expected_row_col[:, 0, None, None])
  dcol = wrap(idx[None, None, :] - expected_row_col[:, 1, None, None])
  # A window radius under ~1.5 px could contain NO pixel center for a
  # fractional expectation (all scores -inf -> argmax returns garbage);
  # clamp so at least the nearest integer shifts are always in play.
  lim = jnp.maximum(max_residual_px, 1.5)[:, None, None]
  # CIRCULAR window: the graphene lattice makes phase correlation alias at
  # every Bravais translation (2.46 A); a box window's corners would admit
  # those aliases at rotations where both components fit. The window radius
  # must stay below (2.46 - max true increment) angstroms.
  ok = (drow * drow + dcol * dcol) <= lim * lim
  score = jnp.where(ok, corr, -jnp.inf)

  flat = jnp.argmax(score.reshape(batch, -1), axis=-1)
  r0 = flat // s
  c0 = jnp.mod(flat, s)

  def at(rr, cc):
    return corr[jnp.arange(batch), jnp.mod(rr, s), jnp.mod(cc, s)]

  def parabolic(cm, c0v, cp):
    denom = cm - 2.0 * c0v + cp
    off = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (cm - cp) / denom, 0.0
    )
    return jnp.clip(off, -0.5, 0.5)

  row = r0.astype(jnp.float32) + parabolic(
      at(r0 - 1, c0), at(r0, c0), at(r0 + 1, c0)
  )
  col = c0.astype(jnp.float32) + parabolic(
      at(r0, c0 - 1), at(r0, c0), at(r0, c0 + 1)
  )
  measured = jnp.stack([row, col], axis=-1)
  # Unwrap onto the branch nearest the expectation.
  return expected_row_col + wrap(measured - expected_row_col)


class DriftTracker:
  """Stateless helpers for the (prev_map, prev_ll, drift) carry.

  Shared by the generic wrapper and the vision-planner policy below.
  Array conventions follow imaging/render.py: col = x * S,
  row = S-1 - y * S (row 0 is the top of the image).
  """

  def __init__(self, max_increment_angstroms: float = 1.0):
    self.max_increment_angstroms = max_increment_angstroms

  def init(self, maps: jnp.ndarray, obs) -> dict:
    return dict(
        prev_map=maps,
        prev_ll=obs['fov_lower_left'],
        drift=jnp.zeros_like(obs['goal_delta_angstroms']),
    )

  def update(self, pstate: dict, maps: jnp.ndarray, obs, first) -> dict:
    s = maps.shape[-1]
    ll = obs['fov_lower_left']
    width = (obs['fov_upper_right'] - ll)[..., 0]  # (B,) square FOV

    # Expected content shift from the instrument's own FOV motion, in
    # microscope units: u = (w - ll + D) / width.
    b_u = (pstate['prev_ll'] - ll) / width[..., None]  # (B, 2)
    expected_rc = jnp.stack(
        [-b_u[..., 1] * s, b_u[..., 0] * s], axis=-1
    )
    max_res_px = self.max_increment_angstroms * s / width
    shift_rc = estimate_content_shift_px(
        pstate['prev_map'], maps, expected_rc, max_res_px
    )
    s_u = jnp.stack(
        [shift_rc[..., 1] / s, -shift_rc[..., 0] / s], axis=-1
    )
    increment = width[..., None] * (s_u - b_u)  # = drift delta, angstroms

    drift = pstate['drift'] + increment
    # Fresh episodes start drift-calibrated (simulator resets drift to 0).
    drift = jnp.where(first[..., None], 0.0, drift)
    return dict(prev_map=maps, prev_ll=ll, drift=drift)


class DriftCorrectedPolicy(eval_lib.StatefulPolicy):
  """Wraps a pure image policy with on-device cumulative-drift correction.

  Requires observations from ImageFeatures(include_fov=True):
  {'image', 'goal_delta_angstroms', 'fov_lower_left', 'fov_upper_right'}.
  map_fn extracts the (B, S, S) correlation map from the observation;
  the default (raw frames) is only reliable on lightly-noised imagery —
  production compositions should correlate denoised maps (see
  DriftCorrectedVisionPlannerPolicy).
  """

  def __init__(
      self,
      base_policy: Callable[[jax.Array, Any], jnp.ndarray],
      *,
      map_fn: Optional[Callable[[Any], jnp.ndarray]] = None,
      max_increment_angstroms: float = 1.0,
  ):
    self._base = base_policy
    self._map_fn = map_fn or (lambda obs: obs['image'][..., 0])
    self._tracker = DriftTracker(max_increment_angstroms)

  def init(self, example_obs):
    return self._tracker.init(self._map_fn(example_obs), example_obs)

  def step(self, pstate, key, obs, first):
    new_state = self._tracker.update(
        pstate, self._map_fn(obs), obs, first
    )
    corrected = dict(obs)
    corrected['goal_delta_angstroms'] = (
        obs['goal_delta_angstroms'] + new_state['drift']
    )
    action = self._base(key, corrected)
    return new_state, action


class DriftCorrectedVisionPlannerPolicy(eval_lib.StatefulPolicy):
  """Vision planner with in-loop drift correction, one perception pass.

  Per frame: shipped UNet -> class probability maps; phase correlation of
  the carbon-class map against the previous frame's (minus believed FOV
  motion) accumulates the drift estimate; the planner core then runs on
  the SAME maps with the de-drifted goal vector.
  """

  def __init__(
      self,
      *,
      detector_fn,
      rate_fn: rates_lib.RateFunction,
      dwell_seconds: float,
      max_distance_angstroms: float,
      candidates,
      max_increment_angstroms: float = 1.0,
  ):
    self._detector_fn = detector_fn
    self._rate_fn = rate_fn
    self._dwell_seconds = dwell_seconds
    self._max_distance = max_distance_angstroms
    self._candidates = candidates
    self._tracker = DriftTracker(max_increment_angstroms)

  def _probs(self, obs):
    return jax.nn.softmax(self._detector_fn(obs['image']), axis=-1)

  def init(self, example_obs):
    return self._tracker.init(
        self._probs(example_obs)[..., 1], example_obs
    )

  def step(self, pstate, key, obs, first):
    from putting_dune_tpu.agents import vision_planner as vp

    del key
    probs = self._probs(obs)
    new_state = self._tracker.update(pstate, probs[..., 1], obs, first)
    action = vp.vision_planner_policy_from_probs(
        probs,
        obs['goal_delta_angstroms'] + new_state['drift'],
        rate_fn=self._rate_fn,
        dwell_seconds=self._dwell_seconds,
        max_distance_angstroms=self._max_distance,
        candidates=self._candidates,
        # Goal displacements are exact honeycomb vectors: snapping the
        # de-drifted goal absorbs the corrector's sub-half-site residual.
        snap_goal_to_lattice=True,
    )
    return new_state, action


class DriftCorrectedMultiDopantVisionPlannerPolicy(eval_lib.StatefulPolicy):
  """D-dopant vision planner with in-loop drift correction.

  Same structure as the single-dopant variant: one UNet pass per frame
  feeds both the phase-correlation drift tracker (carbon map) and the
  peak-based planner; the drift estimate repairs the LIVE goal deltas
  (latched dopants read exactly zero and must stay zero), and the
  anchor's de-drifted goal snaps to the honeycomb.
  """

  def __init__(
      self,
      *,
      detector_fn,
      rate_fn: rates_lib.RateFunction,
      num_dopants: int,
      dwell_seconds: float,
      max_distance_angstroms: float,
      candidates,
      min_separation_px: float = 6.0,
      max_increment_angstroms: float = 1.0,
  ):
    self._detector_fn = detector_fn
    self._rate_fn = rate_fn
    self._num_dopants = num_dopants
    self._dwell_seconds = dwell_seconds
    self._max_distance = max_distance_angstroms
    self._candidates = candidates
    self._min_separation_px = min_separation_px
    self._tracker = DriftTracker(max_increment_angstroms)

  def _probs(self, obs):
    return jax.nn.softmax(self._detector_fn(obs['image']), axis=-1)

  def init(self, example_obs):
    pstate = self._tracker.init(
        self._probs(example_obs)[..., 1], example_obs
    )
    # goal_delta is (B, D*2); track one (B, 2) drift vector.
    pstate['drift'] = jnp.zeros(
        (example_obs['goal_delta_angstroms'].shape[0], 2), jnp.float32
    )
    return pstate

  def step(self, pstate, key, obs, first):
    from putting_dune_tpu.agents import vision_planner as vp

    del key
    probs = self._probs(obs)
    new_state = self._tracker.update(pstate, probs[..., 1], obs, first)
    batch = probs.shape[0]
    deltas = obs['goal_delta_angstroms'].reshape(
        batch, self._num_dopants, 2
    )
    live = jnp.linalg.norm(deltas, axis=-1) > 1e-6  # pre-correction!
    corrected = jnp.where(
        live[..., None], deltas + new_state['drift'][:, None, :], 0.0
    )
    action = vp.multi_dopant_vision_planner_policy_from_probs(
        probs,
        corrected,
        rate_fn=self._rate_fn,
        num_dopants=self._num_dopants,
        dwell_seconds=self._dwell_seconds,
        max_distance_angstroms=self._max_distance,
        candidates=self._candidates,
        min_separation_px=self._min_separation_px,
        live=live,
        snap_goal_to_lattice=True,
    )
    return new_state, action


@dataclasses.dataclass
class DriftCorrectedMultiDopantVisionPlannerAgent:
  """Registry agent: D-dopant vision planner + in-loop drift correction."""

  rate_fn: rates_lib.RateFunction
  num_dopants: int
  dwell_seconds: float = 5.0
  max_distance_angstroms: Optional[float] = None
  weights_dir: Optional[str] = None
  min_separation_px: float = 6.0
  max_increment_angstroms: float = 1.0

  def __post_init__(self):
    from putting_dune_tpu.agents import planner as planner_lib
    from putting_dune_tpu.agents import vision_planner as vp

    self._detector_fn = vp.load_shipped_detector(self.weights_dir)
    if self.max_distance_angstroms is None:
      self.max_distance_angstroms = 2.0 * vp.BOND
    self._candidates = planner_lib.make_candidate_offsets(
        max_radius=self.max_distance_angstroms
    )

  def policy(self) -> DriftCorrectedMultiDopantVisionPlannerPolicy:
    return DriftCorrectedMultiDopantVisionPlannerPolicy(
        detector_fn=self._detector_fn,
        rate_fn=self.rate_fn,
        num_dopants=self.num_dopants,
        dwell_seconds=self.dwell_seconds,
        max_distance_angstroms=self.max_distance_angstroms,
        candidates=self._candidates,
        min_separation_px=self.min_separation_px,
        max_increment_angstroms=self.max_increment_angstroms,
    )


@dataclasses.dataclass
class DriftCorrectedVisionPlannerAgent:
  """Registry agent: vision planner + in-loop drift correction.

  The full stress-config loop: drifting microscope -> pixels -> shipped
  UNet -> recovered lattice geometry + phase-correlation drift estimate
  -> rate-aware planner. Exposes .policy() (a StatefulPolicy) for
  eval.py's batched path.
  """

  rate_fn: rates_lib.RateFunction
  dwell_seconds: float = 5.0
  max_distance_angstroms: Optional[float] = None
  weights_dir: Optional[str] = None
  max_increment_angstroms: float = 1.0

  def __post_init__(self):
    from putting_dune_tpu.agents import planner as planner_lib
    from putting_dune_tpu.agents import vision_planner as vp

    self._detector_fn = vp.load_shipped_detector(self.weights_dir)
    if self.max_distance_angstroms is None:
      self.max_distance_angstroms = 2.0 * vp.BOND
    self._candidates = planner_lib.make_candidate_offsets(
        max_radius=self.max_distance_angstroms
    )

  def policy(self) -> DriftCorrectedVisionPlannerPolicy:
    return DriftCorrectedVisionPlannerPolicy(
        detector_fn=self._detector_fn,
        rate_fn=self.rate_fn,
        dwell_seconds=self.dwell_seconds,
        max_distance_angstroms=self.max_distance_angstroms,
        candidates=self._candidates,
        max_increment_angstroms=self.max_increment_angstroms,
    )
