"""ImageAligner: learned drift correction + atom detection at inference.

Parity: /root/reference/putting_dune/alignment.py:290-581 — a framestack
history deque, per-pixel class probabilities -> centroid extraction, a
predicted global drift, and an optional hybrid ICP postprocessing step.
Native JAX model (orbax checkpoint) instead of a TF SavedModel.
"""

from __future__ import annotations

import collections
from typing import Any, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.alignment import classical
from putting_dune_tpu.image_alignment import model as model_lib
from putting_dune_tpu.imaging import clahe as clahe_lib


class ImageAligner:
  """Applies a trained GlobalLocalUNet over a rolling frame history."""

  def __init__(
      self,
      params,
      *,
      features: Tuple[int, ...] = (32, 64, 128, 256),
      history_length: int = 5,
      image_size: int = 128,
      hybrid: bool = False,
      adaptive_normalization: bool = True,
  ):
    self._module = model_lib.GlobalLocalUNet(
        local_output_size=3 * history_length,
        global_output_size=2 * history_length,
        features=features,
    )
    self._params = params
    self.history_length = history_length
    self.image_size = image_size
    self.hybrid = hybrid
    self.adaptive_normalization = adaptive_normalization
    self.needs_reset = True
    self.postprocessing_aligner = None
    if hybrid:
      self.postprocessing_aligner = classical.IterativeAlignmentFiltering(
          history_length=1,
          alignment_iterations=1,
          noise_scale=0.0,
          max_shift=constants.CARBON_BOND_DISTANCE_ANGSTROMS / 2,
          merge_cutoff=constants.CARBON_BOND_DISTANCE_ANGSTROMS / 2,
          accumulate_merged=False,
          clique_merging=True,
          trim=0.5,
      )
    self._apply = jax.jit(
        lambda params, x: self._module.apply({'params': params}, x)
    )

  @classmethod
  def from_checkpoint(
      cls, workdir: str, *, features: Tuple[int, ...] = (32, 64, 128, 256),
      history_length: int = 5, image_size: int = 128, **kwargs,
  ) -> 'ImageAligner':
    from putting_dune_tpu.image_alignment import train as train_lib

    # arch.json (written at ship time) overrides the default pyramid and
    # frame count.
    arch = train_lib.load_arch(workdir)
    if arch is not None:
      features = tuple(arch['features'])
      history_length = int(arch.get('num_frames', history_length))
    config = train_lib.Config(
        workdir=workdir,
        features=features,
        num_frames=history_length,
        image_size=image_size,
    )
    params = train_lib.load_params(workdir, config)
    return cls(
        params,
        features=features,
        history_length=history_length,
        image_size=image_size,
        **kwargs,
    )

  def reset(self, example_image: Optional[np.ndarray] = None) -> None:
    """Clears the frame/FOV history (reference :323-347)."""
    s = self.image_size
    dummy = (
        np.zeros((s, s, 1), np.float32)
        if example_image is None
        else np.zeros_like(example_image)
    )
    self.image_history = collections.deque(maxlen=self.history_length - 1)
    self.fov_history = collections.deque(maxlen=self.history_length - 1)
    for _ in range(self.history_length - 1):
      self.image_history.append(dummy)
      self.fov_history.append(
          md.MicroscopeFieldOfView(np.zeros(2), np.full(2, 20.0))
      )
    if self.hybrid:
      self.postprocessing_aligner.reset()
    self.needs_reset = False
    # The next frame re-seeds the whole history with itself: drift
    # predictions are gauge-anchored on the history CLAIMS, and a window
    # of black zero-fill frames (the reference's convention, :323-347)
    # gives the model no valid anchor for the first history_length-1
    # frames. Under-corrections made then leave the window's claims
    # coherently biased — a bias the model can never detect afterwards
    # (it only measures relative to claims). Seeding with the first real
    # frame at its own claim makes the stack a valid zero-drift anchor
    # from step 0.
    self._seed_pending = True

  # -- detection helpers ------------------------------------------------------

  @classmethod
  def compute_centroids(cls, classes, class_index, erode_iters=1):
    """Centroids of one class in an argmax map (reference :374-420)."""
    mask = np.zeros_like(classes, dtype=np.float32)
    mask[classes == class_index] = 1.0
    mask = (mask * 255).astype(np.uint8)
    if erode_iters:
      mask = cv2.erode(mask, np.ones((2, 2)), iterations=erode_iters)
    contours, _ = cv2.findContours(
        mask, cv2.RETR_LIST, method=cv2.CHAIN_APPROX_SIMPLE
    )
    centroids = []
    for contour in contours:
      m = cv2.moments(contour)
      if m['m00'] != 0:
        c_x = int(m['m10'] / m['m00'])
        c_y = int(m['m01'] / m['m00'])
      else:
        c_x, c_y = 0, 0
      centroids.append(
          (c_x / classes.shape[1], 1.0 - c_y / classes.shape[0])
      )
    return centroids

  @classmethod
  def process_detection_predictions(
      cls, probs: np.ndarray, buffer_width: float = 0.05
  ) -> md.AtomicGrid:
    """Per-pixel probs -> microscope-frame AtomicGrid (reference :422-458)."""
    classes = np.argmax(probs, axis=-1)
    carbon = np.asarray(
        cls.compute_centroids(classes, 1, erode_iters=1)
    ).reshape(-1, 2)
    silicon = np.asarray(
        cls.compute_centroids(classes, 2, erode_iters=3)
    ).reshape(-1, 2)
    positions = np.concatenate([carbon, silicon], axis=0)
    numbers = np.concatenate(
        [
            np.full(len(carbon), constants.CARBON),
            np.full(len(silicon), constants.SILICON),
        ]
    ).astype(np.int32)
    in_bounds = (positions > buffer_width).all(-1) & (
        positions < 1 - buffer_width
    ).all(-1)
    return md.AtomicGrid(positions[in_bounds], numbers[in_bounds])

  def refine_history_claims(self, step_size: float = 1.0) -> None:
    """Re-corrects the FOV claims of frames still in the history.

    The drift heads predict a truth-minus-claim residual for EVERY frame
    of the stack, not just the newest; applying them to the surviving
    history claims means each frame's claim is re-measured on every step
    it spends in the window instead of freezing its first estimate.
    Claim errors then average out across the window rather than
    accumulating as a random walk. Head i of the last prediction maps to
    pre-append history entry i; after the append drops the oldest entry,
    surviving entry j corresponds to head j+1 (the final head's claim is
    the caller's via amend_last_fov).
    """
    if not hasattr(self, 'last_drifts'):
      return
    for j in range(len(self.fov_history) - 1):
      r = self.last_drifts[j + 1] * step_size
      self.fov_history[j] = self.fov_history[j].shift(r)

  def amend_last_fov(self, fov: md.MicroscopeFieldOfView) -> None:
    """Replaces the FOV recorded for the most recent frame.

    Drift predictions are gauge-anchored on the oldest history frame AS
    CLAIMED: if a caller improves its estimate of a frame's true FOV
    after the fact (e.g. align_trajectories applies the correction
    computed FROM this frame), writing the corrected claim back keeps the
    history registered to truth. Without this, each stack window anchors
    on a pre-correction claim and the correction lags by one step-drift
    per window — a linearly accumulating alignment error over long
    trajectories.
    """
    if self.fov_history:
      self.fov_history[-1] = fov

  # -- main entry point ---------------------------------------------------------

  def __call__(
      self,
      image: np.ndarray,
      fov: md.MicroscopeFieldOfView,
      grid: Optional[md.AtomicGrid] = None,
      time_index: int = -1,
  ) -> Tuple[md.AtomicGrid, np.ndarray, np.ndarray]:
    """Aligns + detects one new frame (reference :490-581).

    Returns (grid in the microscope frame, predicted drift (2,) in
    angstroms, per-pixel class probabilities for the queried frame).
    """
    s = self.image_size
    image = np.asarray(image, np.float32)
    if image.ndim == 2:
      image = image[..., None]
    if self.adaptive_normalization:
      # _padded: real microscope frames come in arbitrary sizes; the
      # core kernel requires 2*grid-divisible dims.
      eq = clahe_lib.equalize_adapthist_padded(
          jnp.asarray(image[None, ..., 0])
      )
      image = np.asarray(eq)[0][..., None]
    image = cv2.resize(image, (s, s), interpolation=cv2.INTER_NEAREST)
    if image.ndim == 2:
      image = image[..., None]
    lo, hi = image.min(), image.max()
    image = (image - lo) / max(hi - lo, 1e-12)

    if self.needs_reset:
      self.reset(example_image=image)
    if getattr(self, '_seed_pending', False):
      for _ in range(self.history_length - 1):
        self.image_history.append(image.copy())
        self.fov_history.append(fov)
      self._seed_pending = False

    padded = [
        classical.pad_and_crop_images_by_fov(old_img, old_fov, fov)
        for old_img, old_fov in zip(self.image_history, self.fov_history)
    ]
    padded.append(image)
    framestack = np.concatenate(padded, axis=-1)  # (S, S, T)

    logits, pred_drift = self._apply(
        self._params, jnp.asarray(framestack[None])
    )
    logits = np.asarray(logits)[0].reshape(s, s, self.history_length, 3)
    pred_drift = np.asarray(pred_drift)[0].reshape(self.history_length, 2)
    probs = jax.device_get(
        jax.nn.softmax(jnp.asarray(logits[..., time_index, :]), axis=-1)
    )
    # All per-frame drift heads for this stack, kept for callers that
    # refine history claims (refine_history_claims); index i corresponds
    # to the PRE-append history entry i, index -1 to the current frame.
    self.last_drifts = pred_drift
    pred_drift = pred_drift[time_index]

    if grid is None:
      grid = self.process_detection_predictions(probs)

    self.image_history.append(image)
    self.fov_history.append(fov)

    if self.hybrid:
      try:
        shifted_fov = fov.shift(-pred_drift)
        material_grid = shifted_fov.microscope_frame_to_material_frame(grid)
        postprocessed, post_drift = self.postprocessing_aligner(
            material_grid
        )
        pred_drift = pred_drift + post_drift
        shifted_fov = fov.shift(-pred_drift)
        grid = shifted_fov.material_frame_to_microscope_frame(postprocessed)
      except Exception as e:  # pylint: disable=broad-except
        print(f'Postprocessing failed; {e}')
        self.postprocessing_aligner.reset()

    return grid, pred_drift, probs
