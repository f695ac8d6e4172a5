"""Atom detection inference: segmentation logits -> atom centroids.

Parity: /root/reference/putting_dune/atom_detector.py:30-185 — softmax
probabilities, per-class binary masks (carbon dilate/erode cleanup, silicon
XOR-masked against carbon), distance-transform thresholding, contour
moments for centroids, returning a microscope-frame AtomicGrid (origin at
the bottom-left). The model is a native JAX UNet loaded from an orbax
checkpoint instead of a TF SavedModel downloaded from GCS.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.atom_detection import model as model_lib


def compute_centroids(
    mask_image: np.ndarray, value: int, threshold_value: int,
    image_size: int = 256,
) -> List[Tuple[float, float]]:
  """Blob centroids via distance transform + contour moments (ref :30-77)."""
  masked = np.zeros_like(mask_image, dtype=np.uint8)
  masked[mask_image == value] = 1

  dists = cv2.distanceTransform(masked, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
  # Scale to [0, 255]. (The reference multiplies raw pixel distances by 255
  # and casts to uint8, which overflows for blobs wider than one pixel;
  # normalizing by the max keeps the 0-255 thresholds scale-invariant.)
  peak = dists.max()
  if peak > 0:
    dists = dists / peak
  dists = (dists * 255).astype(np.uint8)
  _, dists = cv2.threshold(dists, threshold_value, 255, cv2.THRESH_BINARY)

  contours, *_ = cv2.findContours(
      dists, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
  )
  centroids = []
  for contour in contours:
    m = cv2.moments(contour)
    if m['m00'] != 0:
      c_x = int(m['m10'] / m['m00'])
      c_y = int(m['m01'] / m['m00'])
    else:
      c_x, c_y = 0, 0
    # Normalize with (0,0) bottom-left, (1,1) top-right.
    centroids.append((c_x / image_size, 1.0 - c_y / image_size))
  return centroids


class AtomDetector:
  """Detects atoms in STEM frames with a trained UNet."""

  def __init__(
      self,
      params,
      *,
      features: Tuple[int, ...] = (32, 64, 128, 256),
      num_classes: int = 3,
      image_size: int = 256,
  ):
    self._module = model_lib.UNet(
        num_classes=num_classes, features=features
    )
    self._params = params
    self._image_size = image_size
    self._apply = jax.jit(
        lambda params, x: jax.nn.softmax(
            self._module.apply({'params': params}, x), axis=-1
        )
    )

  @classmethod
  def from_checkpoint(
      cls, workdir: str, *, features: Tuple[int, ...] = (32, 64, 128, 256),
      image_size: int = 256,
  ) -> 'AtomDetector':
    from putting_dune_tpu.atom_detection import train as train_lib

    # An arch.json sidecar (written at ship time) overrides the default
    # feature pyramid, so artifacts of any width/depth load correctly.
    arch = train_lib.load_arch(workdir)
    if arch is not None:
      features = tuple(arch['features'])
    config = train_lib.Config(
        workdir=workdir, features=features, image_size=image_size
    )
    params = train_lib.load_params(workdir, config)
    return cls(params, features=features, image_size=image_size)

  def __call__(self, image: np.ndarray) -> md.AtomicGrid:
    """Image (H, W[, 1]) -> microscope-frame AtomicGrid of detections."""
    s = self._image_size
    image = np.asarray(image, np.float32)
    if image.ndim == 3:
      image = image[..., 0]
    image = cv2.resize(image, (s, s), interpolation=cv2.INTER_NEAREST)
    lo, hi = image.min(), image.max()
    image = (image - lo) / max(hi - lo, 1e-12)

    probs = np.asarray(
        self._apply(self._params, jnp.asarray(image[None, ..., None]))
    )[0]

    carbon_probs = probs[:, :, 1]
    _, carbon_bin = cv2.threshold(carbon_probs, 0.025, 1.0, cv2.THRESH_BINARY)
    dilated = cv2.dilate(carbon_bin, np.ones((2, 2)), iterations=4)
    dilated = cv2.erode(dilated, np.ones((2, 2)), iterations=2)

    silicon_probs = probs[:, :, 2]
    _, silicon_bin = cv2.threshold(
        silicon_probs, 0.5, 1.0, cv2.THRESH_BINARY
    )
    # Suppress silicon detections overlapping likely carbon (reference
    # :152-157 XORs raw probabilities with the dilated carbon mask; we mask
    # the binarized map, which is the stated intent and stays in {0, 1}).
    masked_silicon = np.where(dilated > 0, 0.0, silicon_bin)

    carbon_centroids = compute_centroids(
        carbon_bin.astype(np.uint8), 1, 25, s
    )
    silicon_centroids = compute_centroids(
        masked_silicon.astype(np.uint8), 1, 140, s
    )

    positions = np.concatenate(
        [
            np.asarray(carbon_centroids).reshape(-1, 2),
            np.asarray(silicon_centroids).reshape(-1, 2),
        ],
        axis=0,
    )
    numbers = np.concatenate(
        [
            np.full(len(carbon_centroids), constants.CARBON),
            np.full(len(silicon_centroids), constants.SILICON),
        ]
    )
    return md.AtomicGrid(positions, numbers)
