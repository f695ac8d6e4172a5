"""Training data for atom detection, generated on device.

The reference trains on a prebuilt TFDS `atom_detection` dataset of
simulator-rendered (image, mask) pairs with classes remapped C->1, Si->2
(atom_detection/dataset.py:29-77). This framework generates equivalent
pairs directly from its own simulator + STEM renderer — no external
dataset: every batch is a fresh domain-randomized scene, rendered and
labeled entirely on the accelerator.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.imaging import render as render_lib

# Class ids (reference dataset.py:49-56): 0 background, 1 carbon, 2 silicon.
NUM_CLASSES = 3


@functools.partial(
    jax.jit, static_argnames=('lattice', 'batch_size', 'image_size', 'noisy')
)
def _sample_batch_impl(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    batch_size: int,
    image_size: int,
    noisy: bool,
) -> Dict[str, jnp.ndarray]:
  config = simulator_lib.SimulatorConfig(
      image_size=image_size, noisy_images=noisy
  )
  k_reset, k_render = jax.random.split(key)
  state, obs = simulator_lib.reset(
      k_reset, lattice, config=config, batch_size=batch_size,
      return_window=True,
  )
  image = render_lib.render_stem_image(
      k_render, obs.window, state.fov, state.imaging, image_size=image_size
  )
  labels = render_lib.render_label_mask(
      obs.window, state.fov,
      intensity_exponent=state.imaging.intensity_exponent,
      image_size=image_size,
  )
  class_ids = jnp.where(
      labels == constants.SILICON,
      2,
      jnp.where(labels == constants.CARBON, 1, 0),
  )
  mask = jax.nn.one_hot(class_ids, NUM_CLASSES)
  return {'image': image[..., None], 'mask': mask}


def sample_batch(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    *,
    batch_size: int = 8,
    image_size: int = 128,
    noisy: bool = False,
) -> Dict[str, jnp.ndarray]:
  """One batch of {image (B,S,S,1), mask (B,S,S,3)} fresh scenes."""
  return _sample_batch_impl(key, lattice, batch_size, image_size, noisy)


def dataset_iterator(
    seed: int,
    *,
    batch_size: int = 8,
    image_size: int = 128,
    grid_columns: int = 50,
    noisy: bool = False,
    noisy_fraction: Optional[float] = None,
) -> Iterator[Dict[str, jnp.ndarray]]:
  """Endless stream of freshly generated batches.

  noisy_fraction, when set, overrides `noisy` with a per-batch Bernoulli
  draw (deterministic from seed): each batch is rendered fully noisy with
  that probability and clean otherwise. `noisy` stays a static jit arg,
  so a mixed stream alternates between the two compiled programs instead
  of branching on device.
  """
  lattice = lattice_lib.make_lattice(grid_columns)
  key = jax.random.PRNGKey(seed)
  mix_rng = np.random.default_rng(seed) if noisy_fraction is not None else None
  while True:
    key, k = jax.random.split(key)
    batch_noisy = (
        bool(mix_rng.random() < noisy_fraction) if mix_rng is not None
        else noisy
    )
    yield sample_batch(
        k, lattice, batch_size=batch_size, image_size=image_size,
        noisy=batch_noisy,
    )
