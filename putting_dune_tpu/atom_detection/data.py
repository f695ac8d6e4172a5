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


# --- record-backed dataset source ---------------------------------------------
# Parity: reference atom_detection/dataset.py:81-120 (materialized TFDS
# dataset + grain loader with per-process sharding). Materialization and
# loading live in io/datasets.py; these wrappers fix this loop's example
# schema: {'image': (S, S, 1) f32, 'mask': (S, S, 3) f32}.


def write_dataset(
    records_dir: str,
    *,
    num_examples: int,
    seed: int = 0,
    gen_batch_size: int = 64,
    image_size: int = 128,
    grid_columns: int = 50,
    noisy: bool = False,
    noisy_fraction: Optional[float] = None,
    test_examples: int = 0,
    examples_per_shard: int = 256,
) -> int:
  """Materializes a rendered (image, mask) dataset as TFRecord shards.

  Returns the number of train examples written. When test_examples > 0 a
  held-out `test/` split is written from a disjoint RNG stream (reference
  train/test TFDS splits, dataset.py:95-113). Generation stages into a
  sibling directory and publishes atomically (io.datasets.write_split_dataset).
  """
  import itertools

  from putting_dune_tpu.io import datasets

  def examples(stream: int):
    batches = dataset_iterator(
        seed + stream,
        batch_size=gen_batch_size,
        image_size=image_size,
        grid_columns=grid_columns,
        noisy=noisy,
        noisy_fraction=noisy_fraction,
    )
    return itertools.chain.from_iterable(
        datasets.unbatch(jax.device_get(b)) for b in batches
    )

  return datasets.write_split_dataset(
      records_dir,
      examples,
      num_examples=num_examples,
      test_examples=test_examples,
      examples_per_shard=examples_per_shard,
  )


def records_dataset_iterator(
    records_dir: str,
    seed: int,
    *,
    batch_size: int,
    split: str = 'train',
    shuffle: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
  """Endless per-process-sharded batches from a materialized dataset.

  Drop-in replacement for dataset_iterator: same {'image','mask'} batch
  dict, consumed through parallel.mesh.global_batch. batch_size is the
  PROCESS-LOCAL size; examples shard across processes by global index
  (reference grain.ShardByJaxProcess, dataset.py:100).
  """
  from putting_dune_tpu.io import datasets

  return datasets.records_iterator(
      datasets.split_dir(records_dir, split),
      batch_size=batch_size,
      seed=seed,
      shuffle=shuffle,
      repeat=True,
  )
