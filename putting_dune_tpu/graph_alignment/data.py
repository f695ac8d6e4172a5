"""Synthetic point-cloud stacks for graph-alignment training.

The reference trains on a TFDS `graph_alignment` dataset of drifted point
clouds (graph_alignment/dataset.py:30-65). Here stacks come from our
simulator: T observations of the same lattice pose with per-frame global
drift and per-atom jitter; labels are the drifts relative to the final
frame. Static shapes: fixed node capacity per frame + mask.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures


@functools.partial(
    jax.jit,
    static_argnames=('lattice', 'batch_size', 'num_frames', 'capacity'),
)
def _sample_impl(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    batch_size: int,
    num_frames: int,
    capacity: int,
    max_drift_per_step: float,
    jitter_scale: float,
) -> Dict[str, jnp.ndarray]:
  config = simulator_lib.SimulatorConfig(window_capacity=capacity)
  k_reset, k_drift, k_jitter = jax.random.split(key, 3)
  state, _ = simulator_lib.reset(
      k_reset, lattice, config=config, batch_size=batch_size
  )

  steps = jax.random.uniform(
      k_drift,
      (batch_size, num_frames, 2),
      minval=-max_drift_per_step,
      maxval=max_drift_per_step,
  )
  steps = steps.at[:, 0, :].set(0.0)
  cumulative = jnp.cumsum(steps, axis=1)  # (B, T, 2)

  positions, numbers, masks = [], [], []
  jitter_keys = jax.random.split(k_jitter, num_frames)
  for t in range(num_frames):
    # The material appears shifted by -drift when the true FOV drifts.
    fov_t = structures.FieldOfView(
        state.fov.lower_left + cumulative[:, t],
        state.fov.upper_right + cumulative[:, t],
    )
    window = simulator_lib.atom_window(
        lattice, state.material, fov_t, capacity
    )
    # Positions in the ESTIMATED (undrifted) material frame: convert from
    # the drifted microscope frame using the ORIGINAL fov.
    pos_material = (
        window.positions
        * (state.fov.upper_right - state.fov.lower_left)[:, None, :]
        + state.fov.lower_left[:, None, :]
    )
    jitter = (
        jax.random.normal(jitter_keys[t], pos_material.shape) * jitter_scale
    )
    positions.append(
        jnp.where(window.mask[..., None], pos_material + jitter, 0.0)
    )
    numbers.append(window.atomic_numbers)
    masks.append(window.mask)

  n_total = num_frames * capacity
  frame_ids = jnp.tile(
      jnp.repeat(jnp.arange(num_frames, dtype=jnp.int32), capacity)[None],
      (batch_size, 1),
  )
  out = {
      'positions': jnp.concatenate(positions, axis=1),  # (B, T*K, 2)
      'atomic_numbers': jnp.concatenate(numbers, axis=1),
      'mask': jnp.concatenate(masks, axis=1),
      'frame_ids': frame_ids,
      'drift': cumulative - cumulative[:, -1:, :],  # (B, T, 2)
  }
  assert out['positions'].shape[1] == n_total
  return out


def sample_batch(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    *,
    batch_size: int = 8,
    num_frames: int = 2,
    capacity: int = 256,
    max_drift_per_step: float = 1.0,
    jitter_scale: float = 0.05,
) -> Dict[str, jnp.ndarray]:
  return _sample_impl(
      key, lattice, batch_size, num_frames, capacity,
      max_drift_per_step, jitter_scale,
  )


def dataset_iterator(
    seed: int,
    *,
    batch_size: int = 8,
    num_frames: int = 2,
    capacity: int = 256,
    grid_columns: int = 50,
    max_drift_per_step: float = 1.0,
    jitter_scale: float = 0.05,
):
  lattice = lattice_lib.make_lattice(grid_columns)
  key = jax.random.PRNGKey(seed)
  while True:
    key, k = jax.random.split(key)
    yield sample_batch(
        k, lattice,
        batch_size=batch_size, num_frames=num_frames, capacity=capacity,
        max_drift_per_step=max_drift_per_step, jitter_scale=jitter_scale,
    )


# --- record-backed dataset source ---------------------------------------------
# Parity: the reference trains on a materialized TFDS `graph_alignment`
# dataset (reference graph_alignment/dataset.py:30-65); schema here:
# {'positions': (T*K, 2) f32, 'atomic_numbers': (T*K,) i32,
#  'mask': (T*K,) bool, 'frame_ids': (T*K,) i32, 'drift': (T, 2) f32}.


def write_dataset(
    records_dir: str,
    *,
    num_examples: int,
    seed: int = 0,
    gen_batch_size: int = 64,
    num_frames: int = 2,
    capacity: int = 256,
    grid_columns: int = 50,
    max_drift_per_step: float = 1.0,
    jitter_scale: float = 0.05,
    test_examples: int = 0,
    examples_per_shard: int = 256,
) -> int:
  """Materializes drifted point-cloud stacks as TFRecord shards.

  Returns the number of train examples written. When test_examples > 0 a
  held-out `test/` split is written from a disjoint RNG stream.
  Generation stages into a sibling directory and publishes atomically
  (io.datasets.write_split_dataset).
  """
  import itertools

  from putting_dune_tpu.io import datasets

  def examples(stream: int):
    batches = dataset_iterator(
        seed + stream,
        batch_size=gen_batch_size,
        num_frames=num_frames,
        capacity=capacity,
        grid_columns=grid_columns,
        max_drift_per_step=max_drift_per_step,
        jitter_scale=jitter_scale,
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
):
  """Endless per-process-sharded batches from a materialized dataset.

  Drop-in replacement for dataset_iterator: same batch dict, consumed
  through parallel.mesh.global_batch. batch_size is the PROCESS-LOCAL
  size; examples shard across processes by global index.
  """
  from putting_dune_tpu.io import datasets

  return datasets.records_iterator(
      datasets.split_dir(records_dir, split),
      batch_size=batch_size,
      seed=seed,
      shuffle=shuffle,
      repeat=True,
  )
