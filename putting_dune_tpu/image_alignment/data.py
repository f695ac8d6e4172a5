"""Drifting frame-stack data for alignment training, generated on device.

The reference trains on a prebuilt grain/TFDS dataset of T-frame stacks
with per-frame drift labels (image_alignment/dataset.py:37-48, 127-147).
Here stacks are synthesized from our simulator: a fixed scene is imaged T
times while the FOV drifts by a random per-step offset; the labels are the
cumulative drifts (angstroms) relative to the final frame.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.imaging import render as render_lib
from putting_dune_tpu.atom_detection import data as det_data


@functools.partial(
    jax.jit,
    static_argnames=(
        'lattice', 'batch_size', 'image_size', 'num_frames', 'noisy'
    ),
)
def _sample_stack_impl(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    batch_size: int,
    image_size: int,
    num_frames: int,
    noisy: bool,
    max_drift_per_step: float,
) -> Dict[str, jnp.ndarray]:
  config = simulator_lib.SimulatorConfig(
      image_size=image_size, noisy_images=noisy
  )
  k_reset, k_drift, k_render = jax.random.split(key, 3)
  state, _ = simulator_lib.reset(
      k_reset, lattice, config=config, batch_size=batch_size,
      return_window=False,
  )

  # Per-step drift vectors (angstroms); cumulative drift moves the FOV.
  steps = jax.random.uniform(
      k_drift,
      (batch_size, num_frames, 2),
      minval=-max_drift_per_step,
      maxval=max_drift_per_step,
  )
  steps = steps.at[:, 0, :].set(0.0)
  cumulative = jnp.cumsum(steps, axis=1)  # (B, T, 2)

  frames = []
  masks = []
  render_keys = jax.random.split(k_render, num_frames)
  for t in range(num_frames):
    fov_t = structures.FieldOfView(
        state.fov.lower_left + cumulative[:, t],
        state.fov.upper_right + cumulative[:, t],
    )
    window = simulator_lib.atom_window(
        lattice, state.material, fov_t, config.window_capacity
    )
    frames.append(
        render_lib.render_stem_image(
            render_keys[t], window, fov_t, state.imaging,
            image_size=image_size,
        )
    )
    labels = render_lib.render_label_mask(
        window, fov_t,
        intensity_exponent=state.imaging.intensity_exponent,
        image_size=image_size,
    )
    class_ids = jnp.where(
        labels == 14, 2, jnp.where(labels == 6, 1, 0)
    )
    masks.append(jax.nn.one_hot(class_ids, det_data.NUM_CLASSES))

  images = jnp.stack(frames, axis=-1)  # (B, S, S, T)
  mask = jnp.concatenate(masks, axis=-1)  # (B, S, S, T*3)
  # Drift label per frame: that frame's cumulative FOV offset relative to
  # the UNDRIFTED scene (frame 0), angstroms. The final frame's label is
  # the current drift the aligner must undo — this is the head both the
  # reference's final_only training target (dataset.py:84-91) and
  # ImageAligner.__call__'s time_index=-1 read out; labels relative to the
  # final frame would make that head identically zero.
  drift = cumulative  # (B, T, 2)
  return {'images': images, 'mask': mask, 'drift': drift}


def sample_stack(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    *,
    batch_size: int = 4,
    image_size: int = 128,
    num_frames: int = 5,
    noisy: bool = False,
    max_drift_per_step: float = 1.0,
) -> Dict[str, jnp.ndarray]:
  """One batch: {images (B,S,S,T), mask (B,S,S,T*3), drift (B,T,2)}."""
  return _sample_stack_impl(
      key, lattice, batch_size, image_size, num_frames, noisy,
      max_drift_per_step,
  )


def dataset_iterator(
    seed: int,
    *,
    batch_size: int = 4,
    image_size: int = 128,
    num_frames: int = 5,
    grid_columns: int = 50,
    noisy: bool = False,
    max_drift_per_step: float = 1.0,
):
  lattice = lattice_lib.make_lattice(grid_columns)
  key = jax.random.PRNGKey(seed)
  while True:
    key, k = jax.random.split(key)
    yield sample_stack(
        k, lattice,
        batch_size=batch_size, image_size=image_size,
        num_frames=num_frames, noisy=noisy,
        max_drift_per_step=max_drift_per_step,
    )
