"""Drifting frame-stack data for alignment training, generated on device.

The reference trains on a prebuilt grain/TFDS dataset of T-frame stacks
with per-frame drift labels (image_alignment/dataset.py:37-48, 127-147).
Here stacks are synthesized from our simulator: a fixed scene is imaged T
times while the FOV drifts by a random per-step offset; the labels are the
cumulative drifts (angstroms) relative to the final frame.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.imaging import render as render_lib
from putting_dune_tpu.atom_detection import data as det_data


@functools.partial(
    jax.jit,
    static_argnames=(
        'lattice', 'batch_size', 'image_size', 'num_frames', 'noisy',
        'registration_noise', 'inference_preprocessing', 'seed_fraction',
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
    registration_noise: float = 0.0,
    inference_preprocessing: bool = False,
    seed_fraction: float = 0.0,
) -> Dict[str, jnp.ndarray]:
  config = simulator_lib.SimulatorConfig(
      image_size=image_size, noisy_images=noisy
  )
  k_reset, k_drift, k_render, k_border, k_seed = jax.random.split(key, 5)
  state, _ = simulator_lib.reset(
      k_reset, lattice, config=config, batch_size=batch_size,
      return_window=False,
  )

  if registration_noise > 0:
    # Inference-matched protocol (what ImageAligner actually sees in
    # align_trajectories): history frames arrive pad-and-crop REGISTERED
    # to the query FOV up to a small claim residual (the aligner's own
    # per-frame error written back via amend_last_fov), with zero-filled
    # borders where the old frame lacks coverage; only the final frame's
    # residual (one step of uncorrected drift) is large. Labels are each
    # frame's truth-minus-claim residual — the final head is exactly the
    # correction the pipeline applies. Training on raw frame-0-anchored
    # stacks instead leaves this input distribution unseen (registered
    # content + borders) and anchors the gauge on a single frame.
    k_hist, k_final = jax.random.split(k_drift)
    hist = jax.random.uniform(
        k_hist,
        (batch_size, num_frames - 1, 2),
        minval=-registration_noise,
        maxval=registration_noise,
    )
    # A fraction of samples emulate the SEEDED first window (the aligner
    # fills its history with copies of the first real frame): history
    # offsets zero, identical noise realization, no borders.
    seeded = jax.random.bernoulli(
        k_seed, seed_fraction, (batch_size,)
    )
    hist = jnp.where(seeded[:, None, None], 0.0, hist)
    final = jax.random.uniform(
        k_final,
        (batch_size, 1, 2),
        minval=-max_drift_per_step,
        maxval=max_drift_per_step,
    )
    offsets = jnp.concatenate([hist, final], axis=1)  # (B, T, 2)
  else:
    # Raw drifting stacks: per-step drift vectors (angstroms); cumulative
    # drift moves the FOV. Drift label per frame: that frame's cumulative
    # FOV offset relative to the UNDRIFTED scene (frame 0), angstroms.
    steps = jax.random.uniform(
        k_drift,
        (batch_size, num_frames, 2),
        minval=-max_drift_per_step,
        maxval=max_drift_per_step,
    )
    steps = steps.at[:, 0, :].set(0.0)
    offsets = jnp.cumsum(steps, axis=1)  # (B, T, 2)
    seeded = jnp.zeros((batch_size,), bool)

  extent = state.fov.upper_right - state.fov.lower_left  # (B, 2)
  px_per_ang = image_size / extent  # (B, 2)
  row_iota = jax.lax.broadcasted_iota(
      jnp.int32, (image_size, image_size), 0
  )
  col_iota = jax.lax.broadcasted_iota(
      jnp.int32, (image_size, image_size), 1
  )

  frames = []
  masks = []
  render_keys = jax.random.split(k_render, num_frames)
  border_keys = jax.random.split(k_border, num_frames)
  for t in range(num_frames):
    fov_t = structures.FieldOfView(
        state.fov.lower_left + offsets[:, t],
        state.fov.upper_right + offsets[:, t],
    )
    window = simulator_lib.atom_window(
        lattice, state.material, fov_t, config.window_capacity
    )
    frame = render_lib.render_stem_image(
        render_keys[t], window, fov_t, state.imaging,
        image_size=image_size,
    )
    labels = render_lib.render_label_mask(
        window, fov_t,
        intensity_exponent=state.imaging.intensity_exponent,
        image_size=image_size,
    )
    class_ids = jnp.where(
        labels == 14, 2, jnp.where(labels == 6, 1, 0)
    )
    mask_t = jax.nn.one_hot(class_ids, det_data.NUM_CLASSES)

    if inference_preprocessing:
      # Mirror ImageAligner.__call__ exactly: adaptive histogram
      # equalization then per-frame min-max normalization. The renderer
      # already ends with CLAHE, so inference applies it a SECOND time —
      # train on the same double-equalized distribution.
      from putting_dune_tpu.imaging import clahe as clahe_lib

      frame = clahe_lib.equalize_adapthist(frame)
      lo = jnp.min(frame, axis=(1, 2), keepdims=True)
      hi = jnp.max(frame, axis=(1, 2), keepdims=True)
      frame = (frame - lo) / jnp.maximum(hi - lo, 1e-12)

    if registration_noise > 0 and t < num_frames - 1:
      # Seeded samples: history is an identical copy of frame 0 (same
      # noise realization, same claim) — the aligner's self-seeded first
      # window.
      if t > 0:
        frame = jnp.where(seeded[:, None, None], frames[0], frame)
        mask_t = jnp.where(seeded[:, None, None, None], masks[0], mask_t)
      # Zero-filled pad_and_crop borders: the query FOV has drifted up to
      # (T-1-t) steps past this frame's coverage. Same sign conventions
      # as alignment.classical.pad_and_crop_images_by_fov (row 0 = top =
      # max y): query right of claim -> band on the right; query above ->
      # band on top.
      bmax = (num_frames - 1 - t) * max_drift_per_step
      beta = jax.random.uniform(
          border_keys[t], (batch_size, 2), minval=-bmax, maxval=bmax
      )
      beta = jnp.where(seeded[:, None], 0.0, beta)
      bpx = beta * px_per_ang  # (B, 2) signed pixel widths (x, y)
      bx = bpx[:, 0][:, None, None]
      by = bpx[:, 1][:, None, None]
      keep = (
          jnp.where(bx >= 0, col_iota[None] < image_size - bx,
                    col_iota[None] >= -bx)
          & jnp.where(by >= 0, row_iota[None] >= by,
                      row_iota[None] < image_size + by)
      )
      frame = jnp.where(keep, frame, 0.0)
      background = jax.nn.one_hot(
          jnp.zeros((), jnp.int32), det_data.NUM_CLASSES
      )
      mask_t = jnp.where(keep[..., None], mask_t, background)

    frames.append(frame)
    masks.append(mask_t)

  images = jnp.stack(frames, axis=-1)  # (B, S, S, T)
  mask = jnp.concatenate(masks, axis=-1)  # (B, S, S, T*3)
  # The final frame's label is the current drift the aligner must undo —
  # this is the head both the reference's final_only training target
  # (dataset.py:84-91) and ImageAligner.__call__'s time_index=-1 read out;
  # labels relative to the final frame would make that head identically
  # zero.
  drift = offsets  # (B, T, 2)
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
    registration_noise: float = 0.0,
    inference_preprocessing: bool = False,
    seed_fraction: float = 0.0,
) -> Dict[str, jnp.ndarray]:
  """One batch: {images (B,S,S,T), mask (B,S,S,T*3), drift (B,T,2)}."""
  return _sample_stack_impl(
      key, lattice, batch_size, image_size, num_frames, noisy,
      max_drift_per_step, registration_noise, inference_preprocessing,
      seed_fraction,
  )


def dataset_iterator(
    seed: int,
    *,
    batch_size: int = 4,
    image_size: int = 128,
    num_frames: int = 5,
    grid_columns: int = 50,
    noisy: bool = False,
    noisy_fraction: Optional[float] = None,
    max_drift_per_step: float = 1.0,
    registration_noise: float = 0.0,
    inference_preprocessing: bool = False,
    seed_fraction: float = 0.0,
):
  """Endless stream of drifting frame stacks.

  noisy_fraction, when set, overrides `noisy` with a per-batch Bernoulli
  draw (deterministic from seed) — same mixed-stream mechanism as
  atom_detection.data.dataset_iterator.
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
    yield sample_stack(
        k, lattice,
        batch_size=batch_size, image_size=image_size,
        num_frames=num_frames, noisy=batch_noisy,
        max_drift_per_step=max_drift_per_step,
        registration_noise=registration_noise,
        inference_preprocessing=inference_preprocessing,
        seed_fraction=seed_fraction,
    )


# --- record-backed dataset source ---------------------------------------------
# Parity: reference image_alignment/dataset.py:127-147 (materialized
# grain/TFDS loader, per-process sharding). Example schema per record:
# {'images': (S, S, T) f32, 'mask': (S, S, T*3) f32, 'drift': (T, 2) f32}.


def write_dataset(
    records_dir: str,
    *,
    num_examples: int,
    seed: int = 0,
    gen_batch_size: int = 16,
    image_size: int = 128,
    num_frames: int = 5,
    grid_columns: int = 50,
    noisy: bool = False,
    noisy_fraction: Optional[float] = None,
    max_drift_per_step: float = 1.0,
    registration_noise: float = 0.0,
    inference_preprocessing: bool = False,
    seed_fraction: float = 0.0,
    test_examples: int = 0,
    examples_per_shard: int = 128,
) -> int:
  """Materializes a drift-stack dataset as TFRecord shards.

  Generation stages into a sibling directory and publishes atomically
  (io.datasets.write_split_dataset).
  """
  import itertools

  from putting_dune_tpu.io import datasets

  def examples(stream: int):
    batches = dataset_iterator(
        seed + stream,
        batch_size=gen_batch_size,
        image_size=image_size,
        num_frames=num_frames,
        grid_columns=grid_columns,
        noisy=noisy,
        noisy_fraction=noisy_fraction,
        max_drift_per_step=max_drift_per_step,
        registration_noise=registration_noise,
        inference_preprocessing=inference_preprocessing,
        seed_fraction=seed_fraction,
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

  Drop-in replacement for dataset_iterator (same batch dict, consumed
  through parallel.mesh.global_batch); batch_size is PROCESS-LOCAL.
  """
  from putting_dune_tpu.io import datasets

  return datasets.records_iterator(
      datasets.split_dir(records_dir, split),
      batch_size=batch_size,
      seed=seed,
      shuffle=shuffle,
      repeat=True,
  )


def examples_from_labeled_trajectory(
    labeled,
    *,
    num_frames: int = 5,
    image_size: int = 128,
    stride: int = 1,
    inference_preprocessing: bool = False,
):
  """Converts a REAL labeled trajectory into drift-stack train examples.

  This is the path the reference reaches through its materialized
  image-alignment dataset (built from labeled microscope dumps;
  dataset.py:127-147): each sliding window of `num_frames` consecutive
  imaged observations becomes one example. Labels are each frame's
  cumulative drift relative to the window's FIRST frame (the raw-stack
  gauge used by the synthetic generator above). Real data carries no
  segmentation masks, so `mask` is all-background — train with
  Config.ce_loss_weight=0 (drift head only) or mix with synthetic
  batches for the segmentation signal.

  Args:
    labeled: microscope_data.LabeledAlignmentTrajectory (drifts aligned
      one-per-observation).
    num_frames: window length T (must match the model's num_frames).
    image_size: output resolution (frames are resized with cv2).
    stride: window step in observations.
    inference_preprocessing: preprocess each frame exactly as
      ImageAligner.__call__ will at deployment (CLAHE equalize_adapthist
      at full resolution, then INTER_NEAREST resize, then min-max) —
      set True when the deployed aligner runs with
      adaptive_normalization so the drift head trains on the input
      distribution it will actually see; False keeps the plain
      INTER_LINEAR + min-max path.

  Yields:
    {'images': (S,S,T), 'mask': (S,S,T*3), 'drift': (T,2)} examples.
  """
  import cv2

  observations = list(labeled.trajectory.observations)
  drifts = list(labeled.drifts)
  if len(drifts) != len(observations):
    raise ValueError(
        f'{len(drifts)} drift labels for {len(observations)} observations'
    )
  frames = []
  for obs in observations:
    if obs.image is None:
      raise ValueError('observation without an image cannot be aligned')
    img = np.asarray(obs.image, np.float32)
    if img.ndim == 3:
      img = img[..., 0]
    if inference_preprocessing:
      from putting_dune_tpu.imaging import clahe as clahe_lib

      img = np.asarray(
          clahe_lib.equalize_adapthist_padded(jnp.asarray(img[None]))
      )[0]
      interpolation = cv2.INTER_NEAREST
    else:
      interpolation = cv2.INTER_LINEAR
    img = cv2.resize(
        img, (image_size, image_size), interpolation=interpolation
    )
    lo, hi = float(img.min()), float(img.max())
    frames.append((img - lo) / max(hi - lo, 1e-12))

  background = np.zeros(
      (image_size, image_size, num_frames * 3), np.float32
  )
  background[..., 0::3] = 1.0  # one-hot class 0 per frame
  for start in range(0, len(frames) - num_frames + 1, stride):
    window = frames[start:start + num_frames]
    base = drifts[start].drift
    labels = np.stack(
        [
            np.asarray(drifts[start + t].drift, np.float32) - base
            for t in range(num_frames)
        ]
    )
    yield {
        'images': np.stack(window, axis=-1).astype(np.float32),
        'mask': background,
        'drift': labels.astype(np.float32),
    }
