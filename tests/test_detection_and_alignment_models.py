"""Atom-detection + image-alignment model/train/inference tests."""

import dataclasses
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.atom_detection import data as det_data
from putting_dune_tpu.atom_detection import inference as det_inference
from putting_dune_tpu.atom_detection import model as det_model
from putting_dune_tpu.atom_detection import train as det_train
from putting_dune_tpu.image_alignment import data as align_data
from putting_dune_tpu.image_alignment import inference as align_inference
from putting_dune_tpu.image_alignment import model as align_model
from putting_dune_tpu.image_alignment import train as align_train

LATTICE = lattice_lib.make_lattice(num_cols=20)
SMALL = (8, 16)


def test_unet_shapes():
  module = det_model.UNet(features=SMALL, num_classes=3)
  x = jnp.zeros((2, 32, 32, 1))
  params = module.init(jax.random.PRNGKey(0), x)['params']
  out = module.apply({'params': params}, x)
  assert out.shape == (2, 32, 32, 3)
  single = module.apply({'params': params}, x[0])
  assert single.shape == (32, 32, 3)


def test_detection_data_batch():
  batch = det_data.sample_batch(
      jax.random.PRNGKey(1), LATTICE, batch_size=2, image_size=64
  )
  assert batch['image'].shape == (2, 64, 64, 1)
  assert batch['mask'].shape == (2, 64, 64, 3)
  mask = np.asarray(batch['mask'])
  # All three classes present; background dominates.
  class_counts = mask.sum(axis=(0, 1, 2))
  assert (class_counts > 0).all(), class_counts
  assert class_counts[0] > class_counts[1] > class_counts[2]


def test_detection_mixed_noise_iterator():
  """noisy_fraction mixes clean and noisy batches deterministically.

  The per-batch PRNG key stream is independent of the mix draw, so a
  mixed-stream batch equals the clean stream's batch exactly when the
  Bernoulli drew False."""
  kwargs = dict(batch_size=1, image_size=32, grid_columns=10)
  mixed = det_data.dataset_iterator(9, noisy_fraction=0.5, **kwargs)
  clean = det_data.dataset_iterator(9, noisy=False, **kwargs)
  same = [
      bool(jnp.allclose(next(mixed)['image'], next(clean)['image']))
      for _ in range(16)
  ]
  assert any(same) and not all(same), same

  mixed2 = det_data.dataset_iterator(9, noisy_fraction=0.5, **kwargs)
  clean2 = det_data.dataset_iterator(9, noisy=False, **kwargs)
  same2 = [
      bool(jnp.allclose(next(mixed2)['image'], next(clean2)['image']))
      for _ in range(16)
  ]
  assert same == same2  # deterministic from the seed


def test_detection_training_learns(tmp_path):
  config = det_train.Config(
      workdir=str(tmp_path),
      batch_size=8,
      epochs=2,
      steps_per_epoch=8,
      eval_steps=2,
      image_size=32,
      features=SMALL,
      grid_columns=20,
  )
  history = []
  det_train.train(config, progress=lambda e, m: history.append(m))
  assert len(history) == 2
  # Better than uniform (ln 3 = 1.1) and improving.
  assert history[-1]['loss'] < 1.0
  assert history[-1]['accuracy'] > 0.5
  # Reload best params.
  params = det_train.load_params(str(tmp_path), config)
  assert params is not None

  # Warm-start continuation: a fresh workdir with no orbax history picks
  # up the previous run's params via init_params_from (the shipping step
  # prunes checkpoints, leaving only params.msgpack behind).
  det_train.save_params_msgpack(params, str(tmp_path))
  shutil.rmtree(tmp_path / 'checkpoints')
  cont_dir = tmp_path / 'continue'
  cont_dir.mkdir()
  cont = dataclasses.replace(
      config, workdir=str(cont_dir), epochs=0,
      init_params_from=str(tmp_path),
  )
  state = det_train.train(cont)
  jax.tree_util.tree_map(
      np.testing.assert_allclose, jax.device_get(state.params), params
  )


def test_atom_detector_centroids_on_ideal_segmentation():
  # Build an ideal prob map with two carbon blobs and one silicon blob.
  s = 256
  probs = np.zeros((s, s, 3), np.float32)
  probs[..., 0] = 1.0

  def put(cls, cx, cy, r):
    yy, xx = np.mgrid[:s, :s]
    mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r**2
    probs[mask, :] = 0.0
    probs[mask, cls] = 1.0

  put(1, 64, 64, 10)
  put(1, 192, 64, 10)
  put(2, 128, 192, 12)

  centroids_c = det_inference.compute_centroids(
      (np.argmax(probs, -1) == 1).astype(np.uint8), 1, 5, s
  )
  assert len(centroids_c) == 2
  got = np.sort(np.asarray(centroids_c)[:, 0])
  np.testing.assert_allclose(got, [64 / s, 192 / s], atol=0.02)
  centroids_si = det_inference.compute_centroids(
      (np.argmax(probs, -1) == 2).astype(np.uint8), 1, 5, s
  )
  assert len(centroids_si) == 1
  np.testing.assert_allclose(
      centroids_si[0], [128 / s, 1 - 192 / s], atol=0.02
  )


def test_atom_detector_end_to_end_untrained():
  """Mechanics: random-params detector returns a valid grid."""
  module = det_model.UNet(features=SMALL)
  params = module.init(
      jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 1))
  )['params']
  detector = det_inference.AtomDetector(
      params, features=SMALL, image_size=64
  )
  image = np.random.default_rng(0).uniform(0, 1, (128, 128))
  grid = detector(image)
  assert isinstance(grid, md.AtomicGrid)
  assert ((grid.atom_positions >= 0) & (grid.atom_positions <= 1)).all()


def test_global_local_unet_shapes():
  module = align_model.GlobalLocalUNet(
      local_output_size=15, global_output_size=10, features=SMALL
  )
  x = jnp.zeros((2, 32, 32, 5))
  params = module.init(jax.random.PRNGKey(3), x)['params']
  local, global_out = module.apply({'params': params}, x)
  assert local.shape == (2, 32, 32, 15)
  assert global_out.shape == (2, 10)


def test_alignment_data_stack():
  batch = align_data.sample_stack(
      jax.random.PRNGKey(4), LATTICE, batch_size=2, image_size=32,
      num_frames=3,
  )
  assert batch['images'].shape == (2, 32, 32, 3)
  assert batch['mask'].shape == (2, 32, 32, 9)
  assert batch['drift'].shape == (2, 3, 2)
  # Frame 0 is undrifted: its label is zero; labels are cumulative FOV
  # drift relative to the undrifted scene, so the final frame's label is
  # the sum of the per-step drifts (what the aligner must undo).
  drift = np.asarray(batch['drift'])
  np.testing.assert_allclose(drift[:, 0], 0.0)
  assert (np.abs(drift[:, -1]) > 0).any()


def test_alignment_data_registration_mode():
  """Inference-matched protocol: history frames carry small claim
  residuals + zero pad_and_crop borders; the final frame carries the full
  step residual and no border."""
  batch = align_data.sample_stack(
      jax.random.PRNGKey(5), LATTICE, batch_size=4, image_size=64,
      num_frames=3, registration_noise=0.3, max_drift_per_step=1.0,
  )
  assert batch['images'].shape == (4, 64, 64, 3)
  drift = np.asarray(batch['drift'])
  assert (np.abs(drift[:, :-1]) <= 0.3 + 1e-6).all()
  assert (np.abs(drift[:, -1]) <= 1.0 + 1e-6).all()
  # History labels are NOT all zero (residual noise is real) and the
  # final-frame labels are larger on average.
  assert (np.abs(drift[:, :-1]) > 0).any()
  images = np.asarray(batch['images'])
  # Border emulation zeroes bands only on history frames.
  hist_zero = (images[..., :-1] == 0).mean()
  final_zero = (images[..., -1] == 0).mean()
  assert hist_zero > final_zero
  # Segmentation labels in zeroed border bands are remapped to
  # background. Identify bands as fully-zero columns (natural zeros from
  # the noise chain never blank a whole column).
  mask = np.asarray(batch['mask']).reshape(4, 64, 64, 3, 3)
  for b in range(4):
    zero_cols = (images[b, :, :, 0] == 0).all(axis=0)
    if zero_cols.any():
      assert (mask[b, :, zero_cols, 0, :].argmax(-1) == 0).all()


def test_alignment_training_reduces_drift_error(tmp_path):
  config = align_train.Config(
      workdir=str(tmp_path),
      batch_size=8,
      epochs=2,
      steps_per_epoch=8,
      eval_steps=2,
      image_size=32,
      num_frames=3,
      features=SMALL,
      grid_columns=20,
  )
  history = []
  align_train.train(config, progress=lambda e, m: history.append(m))
  assert len(history) == 2
  assert np.isfinite(history[-1]['drift_error'])
  # Drift labels are bounded by cumulative U(-1,1) over 3 frames; even a
  # barely trained model should beat a 5 A error.
  assert history[-1]['drift_error'] < 5.0


def test_image_aligner_mechanics():
  history = 3
  module = align_model.GlobalLocalUNet(
      local_output_size=3 * history,
      global_output_size=2 * history,
      features=SMALL,
  )
  params = module.init(
      jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, history))
  )['params']
  aligner = align_inference.ImageAligner(
      params, features=SMALL, history_length=history, image_size=32,
      hybrid=False, adaptive_normalization=False,
  )
  fov = md.MicroscopeFieldOfView(np.zeros(2), np.full(2, 20.0))
  rng = np.random.default_rng(1)
  for step in range(4):
    image = rng.uniform(0, 1, (64, 64))
    grid, drift, probs = aligner(image, fov)
    assert probs.shape == (32, 32, 3)
    assert drift.shape == (2,)
    assert isinstance(grid, md.AtomicGrid)


def test_shipped_detector_finds_silicon():
  """The shipped atom_detector checkpoint localizes the dopant."""
  import os

  import numpy as np
  import pytest

  from putting_dune_tpu import constants
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu.atom_detection import data as det_data
  from putting_dune_tpu.atom_detection import inference as det_inf
  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'atom_detector'
  )
  if not os.path.exists(os.path.join(weights, 'params.msgpack')):
    pytest.skip('detector weights not shipped yet')

  detector = det_inf.AtomDetector.from_checkpoint(weights, image_size=256)
  lat = lattice_lib.make_lattice(50)
  found = 0
  for seed in range(3):
    batch = det_data.sample_batch(
        jax.random.PRNGKey(seed), lat, batch_size=1, image_size=256
    )
    grid = detector(np.asarray(batch['image'][0, ..., 0]))
    found += int(
        (np.asarray(grid.atomic_numbers) == constants.SILICON).any()
    )
  assert found >= 2


def test_shipped_detector_pixel_accuracy():
  """The shipped detector's eval pixel accuracy stays near its recorded
  value (the trivial all-background baseline is ~87%). One fresh 4-image
  batch (262k labeled pixels; scene-to-scene variance ~1 point) keeps a
  reference-scale (64..1024) artifact's CPU forward affordable here."""
  import os

  import numpy as np
  import pytest

  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'atom_detector'
  )
  if not os.path.exists(os.path.join(weights, 'params.msgpack')):
    pytest.skip('detector weights not shipped yet')

  arch = det_train.load_arch(weights)
  config = det_train.Config(
      workdir=weights, image_size=256, batch_size=4,
      **({'features': tuple(arch['features'])} if arch else {}),
  )
  params = det_train.load_params(weights, config)
  state = det_train.create_state(config)
  state = state.replace(params=params)
  it = det_data.dataset_iterator(
      123, batch_size=4, image_size=256, grid_columns=50, noisy=False
  )
  acc = float(jax.device_get(det_train.eval_step(state, next(it))))
  assert acc > 0.88, acc


def test_detector_arch_sidecar_roundtrip(tmp_path):
  """A shipped artifact with a non-default feature pyramid reloads with
  the right architecture via the arch.json sidecar."""
  import numpy as np

  config = det_train.Config(
      workdir=str(tmp_path), image_size=64, features=(8, 16)
  )
  state = det_train.create_state(config)
  det_train.save_params_msgpack(state.params, str(tmp_path), config=config)

  # Loader given a DEFAULT config must still reconstruct the (8, 16) net.
  params = det_train.load_params(str(tmp_path))
  restored_kernel = params['down_0']['kernel']
  assert restored_kernel.shape[-1] == 8

  det = det_inference.AtomDetector.from_checkpoint(
      str(tmp_path), image_size=64
  )
  grid = det(np.random.default_rng(0).uniform(0, 1, (64, 64)))
  assert grid.atomic_numbers.ndim == 1


def test_aligner_arch_sidecar_roundtrip(tmp_path):
  """A shipped aligner with a non-default pyramid AND frame count
  reloads with the right architecture via the arch.json sidecar — both
  through load_params (a default config) and ImageAligner.from_checkpoint
  (default kwargs)."""
  config = align_train.Config(
      workdir=str(tmp_path), image_size=64, features=(8, 16), num_frames=3
  )
  state = align_train.create_state(config)
  align_train.save_params_msgpack(state.params, str(tmp_path), config=config)

  # Loader given NO config must reconstruct the (8, 16) x 3-frame net.
  params = align_train.load_params(str(tmp_path))
  assert params['down_0']['kernel'].shape[-1] == 8
  # local head: 3 classes x 3 frames.
  assert params['local_head']['kernel'].shape[-1] == 9

  aligner = align_inference.ImageAligner.from_checkpoint(
      str(tmp_path), image_size=64, hybrid=False,
      adaptive_normalization=False,
  )
  assert aligner.history_length == 3
  grid, drift, probs = aligner(
      np.random.default_rng(0).uniform(0, 1, (64, 64)),
      md.MicroscopeFieldOfView(np.zeros(2), np.full(2, 20.0)),
  )
  assert drift.shape == (2,)
  assert probs.shape == (64, 64, 3)


def test_save_model_clis_export_matching_tf_saved_models(tmp_path):
  """Both perception save_model CLIs package a trained checkpoint into the
  native artifact AND (with --export_tf) a jax2tf TF SavedModel whose
  outputs match the native module element-wise — extending SavedModel
  interop coverage (test_reference_headtohead_models.py) to the
  perception family (reference atom_detection/save_model.py:64-126 and
  image_alignment/save_model.py)."""
  tf = pytest.importorskip('tensorflow')
  import os
  import subprocess
  import sys

  # Repo root = THREE levels up from atom_detection/train.py. (One level
  # short puts putting_dune_tpu/ itself on the child's PYTHONPATH, where
  # its proto/ package shadows the pip `proto` (proto-plus) module that
  # orbax's google-cloud-logging import needs.)
  repo_root = os.path.dirname(os.path.dirname(
      os.path.dirname(os.path.abspath(det_train.__file__))
  ))
  env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=repo_root)

  # --- atom detection ---------------------------------------------------
  det_workdir = tmp_path / 'det_run'
  det_config = det_train.Config(
      workdir=str(det_workdir), image_size=32, features=(4, 8),
      batch_size=8, epochs=1, steps_per_epoch=2, eval_steps=1,
      grid_columns=10,
  )
  det_train.train(det_config)
  det_out = tmp_path / 'det_artifact'
  proc = subprocess.run(
      [
          sys.executable, '-m', 'putting_dune_tpu.atom_detection.save_model',
          f'--workdir={det_workdir}', f'--output_dir={det_out}',
          '--image_size=32', '--features', '4', '8', '--export_tf',
      ],
      env=env, capture_output=True, text=True, timeout=300,
  )
  assert proc.returncode == 0, proc.stderr
  assert (det_out / 'params.msgpack').exists()
  assert (det_out / 'model.json').exists()

  params = det_train.load_params(str(det_workdir), det_config)
  image = np.asarray(
      jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 1)), np.float32
  )
  native = np.asarray(
      det_model.UNet(features=(4, 8)).apply({'params': params}, image)
  )
  tf_model = tf.saved_model.load(str(det_out / 'tf_saved_model'))
  # TF re-lowers the jax2tf graph; conv reassociation gives ~1e-4-scale
  # element diffs at these widths.
  np.testing.assert_allclose(
      np.asarray(tf_model(image)), native, rtol=1e-3, atol=1e-4
  )

  # --- image alignment --------------------------------------------------
  align_workdir = tmp_path / 'align_run'
  align_config = align_train.Config(
      workdir=str(align_workdir), batch_size=8, epochs=1,
      steps_per_epoch=2, eval_steps=1, image_size=32, num_frames=3,
      features=(4, 8), grid_columns=10,
  )
  align_train.train(align_config)
  align_out = tmp_path / 'align_artifact'
  proc = subprocess.run(
      [
          sys.executable, '-m',
          'putting_dune_tpu.image_alignment.save_model',
          f'--workdir={align_workdir}', f'--output_dir={align_out}',
          '--image_size=32', '--num_frames=3', '--features', '4', '8',
          '--export_tf',
      ],
      env=env, capture_output=True, text=True, timeout=300,
  )
  assert proc.returncode == 0, proc.stderr
  a_params = align_train.load_params(str(align_workdir), align_config)
  stack = np.asarray(
      jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)), np.float32
  )
  native_local, native_global = align_model.GlobalLocalUNet(
      local_output_size=9, global_output_size=6, features=(4, 8)
  ).apply({'params': a_params}, stack)
  tf_align = tf.saved_model.load(str(align_out / 'tf_saved_model'))
  tf_local, tf_global = tf_align(stack)
  np.testing.assert_allclose(
      np.asarray(tf_local), np.asarray(native_local), rtol=1e-3, atol=1e-4
  )
  np.testing.assert_allclose(
      np.asarray(tf_global), np.asarray(native_global), rtol=1e-3,
      atol=1e-4,
  )
