"""Host data-structure tests: proto round-trips + frame conversions + IO.

Mirrors the reference's largest test file (microscope_utils_test.py:290-707,
per-field round trips) in condensed form, plus native TFRecord IO round
trips (io_test.py:56-90).
"""

import datetime as dt

import numpy as np
import pytest

from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.io import records


def _grid(n=5, seed=0):
  rng = np.random.default_rng(seed)
  nums = np.full(n, 6)
  nums[0] = 14
  return md.AtomicGrid(rng.uniform(0, 1, (n, 2)), nums)


def _fov():
  return md.MicroscopeFieldOfView(
      lower_left=np.asarray([-5.0, -3.0]), upper_right=np.asarray([5.0, 7.0])
  )


def _observation(with_image=False, seed=1):
  image = None
  if with_image:
    image = np.random.default_rng(seed).uniform(0, 1, (16, 16)).astype(
        np.float32
    )
  return md.MicroscopeObservation(
      grid=_grid(seed=seed),
      fov=_fov(),
      controls=(
          md.BeamControl(
              np.asarray([0.5, 0.25]),
              dt.timedelta(seconds=1.5),
              voltage_kv=60.0,
              current_na=0.1,
          ),
      ),
      elapsed_time=dt.timedelta(seconds=3.5),
      image=image,
  )


def test_atomic_grid_roundtrip_and_equality():
  grid = _grid()
  restored = md.AtomicGrid.from_proto_bytes(grid.to_proto_bytes())
  assert restored == grid
  # Permutation-invariant equality (NN matching).
  perm = np.random.default_rng(2).permutation(grid.num_atoms)
  permuted = md.AtomicGrid(
      grid.atom_positions[perm], grid.atomic_numbers[perm]
  )
  assert permuted == grid
  other = md.AtomicGrid(
      grid.atom_positions + 0.5, grid.atomic_numbers
  )
  assert other != grid


def test_beam_control_roundtrip_optionals():
  ctrl = md.BeamControl(np.asarray([0.1, 0.9]), dt.timedelta(seconds=2.0))
  restored = md.BeamControl.from_proto_bytes(ctrl.to_proto_bytes())
  assert restored.voltage_kv is None
  assert restored.current_na is None
  np.testing.assert_allclose(restored.position, ctrl.position, atol=1e-6)
  assert restored.dwell_time == ctrl.dwell_time


def test_fov_transforms_and_roundtrip():
  fov = _fov()
  p = np.asarray([[0.25, 0.5]])
  material = fov.microscope_frame_to_material_frame(p)
  np.testing.assert_allclose(material, [[-2.5, 2.0]], atol=1e-6)
  back = fov.material_frame_to_microscope_frame(material)
  np.testing.assert_allclose(back, p, atol=1e-9)
  restored = md.MicroscopeFieldOfView.from_proto_bytes(fov.to_proto_bytes())
  np.testing.assert_allclose(restored.lower_left, fov.lower_left)
  assert fov.width == 10.0 and fov.height == 10.0
  np.testing.assert_allclose(fov.offset, [0.0, 2.0])


def test_fov_shift_resize_zoom():
  fov = _fov()
  shifted = fov.shift(np.asarray([1.0, -1.0]))
  np.testing.assert_allclose(shifted.lower_left, [-4.0, -4.0])
  resized = fov.resize(20.0, 5.0)
  assert resized.width == pytest.approx(20.0)
  assert resized.height == pytest.approx(5.0)
  np.testing.assert_allclose(resized.offset, fov.offset)
  zoomed = fov.zoom(2.0)
  assert zoomed.width == pytest.approx(5.0)


def test_fov_atoms_in_bounds_tolerance():
  fov = md.MicroscopeFieldOfView(np.zeros(2), np.ones(2))
  grid = md.AtomicGrid(
      np.asarray([[0.5, 0.5], [1.05, 0.5], [2.0, 2.0]]), np.asarray([6, 6, 6])
  )
  assert fov.get_atoms_in_bounds(grid).num_atoms == 1
  assert fov.get_atoms_in_bounds(grid, tolerance=0.1).num_atoms == 2


def test_observation_roundtrip_with_image():
  obs = _observation(with_image=True)
  restored = md.MicroscopeObservation.from_proto_bytes(obs.to_proto_bytes())
  assert restored.grid == obs.grid
  np.testing.assert_allclose(restored.image, obs.image)
  assert restored.elapsed_time == obs.elapsed_time
  assert restored.controls[0].voltage_kv == pytest.approx(60.0)
  # No label image was set.
  assert restored.label_image is None


def test_transition_roundtrip():
  t = md.Transition(
      grid_before=_grid(seed=3),
      grid_after=_grid(seed=4),
      fov_before=_fov(),
      fov_after=_fov().shift(np.asarray([1.0, 0.0])),
      controls=(
          md.BeamControl(np.asarray([0.3, 0.3]), dt.timedelta(seconds=1.0)),
      ),
  )
  restored = md.Transition.from_proto_bytes(t.to_proto_bytes())
  assert restored.grid_before == t.grid_before
  assert restored.grid_after == t.grid_after
  assert restored.image_before is None


def test_trajectory_roundtrip_and_records_io(tmp_path):
  traj = md.Trajectory(observations=tuple(
      _observation(seed=s) for s in range(3)
  ))
  path = str(tmp_path / 'data.tfrecords')
  records.write_records(path, [traj, traj])
  loaded = records.read_records(path, md.Trajectory)
  assert len(loaded) == 2
  assert len(loaded[0].observations) == 3
  assert loaded[0].observations[1].grid == traj.observations[1].grid


def test_tfrecord_native_matches_tensorflow_reader(tmp_path):
  """Wire-format parity: TF's TFRecord reader must read our files."""
  tf = pytest.importorskip('tensorflow')
  path = str(tmp_path / 'x.tfrecords')
  payloads = [b'hello', b'', b'world' * 1000]
  records.write_tfrecords(path, payloads)
  got = [
      bytes(r.numpy()) for r in tf.data.TFRecordDataset(path)
  ]
  assert got == payloads
  # And we read TF-written files.
  tf_path = str(tmp_path / 'y.tfrecords')
  with tf.io.TFRecordWriter(tf_path) as w:
    for p in payloads:
      w.write(p)
  assert records.read_tfrecords(tf_path) == payloads


def test_records_io_unsupported_extension(tmp_path):
  with pytest.raises(ValueError):
    records.write_records(str(tmp_path / 'x.bogus'), [])


def test_drift_apply_to_observation():
  obs = _observation()
  n = obs.grid.num_atoms
  drift = md.Drift(
      drift=np.asarray([1.0, 2.0]), jitter=np.zeros((n, 2))
  )
  moved = drift.apply_to_observation(obs)
  np.testing.assert_allclose(
      moved.fov.lower_left, obs.fov.lower_left + [1.0, 2.0]
  )
  np.testing.assert_allclose(
      moved.grid.atom_positions, obs.grid.atom_positions
  )
  jittered = md.Drift(
      drift=np.zeros(2), jitter=np.full((n, 2), 1.0)
  ).apply_to_observation(obs)
  np.testing.assert_allclose(
      jittered.grid.atom_positions,
      obs.grid.atom_positions + 0.1,  # 1 angstrom / 10 angstrom FOV
  )


def test_labeled_alignment_trajectory_roundtrip():
  obs = _observation()
  n = obs.grid.num_atoms
  lat = md.LabeledAlignmentTrajectory(
      trajectory=md.Trajectory(observations=(obs,)),
      drifts=(
          md.Drift(np.asarray([0.1, 0.2]), np.zeros((n, 2))),
      ),
  )
  restored = md.LabeledAlignmentTrajectory.from_proto_bytes(
      lat.to_proto_bytes()
  )
  np.testing.assert_allclose(restored.drifts[0].drift, [0.1, 0.2],
                             atol=1e-6)


def test_single_silicon_helpers():
  grid = _grid()
  np.testing.assert_allclose(
      md.get_single_silicon_position(grid), grid.atom_positions[0]
  )
  no_si = md.AtomicGrid(np.zeros((2, 2)), np.asarray([6, 6]))
  with pytest.raises(md.SiliconNotFoundError):
    md.get_single_silicon_position(no_si)
