"""Record-backed dataset sources for the perception train loops.

Covers io/datasets.py (ArrayExample round-trip, sharded writer, seeded
shuffling, per-process example sharding) and the data_source='records:'
paths of the atom-detection and image-alignment train loops (reference
atom_detection/dataset.py:81-120, image_alignment/dataset.py:127-147).
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from putting_dune_tpu.io import datasets


def test_array_example_roundtrip():
  example = {
      'image': np.arange(12, dtype=np.float32).reshape(3, 4),
      'mask': np.asarray([[1, 0], [0, 1]], np.uint8),
      'drift': np.asarray([1.5, -2.5], np.float64),
  }
  restored = datasets.example_from_bytes(datasets.example_to_bytes(example))
  assert set(restored) == set(example)
  for k in example:
    assert restored[k].dtype == example[k].dtype
    np.testing.assert_array_equal(restored[k], example[k])


def _toy_examples(n):
  return [
      {'x': np.full((2, 2), i, np.float32), 'i': np.asarray([i], np.int32)}
      for i in range(n)
  ]


def test_write_read_sharded(tmp_path):
  d = str(tmp_path / 'ds')
  paths = datasets.write_examples(
      d, _toy_examples(10), examples_per_shard=4
  )
  assert [os.path.basename(p) for p in paths] == [
      'part-00000.tfrecords', 'part-00001.tfrecords', 'part-00002.tfrecords'
  ]
  assert datasets.count_examples(d) == 10
  ids = [int(e['i'][0]) for e in datasets.iterate_examples(d)]
  assert ids == list(range(10))

  # A smaller re-materialization replaces the dataset: stale
  # high-numbered shards from the first write must not survive.
  datasets.write_examples(d, _toy_examples(5), examples_per_shard=4)
  assert datasets.count_examples(d) == 5
  assert [int(e['i'][0]) for e in datasets.iterate_examples(d)] == [
      0, 1, 2, 3, 4
  ]


def test_write_split_dataset_replaces_stale_test_split(tmp_path):
  d = str(tmp_path / 'ds')

  def make(stream):
    # Disjoint streams: train ids 0..N, test ids 100..100+N.
    return iter(_toy_examples(200)[100 * stream:])

  datasets.write_split_dataset(d, make, num_examples=6, test_examples=3)
  assert datasets.count_examples(d) == 6
  assert datasets.count_examples(datasets.split_dir(d, 'test')) == 3

  # Re-materializing WITHOUT a test split must not leave the old test/
  # directory behind to silently feed eval (stale held-out data).
  datasets.write_split_dataset(d, make, num_examples=4, test_examples=0)
  assert datasets.count_examples(d) == 4
  with pytest.raises(FileNotFoundError):
    datasets.split_dir(d, 'test')


def test_write_split_dataset_short_generator_reports_actual_count(
    tmp_path, caplog
):
  """num_examples is a CAP: a generator that runs dry earlier publishes
  what it yielded, returns the ACTUAL count, and logs the shortfall —
  the reported size can never exceed what is on disk."""
  import logging as _logging

  d = str(tmp_path / 'ds')

  def make(stream):
    del stream
    return iter(_toy_examples(5))

  with caplog.at_level(_logging.WARNING):
    written = datasets.write_split_dataset(d, make, num_examples=1000)
  assert written == 5
  assert datasets.count_examples(d) == 5
  assert any('yielded only 5/1000' in r.message for r in caplog.records)


def test_write_split_dataset_empty_generator_keeps_previous(tmp_path):
  """A generator yielding ZERO train examples must refuse to publish:
  retiring a good dataset for an empty one leaves every reader raising
  on shard_paths()."""
  d = str(tmp_path / 'ds')
  datasets.write_split_dataset(
      d, lambda stream: iter(_toy_examples(4)), num_examples=4,
  )
  with pytest.raises(ValueError, match='zero train examples'):
    datasets.write_split_dataset(d, lambda stream: iter(()), num_examples=8)
  assert datasets.count_examples(d) == 4


def test_write_split_dataset_crash_keeps_previous_dataset(tmp_path):
  d = str(tmp_path / 'ds')
  datasets.write_split_dataset(
      d, lambda stream: iter(_toy_examples(10)), num_examples=10,
      test_examples=0, examples_per_shard=4,
  )

  def exploding(stream):
    yield from _toy_examples(3)
    raise RuntimeError('generator died mid-materialization')

  # A crash mid-generation must leave the PREVIOUS dataset intact — not
  # a silently-truncated 3-example one that records_iterator would
  # happily train on.
  with pytest.raises(RuntimeError, match='mid-materialization'):
    datasets.write_split_dataset(
        d, exploding, num_examples=10, test_examples=0,
    )
  assert datasets.count_examples(d) == 10
  assert not [p for p in os.listdir(str(tmp_path)) if 'incoming' in p]


def test_split_dir_resolution(tmp_path):
  d = str(tmp_path / 'ds')
  datasets.write_examples(d, _toy_examples(4), examples_per_shard=4)
  # Convention: train shards at the root, held-out splits in subdirs.
  assert datasets.split_dir(d, 'train') == d
  import pytest

  with pytest.raises(FileNotFoundError, match='test'):
    datasets.split_dir(d, 'test')  # missing eval split must NOT fall
    # back to the training shards (silent eval-on-train).
  test_d = os.path.join(d, 'test')
  datasets.write_examples(test_d, _toy_examples(2), examples_per_shard=4)
  assert datasets.split_dir(d, 'test') == test_d


def test_records_iterator_batches_and_shuffle(tmp_path):
  d = str(tmp_path / 'ds')
  datasets.write_examples(d, _toy_examples(10), examples_per_shard=4)

  # Unshuffled single epoch: deterministic order, remainder dropped.
  batches = list(
      datasets.records_iterator(
          d, batch_size=4, shuffle=False, repeat=False,
          process_index=0, process_count=1,
      )
  )
  assert len(batches) == 2  # 10 examples -> 2 full batches of 4
  assert batches[0]['x'].shape == (4, 2, 2)
  got = np.concatenate([b['i'][:, 0] for b in batches])
  np.testing.assert_array_equal(got, np.arange(8))

  # Shuffled: same multiset over one epoch, different order, reproducible.
  def epoch_ids(seed):
    it = datasets.records_iterator(
        d, batch_size=5, seed=seed, shuffle=True, repeat=False,
        process_index=0, process_count=1, shuffle_buffer=4,
    )
    return [int(i) for b in it for i in b['i'][:, 0]]

  assert sorted(epoch_ids(1)) == list(range(10))
  assert epoch_ids(1) == epoch_ids(1)
  assert epoch_ids(1) != list(range(10)) or epoch_ids(2) != list(range(10))


def test_records_iterator_process_sharding(tmp_path):
  """Processes see DISJOINT example slices whose union is the dataset
  (reference grain.ShardByJaxProcess, atom_detection/dataset.py:100)."""
  d = str(tmp_path / 'ds')
  datasets.write_examples(d, _toy_examples(12), examples_per_shard=5)

  def ids_for(rank):
    it = datasets.records_iterator(
        d, batch_size=2, shuffle=False, repeat=False,
        process_index=rank, process_count=2,
    )
    return {int(i) for b in it for i in b['i'][:, 0]}

  a, b = ids_for(0), ids_for(1)
  assert a == set(range(0, 12, 2))
  assert b == set(range(1, 12, 2))
  assert a | b == set(range(12))


def test_parse_data_source():
  assert datasets.parse_data_source('synthetic') is None
  assert datasets.parse_data_source('') is None
  assert datasets.parse_data_source('records:/x/y') == '/x/y'
  with pytest.raises(ValueError):
    datasets.parse_data_source('tfds:foo')


def test_detection_records_match_in_memory_and_train(tmp_path):
  """render -> write -> read round-trips bitwise, and one train step on
  the records path matches the in-memory path exactly."""
  from putting_dune_tpu.atom_detection import data as det_data
  from putting_dune_tpu.atom_detection import train as det_train

  d = str(tmp_path / 'det')
  det_data.write_dataset(
      d, num_examples=16, seed=3, gen_batch_size=8, image_size=32,
      grid_columns=20, test_examples=8, examples_per_shard=8,
  )
  assert datasets.count_examples(d) == 16
  assert datasets.count_examples(os.path.join(d, 'test')) == 8

  # Bitwise round-trip vs the generator stream that produced the shards.
  gen = det_data.dataset_iterator(
      3, batch_size=8, image_size=32, grid_columns=20
  )
  in_memory = [
      e for b in [next(gen), next(gen)] for e in datasets.unbatch(
          jax.device_get(b)
      )
  ]
  from_records = list(datasets.iterate_examples(d))
  assert len(from_records) == len(in_memory)
  for mem, rec in zip(in_memory, from_records):
    np.testing.assert_array_equal(mem['image'], rec['image'])
    np.testing.assert_array_equal(mem['mask'], rec['mask'])

  # One train step: records batch (unshuffled) == stacked in-memory batch.
  config = det_train.Config(
      workdir=str(tmp_path / 'w'), image_size=32, batch_size=8,
      features=(4, 8), grid_columns=20,
  )
  records_batch = next(
      det_data.records_dataset_iterator(d, 0, batch_size=8, shuffle=False)
  )
  memory_batch = {
      k: np.stack([e[k] for e in in_memory[:8]]) for k in ('image', 'mask')
  }
  # train_step donates its state: use two (identical-seed) states.
  _, m_rec = det_train.train_step(
      det_train.create_state(config), records_batch
  )
  _, m_mem = det_train.train_step(
      det_train.create_state(config), memory_batch
  )
  assert float(m_rec['loss']) == pytest.approx(float(m_mem['loss']), abs=0)

  # Full loop smoke through data_source='records:...' (eval = test split).
  config = dataclasses.replace(
      config, data_source=f'records:{d}', epochs=1, steps_per_epoch=2,
      eval_steps=1,
  )
  det_train.train(config)
  assert os.path.isdir(os.path.join(config.workdir, 'checkpoints'))


def test_detection_records_train_without_test_split(tmp_path):
  """A dataset written without a test/ split (write_dataset default
  test_examples=0) still trains: eval falls back to the synthetic stream
  instead of failing at iterator construction."""
  from putting_dune_tpu.atom_detection import data as det_data
  from putting_dune_tpu.atom_detection import train as det_train

  d = str(tmp_path / 'det_notest')
  det_data.write_dataset(
      d, num_examples=8, seed=3, gen_batch_size=8, image_size=32,
      grid_columns=20, examples_per_shard=8,
  )
  assert not os.path.isdir(os.path.join(d, 'test'))
  config = det_train.Config(
      workdir=str(tmp_path / 'w_notest'), image_size=32, batch_size=8,
      features=(4, 8), grid_columns=20, data_source=f'records:{d}',
      epochs=1, steps_per_epoch=1, eval_steps=1,
  )
  det_train.train(config)
  assert os.path.isdir(os.path.join(config.workdir, 'checkpoints'))


def test_alignment_records_train_loop(tmp_path):
  from putting_dune_tpu.image_alignment import data as align_data
  from putting_dune_tpu.image_alignment import train as align_train

  d = str(tmp_path / 'align')
  align_data.write_dataset(
      d, num_examples=8, seed=5, gen_batch_size=8, image_size=32,
      num_frames=3, grid_columns=20, test_examples=8,
      examples_per_shard=8,
  )
  batch = next(
      align_data.records_dataset_iterator(d, 0, batch_size=8, shuffle=False)
  )
  assert batch['images'].shape == (8, 32, 32, 3)
  assert batch['mask'].shape == (8, 32, 32, 9)
  assert batch['drift'].shape == (8, 3, 2)

  config = align_train.Config(
      workdir=str(tmp_path / 'w'), image_size=32, num_frames=3,
      batch_size=8, features=(4, 8), grid_columns=20,
      data_source=f'records:{d}', epochs=1, steps_per_epoch=2,
      eval_steps=1,
  )
  align_train.train(config)
  assert os.path.isdir(os.path.join(config.workdir, 'checkpoints'))


def test_graph_alignment_records_train_loop(tmp_path):
  """The GNN aligner's train loop also consumes materialized datasets
  (reference graph_alignment/dataset.py:30-65 trains from a TFDS dataset):
  write -> read round-trips the point-cloud schema bitwise and the loop
  trains through data_source='records:...'."""
  from putting_dune_tpu.graph_alignment import data as graph_data
  from putting_dune_tpu.graph_alignment import train as graph_train
  from putting_dune_tpu.io import datasets

  d = str(tmp_path / 'graph')
  graph_data.write_dataset(
      d, num_examples=8, seed=7, gen_batch_size=8, num_frames=2,
      capacity=64, grid_columns=20, test_examples=8, examples_per_shard=8,
  )
  assert datasets.count_examples(d) == 8

  # Bitwise round-trip vs the generator stream that produced the shards.
  gen = graph_data.dataset_iterator(
      7, batch_size=8, num_frames=2, capacity=64, grid_columns=20
  )
  in_memory = list(datasets.unbatch(jax.device_get(next(gen))))
  from_records = list(datasets.iterate_examples(d))
  assert len(from_records) == len(in_memory)
  for mem, rec in zip(in_memory, from_records):
    assert set(rec) == {
        'positions', 'atomic_numbers', 'mask', 'frame_ids', 'drift'
    }
    for k in rec:
      np.testing.assert_array_equal(mem[k], rec[k])
      assert rec[k].dtype == np.asarray(mem[k]).dtype

  batch = next(
      graph_data.records_dataset_iterator(d, 0, batch_size=8, shuffle=False)
  )
  assert batch['positions'].shape == (8, 128, 2)
  assert batch['drift'].shape == (8, 2, 2)

  config = graph_train.Config(
      workdir=str(tmp_path / 'w'), num_frames=2, capacity=64,
      batch_size=8, width=8, num_layers=1, k=4, grid_columns=20,
      data_source=f'records:{d}', epochs=1, steps_per_epoch=2,
      eval_steps=1,
  )
  graph_train.train(config)
  assert os.path.isdir(os.path.join(config.workdir, 'checkpoints'))


def test_examples_from_labeled_trajectory(tmp_path):
  """REAL labeled microscope data (LabeledAlignmentTrajectory records)
  converts into drift-stack training examples with window-relative labels,
  and the records path trains on them with ce_loss_weight=0."""
  from putting_dune_tpu import microscope_data as md
  from putting_dune_tpu.image_alignment import data as align_data
  from putting_dune_tpu.image_alignment import train as align_train
  from putting_dune_tpu.io import records as records_lib

  rng = np.random.default_rng(0)
  num_obs, size = 6, 24
  observations = []
  cumulative = np.cumsum(rng.uniform(-1, 1, (num_obs, 2)), axis=0)
  cumulative[0] = 0.0
  drifts = []
  for t in range(num_obs):
    grid = md.AtomicGrid(
        atom_positions=np.zeros((1, 2)), atomic_numbers=np.asarray([14])
    )
    fov = md.MicroscopeFieldOfView(
        lower_left=np.asarray([0.0, 0.0]), upper_right=np.asarray([10.0, 10.0])
    )
    import datetime as dt

    observations.append(
        md.MicroscopeObservation(
            grid=grid, fov=fov, controls=(),
            elapsed_time=dt.timedelta(seconds=float(t)),
            image=rng.uniform(size=(size, size)).astype(np.float32),
        )
    )
    drifts.append(md.Drift(drift=cumulative[t], jitter=np.zeros((1, 2))))
  labeled = md.LabeledAlignmentTrajectory(
      trajectory=md.Trajectory(observations=tuple(observations)),
      drifts=tuple(drifts),
  )

  examples = list(
      align_data.examples_from_labeled_trajectory(
          labeled, num_frames=3, image_size=32
      )
  )
  assert len(examples) == num_obs - 3 + 1
  for w, ex in enumerate(examples):
    assert ex['images'].shape == (32, 32, 3)
    assert ex['drift'].shape == (3, 2)
    np.testing.assert_allclose(ex['drift'][0], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        ex['drift'][2], cumulative[w + 2] - cumulative[w],
        rtol=1e-5, atol=1e-6,
    )
    # Masks are all-background one-hots for every frame.
    np.testing.assert_allclose(ex['mask'][..., 0::3], 1.0)
    np.testing.assert_allclose(ex['mask'][..., 1::3], 0.0)

  # inference_preprocessing=True must feed the drift head exactly what
  # ImageAligner.__call__ will at deployment (CLAHE at full resolution,
  # INTER_NEAREST resize, min-max) — otherwise training on real records
  # bakes in train/serve skew.
  import cv2
  import jax.numpy as jnp

  from putting_dune_tpu.imaging import clahe as clahe_lib

  (ex_inf,) = list(
      align_data.examples_from_labeled_trajectory(
          labeled, num_frames=num_obs, image_size=32,
          inference_preprocessing=True,
      )
  )
  raw0 = np.asarray(observations[0].image, np.float32)
  eq = np.asarray(
      clahe_lib.equalize_adapthist_padded(jnp.asarray(raw0[None]))
  )[0]
  eq = cv2.resize(eq, (32, 32), interpolation=cv2.INTER_NEAREST)
  lo, hi = float(eq.min()), float(eq.max())
  expected0 = (eq - lo) / max(hi - lo, 1e-12)
  np.testing.assert_allclose(ex_inf['images'][..., 0], expected0, atol=1e-6)
  assert not np.allclose(
      ex_inf['images'][..., 0], examples[0]['images'][..., 0]
  )

  # Round-trip the labeled trajectory through its RECORD format, convert,
  # materialize, and run one real train step with ce disabled.
  traj_path = str(tmp_path / 'labeled.tfrecords')
  records_lib.write_records(traj_path, [labeled])
  (restored,) = records_lib.read_records(
      traj_path, md.LabeledAlignmentTrajectory
  )
  d = str(tmp_path / 'real')
  datasets.write_examples(
      d,
      align_data.examples_from_labeled_trajectory(
          restored, num_frames=3, image_size=32
      ),
  )
  config = align_train.Config(
      workdir=str(tmp_path / 'w'), image_size=32, num_frames=3,
      batch_size=4, features=(4, 8), data_source=f'records:{d}',
      ce_loss_weight=0.0, epochs=1, steps_per_epoch=1, eval_steps=1,
  )
  state = align_train.create_state(config)
  batch = next(
      align_data.records_dataset_iterator(d, 0, batch_size=4)
  )
  _, metrics = align_train.train_step(
      state, batch, 1.0, 3, False, 0.0
  )
  assert np.isfinite(float(metrics['loss']))
  assert float(metrics['loss']) == pytest.approx(
      float(metrics['drift_loss'])
  )
