"""TFDS/ArrayRecord dataset ingestion (pipeline/import_tfds_dataset).

Fixtures are built with the REAL encoders the reference's data passes
through — tf.train.Example (tensorflow), ArrayRecordWriter (array_record
wheel), PNG (cv2) — laid out exactly like a TFDS dataset version dir
(features.json + `<name>-<split>.<ext>-NNNNN-of-MMMMM` shards). The
converter under test is entirely TF-free.
"""

import json
import os
import zlib

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')
pytest.importorskip('array_record')
cv2 = pytest.importorskip('cv2')

from array_record.python import array_record_module as arm  # noqa: E402

from putting_dune_tpu.io import datasets as datasets_lib  # noqa: E402
from putting_dune_tpu.io import records as records_lib  # noqa: E402
from putting_dune_tpu.io import riegeli_native  # noqa: E402
from putting_dune_tpu.pipeline import import_tfds_dataset as imp  # noqa: E402

FEATURES_JSON = {
    'type': 'tensorflow_datasets.core.features.features_dict.FeaturesDict',
    'content': {
        'features': {
            'image': {
                'type': 'tensorflow_datasets.core.features.image_feature.Image',
                'content': {
                    'shape': [16, 16, 1],
                    'dtype': 'uint8',
                    'encoding_format': 'png',
                },
            },
            'mask': {
                'type': 'tensorflow_datasets.core.features.tensor_feature.Tensor',
                'content': {
                    'shape': [16, 16, 1],
                    'dtype': 'uint8',
                    'encoding': 'zlib',
                },
            },
            'drift': {
                'type': 'tensorflow_datasets.core.features.tensor_feature.Tensor',
                'content': {'shape': [2], 'dtype': 'float32'},
            },
            'num_atoms': {
                'type': (
                    'tensorflow_datasets.core.features.class_label_feature'
                    '.ClassLabel'
                ),
                'content': {'num_classes': 100},
            },
        }
    },
}


def _example(rng):
  image = rng.integers(0, 255, (16, 16, 1), dtype=np.uint8)
  mask = rng.integers(0, 3, (16, 16, 1), dtype=np.uint8) * 7
  drift = rng.standard_normal(2).astype(np.float32)
  label = int(rng.integers(0, 100))
  ok, png = cv2.imencode('.png', image)
  assert ok
  proto = tf.train.Example(
      features=tf.train.Features(
          feature={
              'image': tf.train.Feature(
                  bytes_list=tf.train.BytesList(value=[png.tobytes()])
              ),
              'mask': tf.train.Feature(
                  bytes_list=tf.train.BytesList(
                      value=[zlib.compress(mask.tobytes())]
                  )
              ),
              'drift': tf.train.Feature(
                  float_list=tf.train.FloatList(value=drift.tolist())
              ),
              'num_atoms': tf.train.Feature(
                  int64_list=tf.train.Int64List(value=[label])
              ),
          }
      )
  )
  arrays = dict(image=image, mask=mask, drift=drift,
                num_atoms=np.asarray(label, np.int64))
  return proto.SerializeToString(), arrays


def _materialize(dataset_dir, *, ext, n_train=7, n_test=3, seed=0):
  os.makedirs(dataset_dir, exist_ok=True)
  with open(os.path.join(dataset_dir, 'features.json'), 'w') as f:
    json.dump(FEATURES_JSON, f)
  rng = np.random.default_rng(seed)
  expected = {}
  for split, n, n_shards in (('train', n_train, 2), ('test', n_test, 1)):
    raws, arrays = zip(*(_example(rng) for _ in range(n)))
    expected[split] = list(arrays)
    per = -(-n // n_shards)
    for s in range(n_shards):
      chunk = raws[s * per:(s + 1) * per]
      path = os.path.join(
          dataset_dir, f'toy-{split}.{ext}-{s:05d}-of-{n_shards:05d}'
      )
      if ext == 'array_record':
        w = arm.ArrayRecordWriter(path, 'group_size:2')
        for r in chunk:
          w.write(r)
        w.close()
      else:
        records_lib.write_tfrecords(path, list(chunk))
  return expected


@pytest.mark.parametrize('ext', ['tfrecord', 'array_record'])
def test_convert_tfds_dataset_roundtrip(tmp_path, ext):
  src = str(tmp_path / 'tfds' / 'toy' / '1.0.0')
  dst = str(tmp_path / 'records')
  expected = _materialize(src, ext=ext)

  n_train, n_test = imp.convert(src, dst, examples_per_shard=4)
  assert (n_train, n_test) == (7, 3)

  for split in ('train', 'test'):
    got = list(
        datasets_lib.iterate_examples(datasets_lib.split_dir(dst, split))
    )
    assert len(got) == len(expected[split])
    for g, e in zip(got, expected[split]):
      assert set(g) == set(e)
      for k in e:
        np.testing.assert_array_equal(g[k], e[k], err_msg=f'{split}/{k}')
        assert g[k].dtype == e[k].dtype


def test_iterate_tfds_examples_streaming(tmp_path):
  src = str(tmp_path / 'ds')
  expected = _materialize(src, ext='tfrecord', n_train=4, n_test=1)
  got = list(imp.iterate_tfds_examples(src, 'train'))
  assert len(got) == 4
  np.testing.assert_array_equal(got[2]['image'], expected['train'][2]['image'])
  assert imp.count_tfds_examples(src, 'train') == 4
  assert imp.count_tfds_examples(src, 'test') == 1


def test_array_record_reader_excludes_footer(tmp_path):
  p = str(tmp_path / 'z.array_record')
  w = arm.ArrayRecordWriter(p, 'group_size:3')
  payloads = [os.urandom(np.random.default_rng(i).integers(1, 64))
              for i in range(25)]
  for r in payloads:
    w.write(r)
  w.close()
  assert riegeli_native.read_array_record(p) == payloads


def test_plain_riegeli_file_passthrough(tmp_path):
  # A riegeli file with no ArrayRecord footer returns all records.
  p = str(tmp_path / 'plain.riegeli')
  payloads = [b'alpha', b'beta', b'gamma']
  riegeli_native.write_riegeli_records(p, payloads)
  assert riegeli_native.read_array_record(p) == payloads


def test_dynamic_shape_and_errors(tmp_path):
  spec = imp.FeatureSpec('tensor', [None, 2], 'float32')
  from putting_dune_tpu.proto import putting_dune_tpu_pb2 as pb

  f = pb.FeatureCompat()
  f.float_list.value.extend([1, 2, 3, 4, 5, 6])
  out = imp.decode_feature(f, spec)
  assert out.shape == (3, 2)
  f2 = pb.FeatureCompat()
  f2.float_list.value.extend([1, 2, 3])
  with pytest.raises(ValueError, match='do not fit'):
    imp.decode_feature(f2, spec)
