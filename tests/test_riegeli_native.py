"""Native riegeli reader: validated against files written by the REAL
riegeli C++ writer (embedded in the array_record package) plus a
checked-in golden file, covering all four compression modes, multi-block
chunk spanning, and the io.records .riegeli read path (reference
pipeline/upload_microscope_data.py:223-244)."""

import datetime as dt
import os

import numpy as np
import pytest

from putting_dune_tpu.io import records as records_lib
from putting_dune_tpu.io import riegeli_native as rn

GOLDEN = os.path.join(os.path.dirname(__file__), 'data', 'golden.riegeli')


def _writer(path, options):
  mod = pytest.importorskip('array_record.python.array_record_module')
  return mod.ArrayRecordWriter(path, options)


@pytest.mark.parametrize(
    'compression', ['uncompressed', 'brotli', 'zstd', 'snappy']
)
def test_reads_real_riegeli_chunks(tmp_path, compression):
  payloads = [f'record-{i}-payload'.encode() * 3 for i in range(7)]
  path = str(tmp_path / f'{compression}.riegeli')
  writer = _writer(path, compression)
  for r in payloads:
    writer.write(r)
  writer.close()

  records = rn.read_riegeli_records(path)
  # array_record adds its own header/footer records to the chunk stream;
  # every user payload must be recovered verbatim among them.
  for r in payloads:
    assert r in records


def test_reads_multi_block_file(tmp_path):
  """Chunks and records spanning 64 KiB block boundaries parse correctly
  (block headers interrupt chunk bytes)."""
  rng = np.random.default_rng(0)
  payloads = [rng.bytes(3000) + str(i).encode() for i in range(100)]
  path = str(tmp_path / 'big.riegeli')
  writer = _writer(path, 'brotli')
  for r in payloads:
    writer.write(r)
  writer.close()
  assert os.path.getsize(path) > rn.BLOCK_SIZE

  records = rn.read_riegeli_records(path)
  found = sum(r in records for r in payloads)
  assert found == len(payloads)


def test_golden_file_trajectory_roundtrip():
  """The checked-in golden (written by real riegeli C++, brotli) decodes
  natively, and its Trajectory proto record parses back."""
  from putting_dune_tpu import microscope_data as md

  records = records_lib.read_records(GOLDEN)
  trajectories = []
  for payload in records:
    try:
      trajectories.append(md.Trajectory.from_proto_bytes(payload))
    except Exception:  # array_record metadata records — not Trajectories.
      continue
  real = [t for t in trajectories if len(t.observations) == 2]
  assert len(real) == 1
  obs = real[0].observations[0]
  assert obs.elapsed_time == dt.timedelta(seconds=3.0)
  np.testing.assert_allclose(obs.fov.upper_right, [20.0, 20.0])
  np.testing.assert_array_equal(
      obs.grid.atomic_numbers, np.asarray([6, 14])
  )
  assert obs.image.shape == (4, 4)


def test_rejects_non_riegeli():
  with pytest.raises(rn.RiegeliFormatError, match='signature'):
    rn.read_riegeli_records(
        os.path.join(os.path.dirname(__file__), 'test_riegeli_native.py')
    )


def test_truncated_file(tmp_path):
  with open(GOLDEN, 'rb') as f:
    head = f.read(100)
  path = str(tmp_path / 'trunc.riegeli')
  with open(path, 'wb') as f:
    f.write(head)
  with pytest.raises(rn.RiegeliFormatError):
    rn.read_riegeli_records(path)


def test_write_riegeli_still_gated(tmp_path):
  """Writing valid riegeli needs HighwayHash: without the optional
  package it fails loudly with the tfrecords guidance."""
  try:
    import riegeli  # noqa: F401  # pytype: disable=import-error

    pytest.skip('riegeli package present: writing works natively')
  except ImportError:
    pass
  with pytest.raises(NotImplementedError, match='tfrecords'):
    records_lib.write_records(
        str(tmp_path / 'x.riegeli'), [b'abc']
    )
