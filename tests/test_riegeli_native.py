"""Native riegeli codec: the reader is validated against files written
by the REAL riegeli C++ writer (embedded in the array_record package)
plus a checked-in golden file, covering all four compression modes,
multi-block chunk spanning, and the io.records .riegeli read path; the
HighwayHash implementations (native C++ and pure Python) are validated
against the reference HighwayHash64_Portable from the same wheel; and
the native writer round-trips with verification on, matches the real
writer byte-for-byte on the file prefix, and links block headers the
way real readers seek (reference upload_microscope_data.py:223-244)."""

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


def _require_compressor(compression):
  """Skips when the system (de)compression library is unavailable."""
  code = rn._COMPRESSION_BY_NAME[compression]
  if code == rn.COMPRESSION_NONE:
    return
  if rn._COMPRESSORS[code](b'probe') is None:
    pytest.skip(f'system {compression} library not installed')


@pytest.mark.parametrize(
    'compression', ['uncompressed', 'brotli', 'zstd', 'snappy']
)
def test_reads_real_riegeli_chunks(tmp_path, compression):
  _require_compressor(compression)
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
  # With verification on, an arbitrary file fails the block-header hash;
  # with it off, the missing signature chunk is diagnosed.
  with pytest.raises(rn.RiegeliFormatError, match='hash mismatch'):
    rn.read_riegeli_records(
        os.path.join(os.path.dirname(__file__), 'test_riegeli_native.py')
    )
  with pytest.raises(rn.RiegeliFormatError, match='signature'):
    rn.read_riegeli_records(
        os.path.join(os.path.dirname(__file__), 'test_riegeli_native.py'),
        verify=False,
    )


def test_truncated_file(tmp_path):
  with open(GOLDEN, 'rb') as f:
    head = f.read(100)
  path = str(tmp_path / 'trunc.riegeli')
  with open(path, 'wb') as f:
    f.write(head)
  with pytest.raises(rn.RiegeliFormatError):
    rn.read_riegeli_records(path)


# --- HighwayHash ----------------------------------------------------------------


def _oracle_hash64():
  """The reference HighwayHash64_Portable embedded in the array_record
  wheel (the same binary riegeli's own hashes were produced by)."""
  import ctypes

  mod = pytest.importorskip('array_record.python.array_record_module')
  lib = ctypes.CDLL(mod.__file__)
  fn = lib.HighwayHash64_Portable
  fn.restype = ctypes.c_uint64
  fn.argtypes = [
      ctypes.POINTER(ctypes.c_uint64 * 4), ctypes.c_char_p, ctypes.c_uint64
  ]

  def call(key, data):
    ckey = (ctypes.c_uint64 * 4)(*key)
    return int(fn(ctypes.byref(ckey), data, len(data)))

  return call


def test_highwayhash_matches_reference_implementation():
  """Native and pure-Python HighwayHash-64 agree with the reference
  portable implementation across packet/remainder size classes and
  random keys."""
  oracle = _oracle_hash64()
  rng = np.random.default_rng(7)
  sizes = [0, 1, 3, 4, 15, 16, 17, 31, 32, 33, 63, 64, 65, 100, 1000]
  for size in sizes:
    data = rng.bytes(size)
    key = tuple(int(x) for x in rng.integers(0, 2**63, 4))
    want = oracle(key, data)
    assert rn.highwayhash64(data, key) == want, size
    assert rn._highwayhash64_py(data, key) == want, size


def test_stored_hashes_in_real_riegeli_files_verify():
  """Key + coverage are right: every hash stored by the real riegeli
  C++ writer (golden file) verifies."""
  assert rn.read_riegeli_records(GOLDEN, verify=True)


# --- transposed chunks -----------------------------------------------------------

GOLDEN_TRANSPOSED = os.path.join(
    os.path.dirname(__file__), 'data', 'golden_transposed.riegeli'
)


def _assert_contains_in_order(records, payloads):
  """Every payload appears, in order (array_record adds its own header/
  footer records to the chunk stream around user records)."""
  it = iter(records)
  for p in payloads:
    assert any(r == p for r in it), f'missing payload {p!r}'


@pytest.mark.parametrize(
    'compression', ['uncompressed', 'brotli', 'zstd', 'snappy']
)
def test_reads_real_transposed_chunks(tmp_path, compression):
  """Transposed chunks (RecordWriter transpose=true) written by the real
  riegeli C++ writer decode natively — proto records are reassembled
  from the column-wise state machine."""
  _require_compressor(compression)
  payloads = [
      b'\x08\x05\x12\x02hi',           # varint + string field
      b'\x08\xac\x02',                 # multi-byte varint
      b'\x1a\x04\x08\x05\x10\x01',     # nested submessage
      b'\x12\x03\xff\xff\xff',         # non-proto-parseable string field
      b'not-a-proto-record-at-all',    # non-proto record
      b'',                             # empty record
      b'\x09\x01\x02\x03\x04\x05\x06\x07\x08',  # fixed64
      b'\x0d\x01\x02\x03\x04',         # fixed32
      b'\x08\x05\x08\x06\x08\x07',     # repeated field
  ] * 3
  path = str(tmp_path / f't_{compression}.riegeli')
  writer = _writer(path, f'transpose,{compression}')
  for r in payloads:
    writer.write(r)
  writer.close()
  _assert_contains_in_order(rn.read_riegeli_records(path, verify=True),
                            payloads)


def test_transposed_fuzz_random_protos(tmp_path):
  """Round-trip fuzz: random nested protos and raw byte records through
  the real transposed writer, across group sizes."""
  import random

  rng = random.Random(7)

  def rand_proto(depth=0):
    out = bytearray()
    for _ in range(rng.randint(0, 5)):
      field = rng.randint(1, 300)
      wt = rng.choice([0, 1, 2, 5])
      out += rn._encode_varint((field << 3) | wt)
      if wt == 0:
        out += rn._encode_varint(rng.randint(0, 2**56))
      elif wt == 1:
        out += rng.randbytes(8)
      elif wt == 5:
        out += rng.randbytes(4)
      elif depth < 3 and rng.random() < 0.5:
        inner = rand_proto(depth + 1)
        out += rn._encode_varint(len(inner)) + inner
      else:
        s = rng.randbytes(rng.randint(0, 40))
        out += rn._encode_varint(len(s)) + s
    return bytes(out)

  for trial in range(8):
    n = rng.randint(1, 80)
    if trial % 3 == 2:
      payloads = [rng.randbytes(rng.randint(0, 150)) for _ in range(n)]
    else:
      payloads = [rand_proto() for _ in range(n)]
    path = str(tmp_path / f'fuzz{trial}.riegeli')
    writer = _writer(
        path,
        f'transpose,uncompressed,group_size:{rng.choice([3, 50, 1000])}',
    )
    for p in payloads:
      writer.write(p)
    writer.close()
    _assert_contains_in_order(rn.read_riegeli_records(path), payloads)


def test_transposed_many_distinct_shapes(tmp_path):
  """>64 distinct record shapes force large state-machine jump deltas."""
  payloads = [
      rn._encode_varint(((i + 1) << 3) | 0) + rn._encode_varint(i * 7 + 2)
      for i in range(150)
  ]
  path = str(tmp_path / 'shapes.riegeli')
  writer = _writer(path, 'transpose,uncompressed')
  for p in payloads:
    writer.write(p)
  writer.close()
  _assert_contains_in_order(rn.read_riegeli_records(path), payloads)


def test_golden_transposed_trajectory_roundtrip():
  """The checked-in transposed golden (real riegeli C++ writer, brotli,
  transpose=true) decodes natively and its Trajectory protos parse."""
  from putting_dune_tpu import microscope_data as md

  records = rn.read_riegeli_records(GOLDEN_TRANSPOSED, verify=True)
  trajectories = []
  for payload in records:
    try:
      t = md.Trajectory.from_proto_bytes(payload)
    except Exception:  # array_record header/footer records
      continue
    # array_record's own meta records can parse as degenerate
    # single-observation trajectories; the goldens have exactly 2.
    if len(t.observations) == 2:
      trajectories.append(t)
  assert len(trajectories) == 2
  assert trajectories[0].observations[0].grid.num_atoms == 3
  assert trajectories[1].observations[0].grid.num_atoms == 2
  c = trajectories[0].observations[0].controls[0]
  assert c.dwell_time.total_seconds() == 1.5


# --- native writer ---------------------------------------------------------------


@pytest.mark.parametrize(
    'compression', ['uncompressed', 'brotli', 'zstd', 'snappy']
)
def test_native_writer_roundtrip(tmp_path, compression):
  _require_compressor(compression)
  rng = np.random.default_rng(3)
  payloads = [rng.bytes(int(n)) for n in rng.integers(0, 500, 50)]
  path = str(tmp_path / f'w_{compression}.riegeli')
  rn.write_riegeli_records(path, payloads, compression=compression)
  assert rn.read_riegeli_records(path, verify=True) == payloads


def test_native_writer_multiblock(tmp_path):
  """Files spanning several 64 KiB blocks (chunks interrupted by block
  headers) round-trip with hash verification on."""
  rng = np.random.default_rng(4)
  payloads = [rng.bytes(3000) for _ in range(100)]
  path = str(tmp_path / 'big.riegeli')
  rn.write_riegeli_records(
      path, payloads, compression='uncompressed', chunk_target_bytes=10**9
  )
  assert os.path.getsize(path) > rn.BLOCK_SIZE
  assert rn.read_riegeli_records(path, verify=True) == payloads


def test_native_writer_prefix_matches_real_writer(tmp_path):
  """The first 64 bytes (block header + signature chunk) are
  byte-identical to the real riegeli C++ writer's output."""
  path = str(tmp_path / 'sig.riegeli')
  rn.write_riegeli_records(path, [b'x'], compression='uncompressed')
  with open(path, 'rb') as f:
    mine = f.read(64)
  with open(GOLDEN, 'rb') as f:
    real = f.read(64)
  assert mine == real


def test_native_writer_block_header_links(tmp_path):
  """previous_chunk/next_chunk distances in written block headers point
  at actual chunk boundaries (the fields real readers seek by)."""
  import struct

  rng = np.random.default_rng(5)
  path = str(tmp_path / 'links.riegeli')
  rn.write_riegeli_records(
      path,
      [rng.bytes(3000) for _ in range(60)],
      compression='uncompressed',
      chunk_target_bytes=16000,
  )
  with open(path, 'rb') as f:
    buf = f.read()
  assert len(buf) > 2 * rn.BLOCK_SIZE
  # Recover true boundaries by walking the chunk stream.
  boundaries = []
  pos = 0
  while pos < len(buf):
    boundary = pos  # a chunk starting right after a block header has its
    pos = rn._skip_block_header(pos)  # boundary AT the header position.
    if pos >= len(buf):
      break
    boundaries.append(boundary)
    header, after = rn._logical_read(buf, pos, rn.CHUNK_HEADER_SIZE)
    data_size = struct.unpack('<Q', header[8:16])[0]
    _, pos = rn._logical_read(buf, after, data_size)
  ends = boundaries + [len(buf)]
  for block in range(0, len(buf), rn.BLOCK_SIZE):
    _, prev, nxt = struct.unpack('<QQQ', buf[block:block + 24])
    assert prev == block - max(b for b in boundaries if b <= block)
    assert nxt == min(e for e in ends if e > block) - block


def test_explicit_compression_missing_lib_errors(tmp_path, monkeypatch):
  """An explicitly requested compression whose system library is absent
  fails with a precise message, never a TypeError or a silent
  uncompressed downgrade."""
  monkeypatch.setitem(
      rn._COMPRESSORS, rn.COMPRESSION_SNAPPY, lambda data: None
  )
  with pytest.raises(RuntimeError, match='snappy'):
    rn.write_riegeli_records(
        str(tmp_path / 'x.riegeli'), [b'x'], compression='snappy'
    )


def test_truncated_inside_block_header(tmp_path):
  """A file cut mid block-header raises RiegeliFormatError (the module's
  documented error type), not a bare struct.error."""
  rng = np.random.default_rng(11)
  payloads = [rng.bytes(3000) for _ in range(100)]
  path = str(tmp_path / 'big.riegeli')
  rn.write_riegeli_records(
      path, payloads, compression='uncompressed', chunk_target_bytes=10**9
  )
  buf = open(path, 'rb').read()
  assert len(buf) > rn.BLOCK_SIZE
  cut = str(tmp_path / 'cut.riegeli')
  with open(cut, 'wb') as f:
    f.write(buf[:rn.BLOCK_SIZE + 4])  # 4 bytes into the 2nd block header
  with pytest.raises(rn.RiegeliFormatError, match='truncated block header'):
    rn.read_riegeli_records(cut)


def _write_raw_chunks(path, chunks):
  """Assembles a riegeli stream from pre-built chunks (writer internals)."""
  with open(path, 'wb') as f:
    pos = 0
    for chunk in chunks:
      pos = rn._emit_chunk(f, pos, chunk)


def test_unknown_chunk_type_is_unsupported_not_corrupt(tmp_path):
  """A structurally-valid chunk of a type this decoder doesn't implement
  (e.g. from a newer writer) must raise RiegeliUnsupportedError — the
  NotImplementedError taxonomy records._read_riegeli routes to the
  optional riegeli package — not RiegeliFormatError ('corrupt')."""
  path = str(tmp_path / 'future_chunk.riegeli')
  _write_raw_chunks(path, [
      rn._chunk_bytes(rn.CHUNK_SIGNATURE, b'', 0, 0),
      rn._chunk_bytes(0x77, b'payload-of-a-future-chunk-kind', 1, 30),
  ])
  with pytest.raises(rn.RiegeliUnsupportedError, match='chunk type 0x77'):
    rn.read_riegeli_records(path)


def test_unknown_compression_code_is_unsupported_not_corrupt(tmp_path):
  """Same taxonomy for an unknown compression byte inside a simple chunk
  (all hashes valid, so the file is not corrupt — just unsupported)."""
  # Simple-chunk layout: compression byte, varint sizes_len, sizes, values.
  data = bytes([0x99]) + bytes([1]) + bytes([3]) + b'abc'
  path = str(tmp_path / 'future_comp.riegeli')
  _write_raw_chunks(path, [
      rn._chunk_bytes(rn.CHUNK_SIGNATURE, b'', 0, 0),
      rn._chunk_bytes(rn.CHUNK_SIMPLE, data, 1, 3),
  ])
  with pytest.raises(
      rn.RiegeliUnsupportedError, match='compression type 0x99'
  ):
    rn.read_riegeli_records(path)


def test_missing_decompression_lib_falls_back_to_package(
    tmp_path, monkeypatch
):
  """A compressed file in an environment without the system codec raises
  RiegeliUnsupportedError natively, and records.read_records routes that
  to the optional riegeli package (which bundles its own codecs)."""
  _require_compressor('zstd')
  from putting_dune_tpu.io import records as records_lib

  rng = np.random.default_rng(12)
  payloads = [rng.bytes(200) for _ in range(5)]
  path = str(tmp_path / 'z.riegeli')
  rn.write_riegeli_records(path, payloads, compression='zstd')

  # Simulate the codec-less environment: every dlopen fails.
  monkeypatch.setattr(rn, '_load', lambda names: None)
  with pytest.raises(rn.RiegeliUnsupportedError, match='libzstd'):
    rn.read_riegeli_records(path)

  # No riegeli package either: the unsupported error propagates.
  monkeypatch.setattr(records_lib, '_riegeli_module', lambda: None)
  with pytest.raises(NotImplementedError, match='libzstd'):
    records_lib._read_riegeli(path)

  # With the package present, its RecordReader serves the payloads.
  class _FakeReader:
    def __init__(self, f):
      del f

    def __enter__(self):
      return self

    def __exit__(self, *exc):
      return False

    def read_records(self):
      return iter(payloads)

  class _FakeRiegeli:
    RecordReader = _FakeReader

  monkeypatch.setattr(
      records_lib, '_riegeli_module', lambda: _FakeRiegeli
  )
  assert records_lib._read_riegeli(path) == payloads


def test_corruption_detected(tmp_path):
  _require_compressor('zstd')
  rng = np.random.default_rng(6)
  payloads = [rng.bytes(200) for _ in range(20)]
  path = str(tmp_path / 'c.riegeli')
  rn.write_riegeli_records(path, payloads, compression='zstd')
  buf = bytearray(open(path, 'rb').read())
  buf[len(buf) // 2] ^= 0xFF
  bad = str(tmp_path / 'bad.riegeli')
  with open(bad, 'wb') as f:
    f.write(bytes(buf))
  with pytest.raises(rn.RiegeliFormatError, match='hash mismatch'):
    rn.read_riegeli_records(bad, verify=True)


def test_write_records_riegeli_dispatch(tmp_path):
  """records.write_records('.riegeli') works with no riegeli package:
  Trajectory protos round-trip through a natively-written file."""
  import datetime as dt

  from putting_dune_tpu import microscope_data as md

  obs = md.MicroscopeObservation(
      grid=md.AtomicGrid(
          np.asarray([[0.0, 0.0], [1.42, 0.0]]), np.asarray([6, 14])
      ),
      fov=md.MicroscopeFieldOfView(
          np.asarray([0.0, 0.0]), np.asarray([20.0, 20.0])
      ),
      controls=(),
      elapsed_time=dt.timedelta(seconds=3.0),
  )
  traj = md.Trajectory(observations=[obs, obs])
  path = str(tmp_path / 'traj.riegeli')
  records_lib.write_records(path, [traj])
  back = records_lib.read_records(path, md.Trajectory)
  assert len(back) == 1
  assert len(back[0].observations) == 2
  np.testing.assert_array_equal(
      back[0].observations[0].grid.atomic_numbers, [6, 14]
  )
