"""Record IO: TFRecord-format readers/writers with a native C++ fast path.

Parity: /root/reference/putting_dune/io.py:45-83 (extension-dispatched
read_records/write_records over serialized protos). The reference routes
through TensorFlow's TFRecord IO; here the wire format (8-byte LE length +
masked crc32c framing) is implemented natively in C++
(native/tfrecord.cc, loaded via ctypes) with a pure-Python fallback, so
records interoperate with any TFRecord tooling without a TF dependency.
Supported extensions: .tfrecords (TFRecord) and .mpk (length-prefixed
msgpack-free raw framing is NOT used — msgpack files hold a list of
records).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterable, Iterator, List, Optional, Sequence, Type, TypeVar

T = TypeVar('T')

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), 'native'
)
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libpdtfrecord.so')
_lib = None
_load_attempted = False


def _load_native():
  """Loads (building/refreshing if necessary) the native codec.

  Invokes make ONCE per process (a no-op when the .so is newer than its
  sources) so source updates rebuild stale prebuilt libraries; the build
  is serialized across processes with an advisory lock (run_tests.py -j N
  spawns fresh interpreters — two unsynchronized g++ runs writing the
  shared .so would corrupt it; the Makefile also renames into place so
  readers never see a partial file). Returns None when no toolchain and
  no prebuilt .so exist; the doomed-build case is not retried on every
  call.
  """
  global _lib, _load_attempted
  if _load_attempted:
    return _lib
  _load_attempted = True
  if os.path.exists(os.path.join(_NATIVE_DIR, 'tfrecord.cc')):
    try:
      import fcntl

      with open(os.path.join(_NATIVE_DIR, '.build.lock'), 'w') as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        subprocess.run(
            ['make', '-C', _NATIVE_DIR], check=True, capture_output=True
        )
    except Exception:  # pylint: disable=broad-except
      pass  # fall through: a prebuilt .so may still be loadable.
  if not os.path.exists(_LIB_PATH):
    return None
  try:
    lib = ctypes.CDLL(_LIB_PATH)
  except OSError:
    return None
  lib.pd_tfrecord_write.argtypes = [
      ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int
  ]
  lib.pd_tfrecord_write.restype = ctypes.c_int
  lib.pd_tfrecord_scan.argtypes = [
      ctypes.c_char_p,
      ctypes.POINTER(ctypes.c_uint64),
      ctypes.POINTER(ctypes.c_uint64),
  ]
  lib.pd_tfrecord_scan.restype = ctypes.c_int
  lib.pd_tfrecord_read.argtypes = [
      ctypes.c_char_p,
      ctypes.c_char_p,
      ctypes.POINTER(ctypes.c_uint64),
      ctypes.c_uint64,
      ctypes.c_int,
  ]
  lib.pd_tfrecord_read.restype = ctypes.c_int
  if hasattr(lib, 'pd_highwayhash64'):  # riegeli hash (newer builds).
    lib.pd_highwayhash64.argtypes = [
        ctypes.POINTER(ctypes.c_uint64 * 4),
        ctypes.c_char_p,
        ctypes.c_uint64,
    ]
    lib.pd_highwayhash64.restype = ctypes.c_uint64
  _lib = lib
  return lib


# --- pure-python framing fallback --------------------------------------------


def _crc32c_py(data: bytes) -> int:
  import google_crc32c

  return google_crc32c.value(data)


def _mask(crc: int) -> int:
  return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _write_tfrecords_py(path: str, payloads: Iterable[bytes]) -> None:
  with open(path, 'wb') as f:
    for payload in payloads:
      length = struct.pack('<Q', len(payload))
      f.write(length)
      f.write(struct.pack('<I', _mask(_crc32c_py(length))))
      f.write(payload)
      f.write(struct.pack('<I', _mask(_crc32c_py(payload))))


def _read_tfrecords_py(path: str) -> Iterator[bytes]:
  with open(path, 'rb') as f:
    while True:
      header = f.read(12)
      if len(header) < 12:
        return
      (length,) = struct.unpack('<Q', header[:8])
      payload = f.read(length)
      f.read(4)  # payload crc (unchecked in the fallback)
      yield payload


# --- public API ---------------------------------------------------------------


def write_tfrecords(path: str, payloads: Sequence[bytes]) -> None:
  """Writes serialized records in TFRecord format (native if available)."""
  lib = _load_native()
  if lib is None:
    _write_tfrecords_py(path, payloads)
    return
  first = True
  for payload in payloads:
    rc = lib.pd_tfrecord_write(
        path.encode(), payload, len(payload), 0 if first else 1
    )
    if rc != 0:
      raise IOError(f'native tfrecord write failed (rc={rc}) for {path}')
    first = False
  if first:  # no records: still truncate/create the file
    open(path, 'wb').close()


def count_tfrecords(path: str) -> int:
  """Counts records without copying payloads (native header scan)."""
  lib = _load_native()
  if lib is None:
    return sum(1 for _ in _read_tfrecords_py(path))
  num = ctypes.c_uint64()
  total = ctypes.c_uint64()
  rc = lib.pd_tfrecord_scan(path.encode(), ctypes.byref(num),
                            ctypes.byref(total))
  if rc != 0:
    raise IOError(f'native tfrecord scan failed (rc={rc}) for {path}')
  return int(num.value)


def read_tfrecords(path: str, verify_crc: bool = True) -> List[bytes]:
  """Reads all records from a TFRecord file (native if available)."""
  lib = _load_native()
  if lib is None:
    return list(_read_tfrecords_py(path))
  num = ctypes.c_uint64()
  total = ctypes.c_uint64()
  rc = lib.pd_tfrecord_scan(path.encode(), ctypes.byref(num),
                            ctypes.byref(total))
  if rc != 0:
    raise IOError(f'native tfrecord scan failed (rc={rc}) for {path}')
  buf = ctypes.create_string_buffer(max(int(total.value), 1))
  offsets = (ctypes.c_uint64 * (num.value + 1))()
  rc = lib.pd_tfrecord_read(
      path.encode(), buf, offsets, num.value, 1 if verify_crc else 0
  )
  if rc != 0:
    raise IOError(f'native tfrecord read failed (rc={rc}) for {path}')
  raw = buf.raw
  return [
      raw[offsets[i]:offsets[i + 1]] for i in range(num.value)
  ]


def write_records(path: str, records: Sequence) -> None:
  """Serializes proto-model records to a file, extension-dispatched.

  Parity: reference io.py:45-62. Records must expose .to_proto() (host
  dataclasses from microscope_data) or already be proto messages / bytes.
  """
  payloads = []
  for r in records:
    if isinstance(r, bytes):
      payloads.append(r)
    elif hasattr(r, 'to_proto'):
      payloads.append(r.to_proto().SerializeToString())
    elif hasattr(r, 'SerializeToString'):
      payloads.append(r.SerializeToString())
    else:
      raise TypeError(f'Cannot serialize record of type {type(r)}')
  ext = os.path.splitext(path)[1]
  if ext in ('.tfrecords', '.tfrecord'):
    write_tfrecords(path, payloads)
  elif ext == '.riegeli':
    _write_riegeli(path, payloads)
  else:
    raise ValueError(f'Unsupported record extension: {ext}')


def read_records(path: str, record_cls: Optional[Type[T]] = None) -> List:
  """Reads records; decodes via record_cls.from_proto_bytes if given.

  Parity: reference io.py:64-83.
  """
  ext = os.path.splitext(path)[1]
  if ext in ('.tfrecords', '.tfrecord'):
    payloads = read_tfrecords(path)
  elif ext == '.riegeli':
    payloads = _read_riegeli(path)
  else:
    raise ValueError(f'Unsupported record extension: {ext}')
  if record_cls is None:
    return payloads
  return [record_cls.from_proto_bytes(p) for p in payloads]


# --- riegeli interop ----------------------------------------------------------
#
# The reference's upload pipeline writes riegeli records
# (upload_microscope_data.py:32,223-244; default RecordWriter options =
# brotli-compressed simple chunks). Both directions are native here:
#   * READING: io/riegeli_native.py parses the public chunk/block format
#     directly with system-library decompression (brotli/zstd/snappy/
#     none), verifies every HighwayHash, and decodes BOTH simple and
#     transposed chunks. The optional riegeli package is only consulted
#     for constructs the native decoder rejects as unsupported
#     (deprecated proto group wiretypes inside transposed chunks).
#   * WRITING: io/riegeli_native.write_riegeli_records emits
#     signature + simple chunks with real HighwayHash digests (native
#     C++ hash, validated against the reference implementation) —
#     files real riegeli readers accept; no riegeli package needed.


def _riegeli_module():
  try:
    import riegeli  # pytype: disable=import-error
    return riegeli
  except ImportError:
    return None


def _read_riegeli(path: str) -> List[bytes]:
  from putting_dune_tpu.io import riegeli_native

  try:
    return riegeli_native.read_riegeli_records(path)
  except NotImplementedError:
    # RiegeliUnsupportedError: the file is valid but THIS environment
    # cannot decode it natively (missing system decompression library,
    # or deprecated proto group wiretypes in transposed chunks) — try
    # the real package, which bundles its own codecs.
    riegeli = _riegeli_module()
    if riegeli is None:
      raise
    with open(path, 'rb') as f:
      with riegeli.RecordReader(f) as reader:
        return list(reader.read_records())


def _write_riegeli(path: str, payloads: Sequence[bytes]) -> None:
  from putting_dune_tpu.io import riegeli_native

  riegeli_native.write_riegeli_records(path, payloads)
