"""Native riegeli/records reader — no `riegeli` package required.

The reference's microscope dumps are riegeli files written with default
`riegeli.RecordWriter` options (brotli-compressed simple chunks;
/root/reference/putting_dune/pipeline/upload_microscope_data.py:223-244).
This module parses the public riegeli file format directly:

  * the file is divided into 64 KiB blocks, each beginning with a 24-byte
    block header (header_hash u64, previous_chunk u64, next_chunk u64)
    that INTERRUPTS whatever chunk bytes span the boundary;
  * chunks are back-to-back: a 40-byte chunk header (header_hash u64,
    data_size u64, data_hash u64, chunk_type u8, num_records u56 LE,
    decoded_data_size u64) followed by data_size bytes of chunk data;
  * simple chunks (type 'r') hold records as: compression byte
    (0 none / 'b' brotli / 'z' zstd / 's' snappy), varint length of the
    compressed-sizes block, the sizes block (varint record sizes), then
    the concatenated record values. Compressed blocks are framed as
    varint(uncompressed_size) + raw compressed stream, sizes and values
    compressed independently;
  * signature ('s'), file-metadata ('m') and padding ('p') chunks carry
    no records.

The layout above was validated byte-for-byte against files produced by
the real riegeli C++ writer (via the array_record package, which embeds
it) in uncompressed and brotli modes — see tests/test_riegeli_native.py.

Deliberate limits (each fails loudly):
  * chunk hashes are HighwayHash — not available here, so header/data
    hashes are NOT verified (structure and sizes are);
  * transposed chunks (type 't'; non-default RecordWriter transpose=true)
    are not decoded.
Decompression uses the system libbrotlidec / libzstd / libsnappy via
ctypes; a missing library fails with a precise message.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
from typing import List, Tuple

BLOCK_SIZE = 1 << 16
BLOCK_HEADER_SIZE = 24
CHUNK_HEADER_SIZE = 40

# Chunk types (riegeli chunk.h).
CHUNK_SIGNATURE = 0x73  # 's'
CHUNK_FILE_METADATA = 0x6D  # 'm'
CHUNK_PADDING = 0x70  # 'p'
CHUNK_SIMPLE = 0x72  # 'r'
CHUNK_TRANSPOSED = 0x74  # 't'

COMPRESSION_NONE = 0x00
COMPRESSION_BROTLI = 0x62  # 'b'
COMPRESSION_ZSTD = 0x7A  # 'z'
COMPRESSION_SNAPPY = 0x73  # 's'


class RiegeliFormatError(ValueError):
  """The bytes do not parse as a riegeli/records file."""


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
  result = 0
  shift = 0
  while True:
    if pos >= len(data):
      raise RiegeliFormatError('truncated varint')
    byte = data[pos]
    pos += 1
    result |= (byte & 0x7F) << shift
    if not byte & 0x80:
      return result, pos
    shift += 7
    if shift > 63:
      raise RiegeliFormatError('varint too long')


# --- system decompressors via ctypes ------------------------------------------


def _load(names):
  for name in names:
    try:
      return ctypes.CDLL(name)
    except OSError:
      continue
  return None


def _brotli_decompress(data: bytes, decoded_size: int) -> bytes:
  lib = _load(['libbrotlidec.so.1', 'libbrotlidec.so'])
  if lib is None:
    raise RiegeliFormatError(
        'brotli-compressed riegeli chunk but libbrotlidec is unavailable'
    )
  lib.BrotliDecoderDecompress.argtypes = [
      ctypes.c_size_t,
      ctypes.c_char_p,
      ctypes.POINTER(ctypes.c_size_t),
      ctypes.c_char_p,
  ]
  lib.BrotliDecoderDecompress.restype = ctypes.c_int
  out = ctypes.create_string_buffer(max(decoded_size, 1))
  out_size = ctypes.c_size_t(decoded_size)
  # BROTLI_DECODER_RESULT_SUCCESS == 1.
  rc = lib.BrotliDecoderDecompress(
      len(data), data, ctypes.byref(out_size), out
  )
  if rc != 1 or out_size.value != decoded_size:
    raise RiegeliFormatError(
        f'brotli decompression failed (rc={rc}, got {out_size.value}, '
        f'want {decoded_size})'
    )
  return out.raw[:decoded_size]


def _zstd_decompress(data: bytes, decoded_size: int) -> bytes:
  lib = _load(['libzstd.so.1', 'libzstd.so'])
  if lib is None:
    raise RiegeliFormatError(
        'zstd-compressed riegeli chunk but libzstd is unavailable'
    )
  lib.ZSTD_decompress.argtypes = [
      ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t
  ]
  lib.ZSTD_decompress.restype = ctypes.c_size_t
  lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
  lib.ZSTD_isError.restype = ctypes.c_uint
  out = ctypes.create_string_buffer(max(decoded_size, 1))
  rc = lib.ZSTD_decompress(out, decoded_size, data, len(data))
  if lib.ZSTD_isError(rc) or rc != decoded_size:
    raise RiegeliFormatError(
        f'zstd decompression failed (rc={rc}, want {decoded_size})'
    )
  return out.raw[:decoded_size]


def _snappy_decompress(data: bytes, decoded_size: int) -> bytes:
  lib = _load(['libsnappy.so.1', 'libsnappy.so'])
  if lib is None:
    raise RiegeliFormatError(
        'snappy-compressed riegeli chunk but libsnappy is unavailable'
    )
  lib.snappy_uncompress.argtypes = [
      ctypes.c_char_p,
      ctypes.c_size_t,
      ctypes.c_char_p,
      ctypes.POINTER(ctypes.c_size_t),
  ]
  lib.snappy_uncompress.restype = ctypes.c_int
  out = ctypes.create_string_buffer(max(decoded_size, 1))
  out_size = ctypes.c_size_t(decoded_size)
  rc = lib.snappy_uncompress(data, len(data), out, ctypes.byref(out_size))
  if rc != 0 or out_size.value != decoded_size:
    raise RiegeliFormatError(f'snappy decompression failed (rc={rc})')
  return out.raw[:decoded_size]


def _decompress_block(
    compression: int, data: bytes, pos: int, end: int
) -> Tuple[bytes, int]:
  """Decodes one compressed block: varint(uncompressed size) + stream.

  Returns (decompressed bytes, new position). With COMPRESSION_NONE the
  block is raw and `end` bounds it.
  """
  if compression == COMPRESSION_NONE:
    return data[pos:end], end
  size, pos = _read_varint(data, pos)
  payload = data[pos:end]
  if compression == COMPRESSION_BROTLI:
    return _brotli_decompress(payload, size), end
  if compression == COMPRESSION_ZSTD:
    return _zstd_decompress(payload, size), end
  if compression == COMPRESSION_SNAPPY:
    return _snappy_decompress(payload, size), end
  raise RiegeliFormatError(f'unknown compression type 0x{compression:02x}')


# --- block-aware logical reads -------------------------------------------------


def _skip_block_header(pos: int) -> int:
  """Block headers sit at every multiple of BLOCK_SIZE."""
  if pos % BLOCK_SIZE == 0:
    return pos + BLOCK_HEADER_SIZE
  return pos


def _logical_read(buf: bytes, pos: int, n: int) -> Tuple[bytes, int]:
  """Reads n logical bytes starting at pos, skipping block headers."""
  out = bytearray()
  while len(out) < n:
    pos = _skip_block_header(pos)
    take = min(n - len(out), BLOCK_SIZE - pos % BLOCK_SIZE)
    piece = buf[pos:pos + take]
    if len(piece) < take:
      raise RiegeliFormatError(
          f'truncated file: wanted {n} bytes at {pos}, hit EOF'
      )
    out += piece
    pos += take
  return bytes(out), pos


def _decode_simple_chunk(
    data: bytes, num_records: int, decoded_data_size: int
) -> List[bytes]:
  """Decodes a simple chunk's data into its records (chunk type 'r')."""
  if not data:
    raise RiegeliFormatError('empty simple chunk')
  compression = data[0]
  sizes_len, pos = _read_varint(data, 1)
  sizes_block, pos = _decompress_block(
      compression, data, pos, pos + sizes_len
  )
  values, _ = _decompress_block(compression, data, pos, len(data))
  if len(values) != decoded_data_size:
    raise RiegeliFormatError(
        f'decoded values size {len(values)} != header '
        f'decoded_data_size {decoded_data_size}'
    )
  records = []
  spos = 0
  vpos = 0
  for _ in range(num_records):
    size, spos = _read_varint(sizes_block, spos)
    records.append(values[vpos:vpos + size])
    vpos += size
  if vpos != len(values):
    raise RiegeliFormatError(
        f'record sizes sum {vpos} != values size {len(values)}'
    )
  return records


def read_riegeli_records(path: str) -> List[bytes]:
  """Reads every record from a riegeli/records file.

  Parses the chunk stream sequentially from offset 0. Signature,
  file-metadata and padding chunks are skipped; simple chunks are
  decoded; transposed chunks raise NotImplementedError (re-write with
  RecordWriter transpose=false, or install the optional riegeli
  package). Chunk hashes are not verified (HighwayHash unavailable).
  """
  with open(path, 'rb') as f:
    buf = f.read()
  if len(buf) < BLOCK_HEADER_SIZE + CHUNK_HEADER_SIZE:
    raise RiegeliFormatError(f'{path}: too short to be a riegeli file')

  records: List[bytes] = []
  pos = 0
  first = True
  while pos < len(buf):
    pos = _skip_block_header(pos)
    if pos >= len(buf):
      break
    header, data_start = _logical_read(buf, pos, CHUNK_HEADER_SIZE)
    (_, data_size, _) = struct.unpack('<QQQ', header[:24])
    chunk_type = header[24]
    num_records = int.from_bytes(header[25:32], 'little')
    decoded_data_size = struct.unpack('<Q', header[32:40])[0]

    if first:
      if chunk_type != CHUNK_SIGNATURE or data_size != 0:
        raise RiegeliFormatError(
            f'{path}: missing riegeli file-signature chunk '
            f'(type=0x{chunk_type:02x}, data_size={data_size})'
        )
      first = False

    data, pos = _logical_read(buf, data_start, data_size)
    if chunk_type == CHUNK_SIMPLE:
      records.extend(
          _decode_simple_chunk(data, num_records, decoded_data_size)
      )
    elif chunk_type == CHUNK_TRANSPOSED:
      raise NotImplementedError(
          f'{path}: transposed riegeli chunk (RecordWriter '
          'transpose=true) — not decodable natively; install the '
          'optional riegeli package or re-write with transpose=false.'
      )
    elif chunk_type in (
        CHUNK_SIGNATURE, CHUNK_FILE_METADATA, CHUNK_PADDING
    ):
      pass
    else:
      raise RiegeliFormatError(
          f'{path}: unknown chunk type 0x{chunk_type:02x} at {data_start}'
      )
  return records
