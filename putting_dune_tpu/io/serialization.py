"""msgpack numpy-array codecs, wire-compatible with msgpack_numpy.

The reference serializes GMM rate functions with msgpack_numpy
(reference graphene.py:392-427). This self-contained codec emits the SAME
on-wire layout that package uses — ndarrays as
{b'nd': True, b'type': dtype.str, b'kind': b'', b'shape': [...],
b'data': raw bytes} — so bundles interoperate byte-for-byte with
reference-written artifacts in both directions. Decoding additionally
accepts the legacy {'__ndarray__': ...} layout this repo wrote before
round 4, so earlier artifacts keep loading.
"""

from __future__ import annotations

import numpy as np

_LEGACY_KEY = '__ndarray__'


def msgpack_encode(obj):
  """msgpack `default=` hook encoding numpy arrays/scalars
  (msgpack_numpy-compatible layout)."""
  if isinstance(obj, np.ndarray):
    if obj.dtype.kind == 'O':
      raise TypeError('object arrays are not msgpack-serializable')
    return {
        b'nd': True,
        b'type': obj.dtype.str,
        b'kind': b'',
        b'shape': list(obj.shape),
        b'data': np.ascontiguousarray(obj).tobytes(),
    }
  if isinstance(obj, np.generic):
    return obj.item()
  raise TypeError(f'Cannot msgpack-encode object of type {type(obj)}')


def _get(obj, name):
  if name in obj:
    return obj[name]
  alt = name.decode() if isinstance(name, bytes) else name.encode()
  return obj[alt]


def msgpack_decode(obj):
  """msgpack `object_hook=` decoding msgpack_numpy-layout arrays (and the
  pre-round-4 legacy '__ndarray__' layout)."""
  if not isinstance(obj, dict):
    return obj
  try:
    if _get(obj, b'nd') is True:
      return (
          np.frombuffer(_get(obj, b'data'), dtype=np.dtype(_get(obj, b'type')))
          .reshape(_get(obj, b'shape'))
          .copy()
      )
    if _get(obj, b'nd') is False:  # msgpack_numpy scalar form
      return np.frombuffer(
          _get(obj, b'data'), dtype=np.dtype(_get(obj, b'type'))
      )[0]
  except KeyError:
    pass
  try:
    if _get(obj, _LEGACY_KEY):
      return np.frombuffer(
          _get(obj, 'data'), dtype=np.dtype(_get(obj, 'dtype'))
      ).reshape(_get(obj, 'shape'))
  except KeyError:
    pass
  return obj
