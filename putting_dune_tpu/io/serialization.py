"""msgpack numpy-array codecs.

The reference serializes GMM rate functions with msgpack_numpy
(reference graphene.py:392-427); that helper package is not available here,
so this module provides an equivalent self-contained codec: arrays are
encoded as {b'__ndarray__': True, dtype, shape, raw bytes}.
"""

from __future__ import annotations

import numpy as np

_KEY = '__ndarray__'


def msgpack_encode(obj):
  """msgpack `default=` hook encoding numpy arrays/scalars."""
  if isinstance(obj, np.ndarray):
    return {
        _KEY: True,
        'dtype': obj.dtype.str,
        'shape': list(obj.shape),
        'data': obj.tobytes(),
    }
  if isinstance(obj, np.generic):
    return obj.item()
  raise TypeError(f'Cannot msgpack-encode object of type {type(obj)}')


def msgpack_decode(obj):
  """msgpack `object_hook=` decoding arrays written by msgpack_encode."""
  key = _KEY if _KEY in obj else _KEY.encode()
  if isinstance(obj, dict) and obj.get(key):
    def get(name):
      return obj[name] if name in obj else obj[name.encode()]

    return np.frombuffer(get('data'), dtype=np.dtype(get('dtype'))).reshape(
        get('shape')
    )
  return obj
