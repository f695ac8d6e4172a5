"""Minimal API-faithful shims for the reference's missing pip deps.

Each shim implements exactly the surface the reference code touches
(verified by grep over /root/reference/putting_dune):

  * shapely.geometry.Point       — .x/.y/.coords (geometry.py:28)
  * frozendict                   — registry tables (experiments/registry.py)
  * msgpack_numpy                — GMM bundles (graphene.py:392-427), wire
                                   compatible with the real msgpack_numpy
                                   ndarray encoding over the real msgpack
  * skimage.util.random_noise,
    skimage.exposure.adjust_gamma,
    skimage.exposure.equalize_adapthist
                                 — imaging noise chain (imaging.py:176-264).
                                   random_noise/adjust_gamma re-implement the
                                   documented skimage semantics; CLAHE
                                   delegates to this repo's host
                                   implementation of skimage's algorithm
                                   (putting_dune_tpu/imaging/clahe.py), so
                                   the CLAHE stage is NOT independently
                                   verified by head-to-head runs — every
                                   stage upstream of it is.

Shims are only installed for module names that fail to import, so a
machine with the real packages tests against those instead.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np


def _make_shapely() -> types.ModuleType:
  class Point:
    """shapely.geometry.Point surface used by the reference: construction
    from (x, y), a 2-sequence, an ndarray or another Point; .x/.y/.coords."""

    __slots__ = ('_xy',)

    def __init__(self, *args):
      if len(args) == 1:
        a = args[0]
        if isinstance(a, Point):
          xy = a._xy
        else:
          xy = np.asarray(a, dtype=np.float64).reshape(-1)
      else:
        xy = np.asarray(args, dtype=np.float64).reshape(-1)
      if xy.shape != (2,):
        raise ValueError(f'Point expects 2 coordinates, got {xy!r}')
      self._xy = xy

    @property
    def x(self) -> float:
      return float(self._xy[0])

    @property
    def y(self) -> float:
      return float(self._xy[1])

    @property
    def coords(self):
      # np.asarray(point.coords) must give shape (1, 2) like shapely's
      # CoordinateSequence (graphene.py:371,620).
      return self._xy.reshape(1, 2).copy()

    def __array__(self, dtype=None, copy=None):
      # shapely 1.x Points convert to [x, y] under np.asarray (the
      # reference's tests rely on it).
      del copy
      return self._xy.astype(dtype) if dtype else self._xy.copy()

    def __repr__(self):
      return f'POINT ({self.x} {self.y})'

  shapely = types.ModuleType('shapely')
  geometry = types.ModuleType('shapely.geometry')
  geometry.Point = Point
  shapely.geometry = geometry
  sys.modules['shapely'] = shapely
  sys.modules['shapely.geometry'] = geometry
  return shapely


def _make_frozendict() -> types.ModuleType:
  class frozendict(dict):  # noqa: N801 (matches the pip package's name)
    def _immutable(self, *a, **k):
      raise TypeError('frozendict is immutable')

    __setitem__ = __delitem__ = _immutable
    pop = popitem = setdefault = update = clear = _immutable

    def __hash__(self):
      return hash(frozenset(self.items()))

  mod = types.ModuleType('frozendict')
  mod.frozendict = frozendict
  sys.modules['frozendict'] = mod
  return mod


def _make_msgpack_numpy() -> types.ModuleType:
  """Wire-compatible msgpack_numpy: ndarrays as the {b'nd', b'type',
  b'shape', b'data'} ext dict the real package uses."""
  import msgpack as _msgpack

  def encode(obj, chain=None):
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
    if isinstance(obj, (np.bool_, np.number)):
      return {
          b'nd': False,
          b'type': obj.dtype.str,
          b'data': obj.tobytes(),
      }
    return obj if chain is None else chain(obj)

  def decode(obj, chain=None):
    try:
      if b'nd' in obj:
        if obj[b'nd'] is True:
          return (
              np.frombuffer(obj[b'data'], dtype=np.dtype(obj[b'type']))
              .reshape(obj[b'shape'])
              .copy()
          )
        return np.frombuffer(obj[b'data'], dtype=np.dtype(obj[b'type']))[0]
    except (KeyError, TypeError):
      pass
    return obj if chain is None else chain(obj)

  def packb(o, **kwargs):
    return _msgpack.packb(o, default=encode, use_bin_type=True, **kwargs)

  def unpackb(packed, **kwargs):
    kwargs.setdefault('raw', False)
    kwargs.setdefault('strict_map_key', False)
    return _msgpack.unpackb(packed, object_hook=decode, **kwargs)

  mod = types.ModuleType('msgpack_numpy')
  mod.encode = encode
  mod.decode = decode
  mod.packb = packb
  mod.pack = lambda o, stream, **kw: stream.write(packb(o, **kw))
  mod.unpackb = unpackb
  sys.modules['msgpack_numpy'] = mod
  return mod


def _make_skimage() -> types.ModuleType:
  def _as_float(image):
    image = np.asarray(image)
    if image.dtype.kind == 'f':
      return image.astype(np.float64, copy=False)
    if image.dtype == np.uint8:
      return image.astype(np.float64) / 255.0
    return image.astype(np.float64)

  def random_noise(image, mode='gaussian', seed=None, clip=True, **kwargs):
    """skimage.util.random_noise semantics for the two modes the
    reference uses (imaging.py:179,209): float image, additive gaussian
    (mean/var) or salt&pepper (amount, 50/50 split), output clipped to
    [low, 1] where low is -1 for signed inputs else 0."""
    image = _as_float(image)
    rng = np.random.default_rng(seed)
    low_clip = -1.0 if image.min() < 0 else 0.0
    if mode == 'gaussian':
      mean = kwargs.get('mean', 0.0)
      var = kwargs.get('var', 0.01)
      out = image + rng.normal(mean, var ** 0.5, image.shape)
    elif mode == 's&p':
      amount = kwargs.get('amount', 0.05)
      salt_vs_pepper = kwargs.get('salt_vs_pepper', 0.5)
      out = image.copy()
      flipped = rng.random(image.shape) <= amount
      salted = rng.random(image.shape) <= salt_vs_pepper
      out[flipped & salted] = 1.0
      out[flipped & ~salted] = low_clip
    else:
      raise NotImplementedError(f'random_noise mode {mode!r} (shim)')
    if clip:
      out = np.clip(out, low_clip, 1.0)
    return out

  def adjust_gamma(image, gamma=1.0, gain=1.0):
    image = _as_float(image)
    if (image < 0).any():
      raise ValueError('adjust_gamma requires non-negative input')
    return (image ** gamma) * gain

  def equalize_adapthist(image, kernel_size=None, clip_limit=0.01,
                         nbins=256):
    # Same algorithm re-implemented in this repo (host numpy/jax path);
    # see module docstring for the verification caveat.
    import jax
    from putting_dune_tpu.imaging import clahe as clahe_lib

    image = np.asarray(image, np.float32)
    if image.ndim != 2:
      raise NotImplementedError('shim CLAHE handles 2-D frames')
    if kernel_size is not None:
      raise NotImplementedError('shim CLAHE uses the default 1/8 kernel')
    with jax.default_device(jax.devices('cpu')[0]):
      out = clahe_lib.equalize_adapthist_padded(
          image[None], clip_limit=clip_limit, nbins=nbins, backend='xla'
      )
    return np.asarray(out[0], np.float64)

  skimage = types.ModuleType('skimage')
  util = types.ModuleType('skimage.util')
  exposure = types.ModuleType('skimage.exposure')
  util.random_noise = random_noise
  exposure.adjust_gamma = adjust_gamma
  exposure.equalize_adapthist = equalize_adapthist
  skimage.util = util
  skimage.exposure = exposure
  sys.modules['skimage'] = skimage
  sys.modules['skimage.util'] = util
  sys.modules['skimage.exposure'] = exposure
  return skimage


_FACTORIES = {
    'shapely': _make_shapely,
    'frozendict': _make_frozendict,
    'msgpack_numpy': _make_msgpack_numpy,
    'skimage': _make_skimage,
}


def install_missing_shims() -> list:
  """Installs shims for reference deps that are not pip-installed.

  Returns the list of module names that were shimmed (empty if the real
  packages are all present).
  """
  shimmed = []
  for name, factory in _FACTORIES.items():
    try:
      importlib.import_module(name)
    except ImportError:
      factory()
      shimmed.append(name)
  return shimmed
