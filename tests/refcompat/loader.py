"""Loads the ACTUAL reference package for head-to-head parity tests.

Usage (tests):

    ref = loader.load_reference()   # raises ReferenceUnavailable if not
    graphene = ref.module('graphene')

Mechanics:
  1. shims.install_missing_shims() covers shapely / frozendict /
     msgpack_numpy / skimage if they are not pip-installed.
  2. The reference's putting_dune.proto is compiled with the in-box protoc
     into a cache dir, using a stub tensorflow/core/framework/tensor.proto
     for compile-time name resolution; the GENERATED module imports the
     REAL tensorflow.core.framework.tensor_pb2, so TensorProto fields are
     fully functional at runtime.
  3. /root/reference goes on sys.path and the generated module is
     pre-seeded as putting_dune.putting_dune_pb2 (the reference repo ships
     no compiled proto — its CI generates one, mirrored here).
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile

from . import shims

REFERENCE_ROOT = '/root/reference'


class ReferenceUnavailable(Exception):
  """The reference tree or one of its hard deps is not present."""


_cached = None


class Reference:

  def __init__(self, package):
    self.package = package

  def module(self, name: str):
    return importlib.import_module(f'putting_dune.{name}')


def _compile_reference_proto(cache_dir: pathlib.Path) -> pathlib.Path:
  """protoc-compiles the reference schema; returns the generated .py."""
  out = cache_dir / 'putting_dune' / 'putting_dune_pb2.py'
  src = pathlib.Path(REFERENCE_ROOT) / 'putting_dune' / 'putting_dune.proto'
  if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
    return out
  protoc = shutil.which('protoc')
  if protoc is None:
    raise ReferenceUnavailable('protoc is not installed')
  stub_root = pathlib.Path(__file__).parent / 'tf_stub'
  with tempfile.TemporaryDirectory() as staging:
    staging = pathlib.Path(staging)
    (staging / 'putting_dune').mkdir()
    shutil.copy(src, staging / 'putting_dune' / 'putting_dune.proto')
    cache_dir.mkdir(parents=True, exist_ok=True)
    result = subprocess.run(
        [
            protoc,
            f'--proto_path={staging}',
            f'--proto_path={stub_root}',
            f'--python_out={cache_dir}',
            'putting_dune/putting_dune.proto',
        ],
        capture_output=True,
        text=True,
    )
  if result.returncode != 0:
    raise ReferenceUnavailable(
        f'protoc failed on the reference schema: {result.stderr}'
    )
  return out


def load_reference() -> Reference:
  """Imports the reference putting_dune package (cached per process)."""
  global _cached
  if _cached is not None:
    return _cached
  if not os.path.isdir(os.path.join(REFERENCE_ROOT, 'putting_dune')):
    raise ReferenceUnavailable(f'{REFERENCE_ROOT} is not present')
  for dep in ('tensorflow', 'dm_env', 'sklearn', 'scipy', 'cv2'):
    try:
      importlib.import_module(dep)
    except ImportError as e:
      raise ReferenceUnavailable(f'reference hard dep {dep} missing: {e}')
  shims.install_missing_shims()

  # The REAL TF tensor descriptors must be registered before the generated
  # reference pb2 resolves its tensorflow/.../tensor.proto dependency.
  importlib.import_module('tensorflow.core.framework.tensor_pb2')

  cache_dir = pathlib.Path(tempfile.gettempdir()) / 'pd_refcompat_gen'
  pb2_path = _compile_reference_proto(cache_dir)

  if 'putting_dune.putting_dune_pb2' not in sys.modules:
    spec = importlib.util.spec_from_file_location(
        'putting_dune.putting_dune_pb2', pb2_path
    )
    pb2 = importlib.util.module_from_spec(spec)
    # Pre-seed BEFORE executing: the reference package resolves
    # `from putting_dune import putting_dune_pb2` through sys.modules.
    sys.modules['putting_dune.putting_dune_pb2'] = pb2
    try:
      spec.loader.exec_module(pb2)
    except Exception:
      del sys.modules['putting_dune.putting_dune_pb2']
      raise

  if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
  package = importlib.import_module('putting_dune')
  _cached = Reference(package)
  return _cached
