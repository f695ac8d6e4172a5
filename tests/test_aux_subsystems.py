"""Tests: observers, test_utils fixtures, profiling, ORNL import, videos."""

import datetime as dt
import io
import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import simulator_observers
from putting_dune_tpu import structures
from putting_dune_tpu import test_utils
from putting_dune_tpu.utils import profiling


def test_event_observer_records_stream():
  lattice = lattice_lib.make_lattice(20)
  config = simulator_lib.SimulatorConfig(grid_columns=20)
  observer = simulator_observers.EventObserver()

  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(0), lattice, config=config, batch_size=1
  )
  observer.record_reset(state, obs)

  control = structures.BeamControl(
      position=jnp.full((1, 2), 0.5), dwell_seconds=jnp.full((1,), 10.0)
  )

  def high_rates(si_pos, neighbor_pos, beam_pos):
    del neighbor_pos, beam_pos
    return jnp.full(si_pos.shape[:-1] + (3,), 5.0)

  state, obs, result = simulator_lib.step(
      state, jax.random.PRNGKey(1), control, lattice, high_rates,
      config=config, record_events=8,
  )
  observer.record_step(state, obs, result, control=control)

  types = [e.event_type for e in observer.events]
  assert simulator_observers.SimulatorEventType.RESET in types
  assert simulator_observers.SimulatorEventType.APPLY_CONTROL in types
  assert simulator_observers.SimulatorEventType.TAKE_IMAGE in types
  transitions = [
      e for e in observer.events
      if e.event_type == simulator_observers.SimulatorEventType.TRANSITION
  ]
  assert len(transitions) >= 1  # total rate 15/s over 10 s => many events
  assert transitions[0].data['time_since_control'] > 0


def test_test_utils_fixtures():
  env = test_utils.create_simple_environment(batch_size=2)
  state, ts = env.reset(jax.random.PRNGKey(0))
  assert ts.observation.shape == (2, 10)

  obs = test_utils.create_single_silicon_observation(seed=1)
  si = obs.grid.atomic_numbers == 14
  assert si.sum() == 1
  obs_img = test_utils.create_single_silicon_observation(
      seed=1, with_image=True, image_size=64
  )
  assert obs_img.image.shape == (64, 64)


def test_throughput_meter():
  meter = profiling.Throughput(warmup=1)
  for _ in range(5):
    meter.tick(items=10)
  assert meter.rate() > 0

  results = {}
  with profiling.timed('block', results):
    pass
  assert 'block' in results


def _write_ndata1(path, data, metadata=None):
  buf = io.BytesIO()
  np.save(buf, data)
  with zipfile.ZipFile(path, 'w') as zf:
    zf.writestr('data.npy', buf.getvalue())
    if metadata is not None:
      zf.writestr('metadata.json', json.dumps(metadata))


def test_import_microscope_data(tmp_path):
  from putting_dune_tpu.pipeline import import_microscope_data as imd

  n, h, w = 4, 32, 32
  rng = np.random.default_rng(0)
  images = rng.uniform(0, 1, (n, h, w, 1)).astype(np.float32)
  labels = np.zeros((n, 16, 16), np.uint8)

  metadata = {'metadata': {}}
  for t in range(n):
    coords = (rng.uniform(0, 16, (6, 2))).tolist()
    metadata['metadata'][str(t)] = {
        'ADF readouttime': 2.0,
        'All coordinates': {'0': coords},
        'All parameters': {'image_parameters': [2.0]},
        'Blast coordinates': {'Dopants': [coords[0]]},
        'Beam location': [coords[1]],
        'Beam dwelltime': 1.5,
        'ADF intensities': [[0.0, 0.0]],
        'Pixelshifts': [1, 0],
    }

  dataset = tmp_path / 'run1'
  dataset.mkdir()
  _write_ndata1(dataset / 'ADF-stack-000.ndata1', images)
  _write_ndata1(dataset / 'Label-stack-000.ndata1', labels, metadata)

  raw, coords, params = imd.load_dataset(dataset)
  assert raw.shape == (n, h, w, 1)
  trajectory = imd.convert_dataset(raw, coords, params)
  assert len(trajectory.observations) == n
  obs0 = trajectory.observations[0]
  assert obs0.image.shape == (h, w, 1)
  assert (obs0.grid.atomic_numbers == 14).sum() == 1  # dopant labeled
  assert len(obs0.controls) == 1
  assert obs0.controls[0].dwell_time == dt.timedelta(seconds=1.5)
  # Pixel shifts accumulate into the FOV.
  fov0 = trajectory.observations[0].fov
  fov1 = trajectory.observations[1].fov
  assert fov1.lower_left[0] > fov0.lower_left[0]


def test_eval_video_generation(tmp_path):
  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import run_helpers
  from putting_dune_tpu.experiments import registry

  exp = registry.create_eval_experiment('greedy_simple_rates')
  env = run_helpers.create_putting_dune_env(
      0, exp.get_adapters_and_goal, exp.get_simulator_config,
      grid_columns=20, simulator_step_limit=20,
  )
  agent = exp.get_agent(
      np.random.default_rng(0), exp.get_adapters_and_goal()
  )
  results = eval_lib.evaluate(
      agent, env, [0], video_save_dir=str(tmp_path)
  )
  assert len(results) == 1
  assert os.path.exists(str(tmp_path / '0.gif'))


def test_artifact_pack_unpack_roundtrip(tmp_path):
  """Model bundles: zip + sha256 manifest, corruption detected (native
  replacement for the reference's zipped-SavedModel transport,
  registry.py:94-108)."""
  import json
  import os
  import zipfile

  from putting_dune_tpu.io import artifacts

  src = tmp_path / 'my_model'
  (src / 'sub').mkdir(parents=True)
  (src / 'params.msgpack').write_bytes(b'\x01\x02' * 100)
  (src / 'meta.json').write_text('{"kind": "mlp"}')
  (src / 'sub' / 'extra.bin').write_bytes(b'xyz')

  archive = str(tmp_path / 'my_model.zip')
  manifest = artifacts.pack(str(src), archive)
  assert set(manifest['files']) == {
      'params.msgpack', 'meta.json', os.path.join('sub', 'extra.bin')
  }

  out = artifacts.unpack(archive, str(tmp_path / 'dest'))
  assert out.endswith('my_model')
  for rel in manifest['files']:
    a = (src / rel).read_bytes()
    b = open(os.path.join(out, rel), 'rb').read()
    assert a == b, rel

  # A shipped checkpoint round-trips and still loads through the registry.
  from putting_dune_tpu.experiments import registry

  weights = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights',
      '230422_ppo_v3_2s',
  )
  if os.path.isdir(weights):
    archive2 = str(tmp_path / 'policy.zip')
    artifacts.pack(weights, archive2)
    out2 = artifacts.unpack(archive2, str(tmp_path / 'zoo'))
    agent = registry.PolicyCheckpointAgent(
        '230422_ppo_v3_2s', weights_dir=str(tmp_path / 'zoo')
    )(None, None)
    assert agent is not None

  # Corruption: flip a byte inside the zip payload -> hash mismatch.
  with zipfile.ZipFile(archive) as zf:
    contents = {n: zf.read(n) for n in zf.namelist()}
  contents['params.msgpack'] = b'\x00' + contents['params.msgpack'][1:]
  bad = str(tmp_path / 'bad.zip')
  with zipfile.ZipFile(bad, 'w') as zf:
    for n, data in contents.items():
      zf.writestr(n, data)
  with pytest.raises(ValueError, match='Hash mismatch'):
    artifacts.unpack(bad, str(tmp_path / 'dest2'))

  # Path traversal is rejected.
  evil = str(tmp_path / 'evil.zip')
  with zipfile.ZipFile(evil, 'w') as zf:
    m = dict(manifest)
    m['files'] = {'../../escape.bin': {'sha256': '0' * 64, 'bytes': 1}}
    zf.writestr(artifacts.MANIFEST_NAME, json.dumps(m))
    zf.writestr('../../escape.bin', b'!')
  with pytest.raises(ValueError, match='Unsafe path'):
    artifacts.unpack(evil, str(tmp_path / 'dest3'))


def test_resolve_artifact_uris(tmp_path):
  """URI-based artifact resolution (reference registry.py:71-164 pulls
  zipped models from GCS at load time): local dirs pass through, local /
  file:// zips unpack once into the cache, remote schemes fail with
  actionable zero-egress guidance, junk schemes are rejected."""
  import os

  from putting_dune_tpu.io import artifacts

  src = tmp_path / 'model'
  src.mkdir()
  (src / 'params.msgpack').write_bytes(b'weights')
  archive = str(tmp_path / 'model.zip')
  artifacts.pack(str(src), archive)
  cache = str(tmp_path / 'cache')

  # Local directory: identity.
  assert artifacts.resolve_artifact(str(src), cache_dir=cache) == str(src)

  # Local zip: unpacked into the cache, idempotent on re-resolution.
  out = artifacts.resolve_artifact(archive, cache_dir=cache)
  assert os.path.exists(os.path.join(out, 'params.msgpack'))
  assert artifacts.resolve_artifact(archive, cache_dir=cache) == out

  # file:// URI resolves to the same extraction.
  assert artifacts.resolve_artifact(
      f'file://{archive}', cache_dir=cache
  ) == out

  with pytest.raises(ValueError, match='scheme'):
    artifacts.resolve_artifact('ftp://x/y.zip', cache_dir=cache)
  with pytest.raises(FileNotFoundError):
    artifacts.resolve_artifact(str(tmp_path / 'nope.zip'), cache_dir=cache)
  # Remote download failure (zero-egress here) names the offline path.
  with pytest.raises(RuntimeError, match='zero-egress'):
    artifacts.resolve_artifact(
        'gs://no-such-bucket-pdt/m.zip', cache_dir=cache
    )


def test_resolve_artifact_gcs_authenticated_fallback(tmp_path):
  """gs:// URIs that fail the anonymous endpoint fall back to the
  authenticated google-cloud-storage client when installed (reference
  registry.py:94-108 pulls from private buckets). Simulated with a fake
  google.cloud.storage module."""
  import sys
  import types

  from putting_dune_tpu.io import artifacts

  src = tmp_path / 'model'
  src.mkdir()
  (src / 'params.msgpack').write_bytes(b'weights')
  archive = str(tmp_path / 'model.zip')
  artifacts.pack(str(src), archive)
  with open(archive, 'rb') as f:
    payload = f.read()

  calls = []

  class FakeBlob:
    def __init__(self, bucket, path):
      self.bucket, self.path = bucket, path

    def download_to_filename(self, target):
      calls.append((self.bucket, self.path))
      with open(target, 'wb') as f:
        f.write(payload)

  class FakeBucket:
    def __init__(self, name):
      self.name = name

    def blob(self, path):
      return FakeBlob(self.name, path)

  class FakeClient:
    def bucket(self, name):
      return FakeBucket(name)

  storage_mod = types.ModuleType('google.cloud.storage')
  storage_mod.Client = FakeClient
  cloud_mod = types.ModuleType('google.cloud')
  cloud_mod.storage = storage_mod
  saved = {
      k: sys.modules.get(k) for k in ('google.cloud', 'google.cloud.storage')
  }
  sys.modules['google.cloud'] = cloud_mod
  sys.modules['google.cloud.storage'] = storage_mod

  # The anonymous endpoint must FAIL (as a private bucket does) without
  # touching the network.
  import urllib.request

  def refuse(url, target):
    raise OSError('403 anonymous access denied (fake)')

  saved_retrieve = urllib.request.urlretrieve
  urllib.request.urlretrieve = refuse
  try:
    out = artifacts.resolve_artifact(
        'gs://private-bucket/models/model.zip',
        cache_dir=str(tmp_path / 'cache'),
    )
    assert calls == [('private-bucket', 'models/model.zip')]
    assert os.path.exists(os.path.join(out, 'params.msgpack'))
  finally:
    urllib.request.urlretrieve = saved_retrieve
    for k, v in saved.items():
      if v is None:
        sys.modules.pop(k, None)
      else:
        sys.modules[k] = v


def test_resolve_artifact_repack_invalidates_cache(tmp_path):
  """Re-packing a bundle at the same path must re-extract — the cache is
  keyed by archive identity (size+mtime), not path alone, so stale
  weights are never silently served."""
  import os

  from putting_dune_tpu.io import artifacts

  src = tmp_path / 'model'
  src.mkdir()
  (src / 'params.msgpack').write_bytes(b'v1-weights')
  archive = str(tmp_path / 'model.zip')
  artifacts.pack(str(src), archive)
  cache = str(tmp_path / 'cache')
  out1 = artifacts.resolve_artifact(archive, cache_dir=cache)
  assert open(os.path.join(out1, 'params.msgpack'), 'rb').read() == (
      b'v1-weights'
  )

  (src / 'params.msgpack').write_bytes(b'v2-weights-longer')
  artifacts.pack(str(src), archive)
  os.utime(archive, ns=(1, 1))  # force a distinct mtime even on fast FS
  out2 = artifacts.resolve_artifact(archive, cache_dir=cache)
  assert open(os.path.join(out2, 'params.msgpack'), 'rb').read() == (
      b'v2-weights-longer'
  )


def test_resolve_artifact_reextracts_partial_extraction(tmp_path):
  """An interrupted unpack (files present, no completion marker) must be
  re-extracted on the next resolution, never served as the model."""
  import os
  import shutil

  from putting_dune_tpu.io import artifacts

  src = tmp_path / 'model'
  src.mkdir()
  (src / 'params.msgpack').write_bytes(b'weights')
  archive = str(tmp_path / 'model.zip')
  artifacts.pack(str(src), archive)
  cache = str(tmp_path / 'cache')

  out = artifacts.resolve_artifact(archive, cache_dir=cache)
  extract_root = os.path.dirname(out)
  marker = os.path.join(extract_root, '.complete')
  assert os.path.exists(marker)

  # Simulate a crash mid-unpack: model dir exists (even non-empty, with
  # a corrupt partial file) but the completion marker does not.
  os.remove(marker)
  with open(os.path.join(out, 'params.msgpack'), 'wb') as f:
    f.write(b'par')  # truncated write
  out2 = artifacts.resolve_artifact(archive, cache_dir=cache)
  assert out2 == out
  assert open(os.path.join(out2, 'params.msgpack'), 'rb').read() == (
      b'weights'
  )
  assert os.path.exists(marker)

  # A wiped cache dir re-extracts too.
  shutil.rmtree(extract_root)
  out3 = artifacts.resolve_artifact(archive, cache_dir=cache)
  assert open(os.path.join(out3, 'params.msgpack'), 'rb').read() == (
      b'weights'
  )
