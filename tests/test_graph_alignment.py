"""Graph-alignment GNN tests: shapes, data, learning signal."""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu.graph_alignment import data as data_lib
from putting_dune_tpu.graph_alignment import model as model_lib
from putting_dune_tpu.graph_alignment import train as train_lib

LATTICE = lattice_lib.make_lattice(num_cols=20)


def test_knn_edges_static_shape_and_validity():
  rng = np.random.default_rng(0)
  pos = jnp.asarray(rng.normal(size=(32, 2)))
  mask = jnp.asarray([True] * 24 + [False] * 8)
  edges = model_lib.knn_edges(pos, mask, k=4)
  assert edges.shape == (32, 4)
  # Valid nodes never pick themselves.
  e = np.asarray(edges)
  for i in range(24):
    assert i not in e[i]


def test_model_shapes():
  module = model_lib.AlignmentGraphNetwork(
      num_frames=2, width=16, num_layers=2, k=4
  )
  n = 64
  params = module.init(
      jax.random.PRNGKey(0),
      jnp.zeros((n, 2)),
      jnp.zeros((n,), jnp.int32),
      jnp.zeros((n,), jnp.int32),
      jnp.ones((n,), bool),
  )['params']
  g, l = module.apply(
      {'params': params},
      jnp.zeros((n, 2)),
      jnp.concatenate([jnp.zeros(32, jnp.int32), jnp.ones(32, jnp.int32)]),
      jnp.full((n,), 6, jnp.int32),
      jnp.ones((n,), bool),
  )
  assert g.shape == (2, 2)
  assert l.shape == (n, 2)


def test_data_shapes_and_drift_reference():
  batch = data_lib.sample_batch(
      jax.random.PRNGKey(1), LATTICE, batch_size=2, num_frames=2,
      capacity=64,
  )
  assert batch['positions'].shape == (2, 128, 2)
  assert batch['frame_ids'].shape == (2, 128)
  assert batch['drift'].shape == (2, 2, 2)
  np.testing.assert_allclose(np.asarray(batch['drift'])[:, -1], 0.0)


def test_training_improves_drift_error(tmp_path):
  config = train_lib.Config(
      workdir=str(tmp_path),
      batch_size=8,
      epochs=2,
      steps_per_epoch=10,
      eval_steps=3,
      num_frames=2,
      capacity=64,
      width=32,
      num_layers=2,
      k=4,
      grid_columns=20,
  )
  history = []
  train_lib.train(config, progress=lambda e, m: history.append(m))
  assert len(history) == 2
  assert np.isfinite(history[-1]['drift_error'])
  # Labels are bounded by one U(-1,1)^2 step: trivial predictor (0) gives
  # ~0.74 mean error; a few steps of training should stay in that range.
  assert history[-1]['drift_error'] < 2.0
