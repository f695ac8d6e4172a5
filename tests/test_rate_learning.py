"""Rate-learning stack tests (reference learn_rates_test.py style + more).

Includes the rate-recovery check the reference skipped as flaky
(learn_rates_test.py:125-158) — with enough data/epochs it is stable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from putting_dune_tpu import constants
from putting_dune_tpu.rate_learning import config as config_lib
from putting_dune_tpu.rate_learning import data_utils
from putting_dune_tpu.rate_learning import losses
from putting_dune_tpu.rate_learning import model as model_lib
from putting_dune_tpu.rate_learning import train as train_lib
from putting_dune_tpu.rate_learning.predictor import LearnedRatePredictor


# context_dim = 2 noise dims + 2 position dims = 4 = 2 + use_current +
# use_voltage, matching the synthetic-data layout after position folding.
SMALL_CONFIG = config_lib.RateLearningConfig(
    batch_size=32,
    epochs=30,
    num_models=3,
    hidden_dimensions=(32, 32),
    use_voltage=True,
    use_current=True,
)


def test_synthetic_data_shapes_and_law():
  train, test = data_utils.generate_synthetic_data(
      num_data=512, data_seed=1
  )
  assert train['context'].shape == (512, 2)
  assert train['position'].shape == (512, 2)
  assert train['rates'].shape == (512, 3)
  assert train['next_state'].shape == (512,)
  ns = np.asarray(train['next_state'])
  assert set(np.unique(ns)).issubset({0, 1, 2, 3})
  # Some transitions and some non-transitions.
  assert 0.05 < (ns != 0).mean() < 0.95
  del test


def test_augmentation_six_fold():
  train, _ = data_utils.generate_synthetic_data(num_data=64, data_seed=2)
  augmented = data_utils.augment_data(
      next_state=train['next_state'],
      dt=train['dt'],
      rates=train['rates'],
      position=train['position'],
      context=train['context'],
  )
  # Reflection doubles, rotations triple: 6x (reference data_utils_test).
  assert augmented['next_state'].shape[0] == 6 * 64
  # Rotating positions by 120 degrees preserves radii.
  r0 = np.linalg.norm(np.asarray(train['position']), axis=-1)
  r_aug = np.linalg.norm(np.asarray(augmented['position']), axis=-1)
  np.testing.assert_allclose(np.sort(r_aug)[:64], np.sort(np.tile(r0, 6))[:64],
                             rtol=1e-4)


def test_reflection_swaps_states_1_and_2():
  ns = jnp.asarray([0, 1, 2, 3])
  dt = jnp.ones(4)
  rates = jnp.tile(jnp.asarray([[0.1, 0.2, 0.3]]), (4, 1))
  pos = jnp.asarray([[1.0, 2.0]] * 4)
  r_ns, _, r_rates, r_pos, _ = data_utils.reflect_transitions(
      ns, dt, rates, pos
  )
  assert np.asarray(r_ns).tolist() == [0, 1, 3, 2]
  np.testing.assert_allclose(
      np.asarray(r_rates)[0], [0.1, 0.3, 0.2], rtol=1e-6
  )
  np.testing.assert_allclose(np.asarray(r_pos)[0], [1.0, -2.0], rtol=1e-6)


def test_loss_decreases_under_training():
  train, test = data_utils.generate_synthetic_data(
      num_data=1024, data_seed=3
  )
  data = {
      'next_state': jnp.asarray(train['next_state']),
      'dt': jnp.asarray(train['dt']),
      'context': jnp.concatenate(
          [train['context'], train['position']], axis=-1
      ),
  }
  init_fn, apply_fn = model_lib.get_mlp_fn((32, 32), 3)
  params, state = init_fn(jax.random.PRNGKey(0), data['context'][:1])
  optim = optax.adamw(1e-3)
  opt_state = optim.init(params)
  cfg = SMALL_CONFIG

  loss0, _ = losses.batched_loss_fn(
      params, state, apply_fn, data['next_state'], data['dt'],
      data['next_state'] != 0, data['context'], jax.random.PRNGKey(1),
      is_training=False,
  )
  params, state, opt_state, metrics = train_lib.train_model(
      data, data, jax.random.PRNGKey(2), params, state, opt_state,
      apply_fn, optim, cfg,
  )
  final_loss = float(np.asarray(metrics['train_loss'])[-1])
  assert final_loss < float(loss0)
  assert np.isfinite(np.asarray(metrics['test_loss'])).all()


def test_predictor_train_and_rate_recovery():
  """Argmax of learned rates matches the generating prior's argmax."""
  train, _ = data_utils.generate_synthetic_data(num_data=2048, data_seed=4)
  train = jax.tree_util.tree_map(np.asarray, train)
  # Synthetic data has 2 noise context dims + 2 position dims; the model
  # input is their concatenation (create_dataset_splits folds 'position'
  # into 'context'), matching context_dim = 2 + use_current + use_voltage.
  predictor = LearnedRatePredictor(
      init_key=jax.random.PRNGKey(5),
      config=config_lib.RateLearningConfig(
          batch_size=128,
          epochs=60,
          num_models=2,
          hidden_dimensions=(64, 64),
          use_voltage=True,
          use_current=True,
      ),
  )
  metrics = predictor.train(train, jax.random.PRNGKey(6))
  assert np.isfinite(np.asarray(metrics['train_loss'])).all()

  # Probe: beam at the prior peak toward canonical neighbor k must make
  # neighbor k the argmax of predicted rates (noise context zeroed).
  hits = 0
  for k in range(3):
    angle = 2 * np.pi * k / 3
    beam = 0.85 * np.asarray([np.cos(angle), np.sin(angle)])
    x = np.concatenate([np.zeros(2), beam]).astype(np.float32)
    rates = predictor.apply_model(jnp.asarray(x[None]))
    if int(np.argmax(np.asarray(rates)[0])) == k:
      hits += 1
  assert hits >= 2, hits


def test_predictor_save_load_roundtrip(tmp_path):
  predictor = LearnedRatePredictor(
      init_key=jax.random.PRNGKey(7), config=SMALL_CONFIG
  )
  x = jnp.ones((1, 4), jnp.float32)
  before = np.asarray(predictor.apply_model(x, key=jax.random.PRNGKey(0)))
  predictor.save(str(tmp_path))
  restored = LearnedRatePredictor(
      init_key=jax.random.PRNGKey(99), config=SMALL_CONFIG
  )
  restored.load(str(tmp_path))
  after = np.asarray(restored.apply_model(x, key=jax.random.PRNGKey(0)))
  np.testing.assert_allclose(before, after, rtol=1e-6)


def test_distillation_reduces_to_single_model():
  train, _ = data_utils.generate_synthetic_data(num_data=256, data_seed=8)
  train = jax.tree_util.tree_map(np.asarray, train)
  predictor = LearnedRatePredictor(
      init_key=jax.random.PRNGKey(9), config=SMALL_CONFIG
  )
  predictor.train(train, jax.random.PRNGKey(10))
  ensemble_pred = np.asarray(
      predictor.apply_model(
          jnp.ones((1, 4), jnp.float32), key=jax.random.PRNGKey(0)
      )
  )
  metrics = predictor.distill(
      train,
      config_lib.DistillConfig(batch_size=256, epochs=50,
                               batches_per_epoch=5),
  )
  assert predictor.num_models == 1
  student_pred = np.asarray(
      predictor.apply_model(
          jnp.ones((1, 4), jnp.float32), key=jax.random.PRNGKey(0)
      )
  )
  # Student approximates the ensemble (loose tolerance; stochastic L2 fit).
  assert np.isfinite(metrics['distill_loss']).all()
  assert metrics['distill_loss'][-1] < metrics['distill_loss'][0] * 2
  np.testing.assert_allclose(student_pred, ensemble_pred, rtol=1.0,
                             atol=0.5)


def test_learned_rate_function_in_kmc():
  """as_rate_function plugs into the jitted KMC engine."""
  from putting_dune_tpu import kmc
  from putting_dune_tpu import lattice as lattice_lib

  predictor = LearnedRatePredictor(
      init_key=jax.random.PRNGKey(11), config=SMALL_CONFIG
  )
  rate_fn = predictor.as_rate_function()
  lattice = lattice_lib.make_lattice(10)
  batch = 8
  offset = jnp.zeros((batch, 2))
  theta = jnp.zeros((batch,))
  si = lattice_lib.initial_silicon_index(lattice, offset)
  beam = lattice_lib.site_position(lattice, si, offset, theta)
  result = kmc.apply_control(
      jax.random.PRNGKey(12),
      lattice,
      offset,
      theta,
      si,
      beam,
      jnp.full((batch,), 1.5),
      rate_fn,
  )
  assert result.si_index.shape == (batch,)
  assert np.isfinite(np.asarray(result.num_transitions)).all()


def test_standardize_batched_matches_host():
  rng = np.random.default_rng(13)
  for _ in range(5):
    beam = rng.normal(size=(2,))
    nbrs = rng.normal(size=(3, 2)) * 1.42
    b_host, n_host, order_host = data_utils.standardize_beam_and_neighbors(
        beam, nbrs
    )
    b_dev, n_dev, order_dev = data_utils.standardize_batched(
        jnp.asarray(beam[None]), jnp.asarray(nbrs[None])
    )
    np.testing.assert_allclose(
        np.asarray(b_dev)[0], b_host.reshape(-1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(n_dev)[0], n_host, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(order_dev)[0], order_host)


def test_tf_export_roundtrip(tmp_path):
  """Optional jax2tf deployment export matches the native predictor."""
  pytest.importorskip('tensorflow')
  predictor = LearnedRatePredictor(
      init_key=jax.random.PRNGKey(30), config=SMALL_CONFIG
  )
  x = np.ones((1, 4), np.float32)
  native = np.asarray(predictor.apply_model(jnp.asarray(x)))
  predictor.export_tf(str(tmp_path / 'tf_model'))
  from putting_dune_tpu.io import tf_export

  loaded = tf_export.load_tf_saved_model(str(tmp_path / 'tf_model'))
  tf_out = np.asarray(loaded(x))
  np.testing.assert_allclose(tf_out, native, rtol=1e-5, atol=1e-6)
