"""LearnedRatePredictor: train/distill/save/load/predict + simulator plug-in.

TPU-first rewrite of the reference LearnedTransitionRatePredictor
(learn_rates.py:656-972). The biggest design change: the reference exports
through jax2tf to a TF SavedModel and calls back into TF per prediction
(learn_rates.py:884-972); here the predictor stays native JAX end-to-end,
so `as_rate_function()` returns a batched rate function that runs INSIDE
the jitted KMC loop on device. Checkpoints use flax.serialization bytes
(same mechanism as the reference's .ckpt files).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Mapping, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from putting_dune_tpu import constants
from putting_dune_tpu.rate_learning import config as config_lib
from putting_dune_tpu.rate_learning import data_utils
from putting_dune_tpu.rate_learning import distill as distill_lib
from putting_dune_tpu.rate_learning import losses
from putting_dune_tpu.rate_learning import model as model_lib
from putting_dune_tpu.rate_learning import train as train_lib


class LearnedRatePredictor:
  """An ensemble (or distilled single) neural transition-rate model."""

  def __init__(
      self,
      init_key: Optional[jax.Array] = None,
      num_states: int = 3,
      position_dim: int = 2,
      config: config_lib.RateLearningConfig = config_lib.RateLearningConfig(),
  ):
    self.config = config
    self.num_states = num_states
    self.num_models = config.num_models
    if init_key is None:
      init_key = jax.random.PRNGKey(0)
    self.init_fn, self.apply_fn = model_lib.get_mlp_fn(
        config.hidden_dimensions,
        num_states,
        batchnorm=config.batchnorm,
        dropout_rate=config.dropout_rate,
    )
    self.context_dim = (
        position_dim + int(config.use_current) + int(config.use_voltage)
    )
    self.rng, *keys = jax.random.split(init_key, self.num_models + 1)
    inits = [
        self.init_fn(k, jnp.zeros(self.context_dim)) for k in keys
    ]
    self.params = train_lib.tree_stack([i[0] for i in inits])
    self.state = train_lib.tree_stack([i[1] for i in inits])

    @functools.partial(jax.jit, static_argnames='is_training')
    @functools.partial(jax.vmap, in_axes=(0, 0, None, None, None))
    def batch_apply(params, state, x, rng, is_training):
      return self.apply_fn(params, state, rng, x, is_training)

    self._batch_apply = batch_apply

  # -- inference --------------------------------------------------------------

  def apply_model(
      self,
      x: np.ndarray,
      key: Optional[jax.Array] = None,
      model_index: Optional[int] = None,
  ) -> jnp.ndarray:
    """Mean per-neighbor rates over the ensemble (learn_rates.py:703-733)."""
    if key is None:
      key, self.rng = jax.random.split(self.rng)
    if model_index is None:
      out, _ = self._batch_apply(self.params, self.state, x, key, False)
    else:
      params = jax.tree_util.tree_map(lambda a: a[model_index], self.params)
      state = jax.tree_util.tree_map(lambda a: a[model_index], self.state)
      out, _ = self.apply_fn(params, state, key, x, False)
      out = out[None]
    return losses.predicted_rates_to_per_neighbor(out).mean(0)

  def predict(
      self,
      beam_position: np.ndarray,
      silicon_position: np.ndarray,
      neighbor_positions: np.ndarray,
      voltage_kv: float = 60.0,
      current_na: float = 0.1,
  ) -> np.ndarray:
    """Host-side single-step rate prediction (learn_rates.py:925-972).

    Args:
      beam_position: (2,) beam position, material frame (angstroms).
      silicon_position: (2,) silicon position (angstroms).
      neighbor_positions: (3, 2) neighbor positions (angstroms).
      voltage_kv / current_na: beam parameters (prepended to the context in
        [current, voltage] order when enabled, matching the reference).

    Returns:
      (3,) rates ordered like the input neighbors.
    """
    rel_neighbors = np.asarray(neighbor_positions) - np.asarray(
        silicon_position
    )
    rel_beam = np.asarray(beam_position) - np.asarray(silicon_position)
    if self.config.beam_units == 'bonds':
      rel_beam = rel_beam / constants.CARBON_BOND_DISTANCE_ANGSTROMS
    new_beam, _, order = data_utils.standardize_beam_and_neighbors(
        rel_beam, rel_neighbors
    )
    context = new_beam.reshape(1, -1).astype(np.float32)
    if self.config.use_voltage:
      context = np.concatenate(
          [np.full((1, 1), voltage_kv, np.float32), context], axis=-1
      )
    if self.config.use_current:
      context = np.concatenate(
          [np.full((1, 1), current_na, np.float32), context], axis=-1
      )
    rates = np.asarray(self.apply_model(jnp.asarray(context)))[0]
    return rates[np.argsort(order)]

  def as_rate_function(
      self, voltage_kv: float = 60.0, current_na: float = 0.1
  ):
    """Returns a batched RateFunction for the on-device KMC engine.

    The returned callable maps (si_pos (B,2), neighbor_pos (B,3,2),
    beam_pos (B,2)) -> (B,3) rates, entirely in jnp — usable under
    jit/vmap/scan inside simulator.step. This replaces the reference's
    TF-SavedModel round trip per KMC iteration.
    """
    params = self.params
    state = self.state
    apply_fn = self.apply_fn
    use_voltage = self.config.use_voltage
    use_current = self.config.use_current
    beam_scale = (
        1.0 / constants.CARBON_BOND_DISTANCE_ANGSTROMS
        if self.config.beam_units == 'bonds'
        else 1.0
    )
    fixed_key = jax.random.PRNGKey(0)

    def rate_fn(si_pos, neighbor_pos, beam_pos):
      batch = si_pos.shape[0]
      rel_neighbors = neighbor_pos - si_pos[:, None, :]
      rel_beam = (beam_pos - si_pos) * beam_scale
      new_beam, _, order = data_utils.standardize_batched(
          rel_beam, rel_neighbors
      )
      context = new_beam
      if use_voltage:
        context = jnp.concatenate(
            [jnp.full((batch, 1), voltage_kv), context], axis=-1
        )
      if use_current:
        context = jnp.concatenate(
            [jnp.full((batch, 1), current_na), context], axis=-1
        )

      def one_model(p, s):
        out, _ = apply_fn(p, s, fixed_key, context, False)
        return losses.predicted_rates_to_per_neighbor(out)

      rates = jax.vmap(one_model)(params, state).mean(0)  # (B, 3)
      inverse = jnp.argsort(order, axis=-1)
      return jnp.take_along_axis(rates, inverse, axis=-1)

    return rate_fn

  # -- training ---------------------------------------------------------------

  def train(
      self,
      train_data: Mapping[str, np.ndarray],
      key: jax.Array,
      bootstrap: Optional[bool] = None,
      mesh=None,
      epoch_chunk: Optional[int] = None,
      progress=None,
  ):
    """Trains the bootstrap ensemble (learn_rates.py:734-776)."""
    if bootstrap is None:
      bootstrap = self.config.bootstrap
    self.rng, train_key = jax.random.split(key)
    optim = optax.adamw(
        self.config.learning_rate, weight_decay=self.config.weight_decay
    )
    seed = int(jax.random.randint(train_key, (), 0, 2**31 - 1))
    train_sets, test_sets = train_lib.create_dataset_splits(
        train_data,
        self.num_models,
        seed=seed,
        bootstrap=bootstrap,
        augment=self.config.augment_data,
        test_fraction=self.config.val_frac,
    )
    self.params, self.state, _, metrics = train_lib.train_multiple_models(
        train_sets,
        test_sets,
        train_key,
        self.num_models,
        optim,
        self.apply_fn,
        self.init_fn,
        self.config,
        mesh=mesh,
        epoch_chunk=epoch_chunk,
        progress=progress,
    )
    return metrics

  def distill(
      self,
      train_data: Mapping[str, np.ndarray],
      config: config_lib.DistillConfig = config_lib.DistillConfig(),
  ):
    """Distills the ensemble into one model (learn_rates.py:778-826)."""
    optim = optax.adamw(
        self.config.learning_rate, weight_decay=self.config.weight_decay
    )
    context = np.asarray(train_data['context']).reshape(
        len(train_data['context']), -1
    )
    position = np.asarray(train_data['position'])
    data_mean = np.concatenate([context.mean(0), position.mean(0)], 0)
    data_scale = np.concatenate([context.std(0), position.std(0)], 0)

    params, state, self.rng, metrics = (
        distill_lib.distill_multiple_models_to_single(
            self.rng,
            optim,
            self.apply_fn,
            self.init_fn,
            ensemble_params=self.params,
            ensemble_state=self.state,
            batch_size=config.batch_size,
            epochs=config.epochs,
            batches_per_epoch=config.batches_per_epoch,
            data_mean=jnp.asarray(data_mean, jnp.float32),
            data_scale=jnp.asarray(data_scale, jnp.float32),
        )
    )
    self.params = train_lib.tree_stack([params])
    self.state = train_lib.tree_stack([state])
    self.num_models = 1
    return metrics

  # -- persistence ------------------------------------------------------------

  def save(self, save_dir: str, step: int = 0) -> None:
    """Saves params+state (flax bytes) and config (json); ref :827-857."""
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, f'{step}.ckpt'), 'wb') as f:
      f.write(flax.serialization.to_bytes(self.params))
    with open(os.path.join(save_dir, f'{step}.state.ckpt'), 'wb') as f:
      f.write(flax.serialization.to_bytes(self.state))
    config_dict = {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in vars(self.config).items()
    }
    config_dict['num_models_current'] = self.num_models
    with open(os.path.join(save_dir, 'config.json'), 'w') as f:
      json.dump(config_dict, f)

  def load(self, load_dir: str, step: int = 0) -> None:
    """Restores params/state saved by save() (reference :859-882)."""
    config_path = os.path.join(load_dir, 'config.json')
    if os.path.exists(config_path):
      with open(config_path) as f:
        cfg = json.load(f)
      num_current = cfg.pop('num_models_current', cfg.get('num_models'))
      cfg['hidden_dimensions'] = tuple(cfg['hidden_dimensions'])
      stored = config_lib.RateLearningConfig(**cfg)
      if stored != self.config:
        # The stored architecture wins over whatever template this
        # instance was constructed with: rebuild init/apply fns and the
        # param/state templates from the stored config (otherwise a
        # checkpoint trained with different hidden_dimensions /
        # batchnorm / context fields fails flax's shape check).
        self.__init__(
            init_key=jax.random.PRNGKey(0),
            num_states=self.num_states,
            config=stored,
        )
      if num_current != self.num_models:
        # Rebuild templates with the stored ensemble size.
        self.num_models = num_current
        keys = jax.random.split(jax.random.PRNGKey(0), self.num_models)
        inits = [
            self.init_fn(k, jnp.zeros(self.context_dim)) for k in keys
        ]
        self.params = train_lib.tree_stack([i[0] for i in inits])
        self.state = train_lib.tree_stack([i[1] for i in inits])
    with open(os.path.join(load_dir, f'{step}.ckpt'), 'rb') as f:
      self.params = flax.serialization.from_bytes(self.params, f.read())
    state_path = os.path.join(load_dir, f'{step}.state.ckpt')
    if os.path.exists(state_path):
      with open(state_path, 'rb') as f:
        self.state = flax.serialization.from_bytes(self.state, f.read())

  def export_tf(self, save_dir: str, fixed_context=None) -> None:
    """Exports the ensemble-mean predictor as a TF SavedModel.

    Optional deployment-parity path (the reference's primary export,
    learn_rates.py:884-923); the native path is as_rate_function().
    fixed_context, if given, is prepended to every input row.
    """
    import jax.numpy as jnp
    import numpy as np

    from putting_dune_tpu.io import tf_export

    if fixed_context is None:
      input_dim = self.context_dim
    else:
      fixed_context = jnp.asarray(np.asarray(fixed_context, np.float32))
      input_dim = self.context_dim - fixed_context.shape[0]

    def apply_model(context):
      if fixed_context is not None:
        tiled = jnp.tile(fixed_context[None], (context.shape[0], 1))
        context = jnp.concatenate([tiled, context], axis=-1)
      out, _ = self._batch_apply(
          self.params, self.state, context, jax.random.PRNGKey(0), False
      )
      return losses.predicted_rates_to_per_neighbor(out).mean(0)

    tf_export.export_tf_saved_model(
        jax.jit(apply_model), (1, input_dim), save_dir,
        input_name='beam_position',
    )
