"""Training loops: jitted epochs, scanned training, vmapped ensembles.

Parity: reference learn_rates.py:167-329 (train_epoch/train_model) and
:603-653 (train_multiple_models). TPU-first details:

  * one lax.scan over epochs of a lax.scan over shuffled minibatches —
    the full 500-epoch training is ONE XLA program;
  * the bootstrap ensemble trains as ONE vmap(train_model) — and, for
    multi-chip runs, that vmapped model axis shards over the mesh's
    'model' axis (each device trains its ensemble slice with zero
    communication; see shard_ensemble_training).
"""

from __future__ import annotations

import functools
from typing import Callable, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from putting_dune_tpu.rate_learning import config as config_lib
from putting_dune_tpu.rate_learning import data_utils
from putting_dune_tpu.rate_learning import losses
from putting_dune_tpu.rate_learning import model as model_lib


def tree_stack(list_of_trees):
  return jax.tree_util.tree_map(lambda *x: jnp.stack(x, 0), *list_of_trees)


def train_epoch(
    params,
    network_state,
    opt_state,
    optim,
    apply_fn,
    batch_size: int,
    key: jax.Array,
    train_data: Mapping[str, jnp.ndarray],
    config: config_lib.RateLearningConfig,
):
  """One epoch: shuffle, batch, scan SGD steps (learn_rates.py:167-233)."""
  key, data_key = jax.random.split(key)
  data_size = train_data['context'].shape[0]
  num_batches = data_size // batch_size
  indices = jax.random.permutation(data_key, data_size)
  batch_inds = indices[: num_batches * batch_size].reshape(
      num_batches, batch_size
  )

  # Gather strategy (static at trace time): on TPU the minibatch is
  # gathered INSIDE the scan step — pre-gathering the whole shuffled
  # epoch (`{k: a[batch_inds]}`) materializes a full dataset copy per
  # epoch, which under the 50-model ensemble vmap is a multi-GB
  # transient that crashes the TPU worker at production data scale
  # (50 x 217k transitions); per-step gathers are (B, feat) tiny. On
  # CPU the trade inverts: 560k scan-step gathers dominate wall time
  # (measured 275 s vs the pre-gathered 31 s on the 10x200x72k L6-scale
  # run), while the epoch copy is harmless host RAM — so CPU pre-gathers
  # and scans over the leading axis.
  pregather = jax.default_backend() == 'cpu'
  if pregather:
    epoch_batches = {k: a[batch_inds] for k, a in train_data.items()}

  def train_step(carry, inds_or_batch):
    batch = (
        inds_or_batch
        if pregather
        else {k: a[inds_or_batch] for k, a in train_data.items()}
    )
    params, network_state, opt_state = carry
    grad_fn = jax.value_and_grad(losses.batched_loss_fn, has_aux=True)
    (_, (network_state, _, _, _)), grad = grad_fn(
        params,
        network_state,
        apply_fn,
        batch['next_state'],
        batch['dt'],
        (batch['next_state'] != 0),
        batch['context'],
        key,
        True,
        config.class_loss_weight,
        config.rate_loss_weight,
    )
    updates, opt_state = optim.update(grad, opt_state, params=params)
    params = optax.apply_updates(params, updates)
    return (params, network_state, opt_state), None

  (params, network_state, opt_state), _ = jax.lax.scan(
      train_step,
      (params, network_state, opt_state),
      epoch_batches if pregather else batch_inds,
  )
  return params, network_state, opt_state, key


@functools.partial(
    jax.jit, static_argnames=('apply_fn', 'optim', 'config')
)
def train_model(
    train_data: Mapping[str, jnp.ndarray],
    test_data: Mapping[str, jnp.ndarray],
    key: jax.Array,
    params,
    network_state,
    opt_state,
    apply_fn,
    optim,
    config: config_lib.RateLearningConfig,
):
  """Full training run as one scanned XLA program (learn_rates.py:236-329).

  Returns (params, network_state, opt_state, metrics-over-epochs).
  """

  # The per-epoch metrics evaluate train/test losses on a bounded random
  # subsample instead of the full split: a full-split forward pass keeps
  # (models x examples x hidden) activations alive under the ensemble
  # vmap — ~11 GB for 50 models x 218k examples x 256 hidden — which
  # crashes the TPU worker at production data scales. Splits are already
  # shuffled (bootstrap/permutation in create_dataset_splits), so a
  # prefix is a random sample; metrics are logging/plotting only.
  max_eval = 16384
  train_data_eval = {k: a[:max_eval] for k, a in train_data.items()}
  test_data = {k: a[:max_eval] for k, a in test_data.items()}

  def eval_loss(params, network_state, data, key):
    loss, (_, _, rate_loss, class_loss) = losses.batched_loss_fn(
        params,
        network_state,
        apply_fn,
        data['next_state'],
        data['dt'],
        (data['next_state'] != 0),
        data['context'],
        key,
        is_training=False,
    )
    return loss, jnp.mean(rate_loss), jnp.mean(class_loss)

  def do_epoch(carry, key):
    params, network_state, opt_state = carry
    params, network_state, opt_state, key = train_epoch(
        params,
        network_state,
        opt_state,
        optim,
        apply_fn,
        config.batch_size,
        key,
        train_data,
        config,
    )
    train_loss, train_rate, train_class = eval_loss(
        params, network_state, train_data_eval, key
    )
    test_loss, test_rate, test_class = eval_loss(
        params, network_state, test_data, key
    )
    metrics = {
        'train_loss': train_loss,
        'test_loss': test_loss,
        'train_rate_loss': train_rate,
        'train_class_loss': train_class,
        'test_rate_loss': test_rate,
        'test_class_loss': test_class,
    }
    return (params, network_state, opt_state), metrics

  (params, network_state, opt_state), metrics = jax.lax.scan(
      do_epoch,
      (params, network_state, opt_state),
      jax.random.split(key, config.epochs),
  )
  return params, network_state, opt_state, metrics


def create_dataset_splits(
    train_data: Mapping[str, np.ndarray],
    num_splits: int,
    seed: int,
    bootstrap: bool = True,
    augment: bool = True,
    test_fraction: float = 0.1,
):
  """Bootstrapped/split/augmented per-model datasets (learn_rates:530-600).

  Returns (train_datasets, test_datasets) dicts stacked on a leading model
  axis, with 'position' folded into 'context' (the model input).
  """
  rng = np.random.default_rng(seed)
  train_sets, test_sets = [], []
  for _ in range(num_splits):
    s = int(rng.integers(2**31))
    if bootstrap:
      tr, te = data_utils.bootstrap_dataset(train_data, s)
    elif 0.0 < test_fraction < 1.0:
      tr, te = data_utils.split_dataset(train_data, s, test_fraction)
    else:
      tr, te = dict(train_data), dict(train_data)
    if augment:
      tr = jax.tree_util.tree_map(
          np.asarray, data_utils.augment_data(**_augment_args(tr))
      )
      te = jax.tree_util.tree_map(
          np.asarray, data_utils.augment_data(**_augment_args(te))
      )
    train_sets.append(tr)
    test_sets.append(te)

  # Equalize lengths so the stacks are rectangular.
  def equalize(sets):
    min_len = min(s['context'].shape[0] for s in sets)
    return [
        {k: np.asarray(a)[:min_len] for k, a in s.items()} for s in sets
    ]

  train_sets = equalize(train_sets)
  test_sets = equalize(test_sets)

  def stack_fold(sets):
    out = {
        k: jnp.stack([np.asarray(s[k]) for s in sets])
        for k in sets[0]
        if sets[0][k] is not None
    }
    if 'position' in out:
      out['context'] = jnp.concatenate(
          [out['context'], out['position']], axis=-1
      )
      del out['position']
    return out

  return stack_fold(train_sets), stack_fold(test_sets)


def _augment_args(d):
  return dict(
      next_state=jnp.asarray(d['next_state']).reshape(-1),
      dt=jnp.asarray(d['dt']).reshape(-1),
      rates=jnp.asarray(d['rates']),
      position=jnp.asarray(d['position']),
      context=jnp.asarray(d['context']),
  )


def train_multiple_models(
    train_datasets,
    test_datasets,
    key: jax.Array,
    num_models: int,
    optim,
    apply_fn,
    init_fn,
    config: config_lib.RateLearningConfig,
    mesh=None,
    epoch_chunk: int | None = None,
    progress: Callable[[int, Mapping[str, np.ndarray]], None] | None = None,
):
  """Trains the bootstrap ensemble as one vmap (learn_rates.py:603-653).

  If `mesh` (with a 'model' axis) is given, the stacked model axis is
  sharded across devices — TPU-native ensemble parallelism.

  epoch_chunk bounds how many epochs run per device program: the full
  production run (50 models x 500 epochs x 217k transitions) as ONE
  XLA program executes for tens of minutes with no host interaction,
  which the single-owner TPU relay kills ("worker crashed or
  restarted"). Chunking keeps each program a few minutes and gives
  per-chunk progress callbacks; RNG folds the chunk index, so chunked
  and unchunked runs draw different (same-law) streams.
  """
  train_key, init_key = jax.random.split(key)
  train_keys = jax.random.split(train_key, num_models)
  init_keys = jax.random.split(init_key, num_models)
  init_context = train_datasets['context'][0, 0:1]
  inits = [init_fn(k, init_context) for k in init_keys]
  params = tree_stack([i[0] for i in inits])
  states = tree_stack([i[1] for i in inits])
  opt_states = tree_stack([optim.init(i[0]) for i in inits])

  if mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec as P

    model_sharding = NamedSharding(mesh, P('model'))

    def shard_leading(tree):
      return jax.tree_util.tree_map(
          lambda x: jax.device_put(x, model_sharding), tree
      )

    params = shard_leading(params)
    states = shard_leading(states)
    opt_states = shard_leading(opt_states)
    train_datasets = shard_leading(train_datasets)
    test_datasets = shard_leading(test_datasets)
    train_keys = jax.device_put(train_keys, model_sharding)

  total_epochs = config.epochs
  chunk = min(epoch_chunk or total_epochs, total_epochs)
  metrics_parts = []
  done = 0
  keys = train_keys
  import dataclasses

  while done < total_epochs:
    this_chunk = min(chunk, total_epochs - done)
    chunk_config = dataclasses.replace(config, epochs=this_chunk)
    batch_train = jax.vmap(
        functools.partial(
            train_model, apply_fn=apply_fn, optim=optim,
            config=chunk_config,
        ),
        in_axes=(0, 0, 0, 0, 0, 0),
    )
    params, states, opt_states, m = batch_train(
        train_datasets, test_datasets, keys, params, states, opt_states
    )
    done += this_chunk
    keys = jax.vmap(lambda k: jax.random.fold_in(k, done))(keys)
    metrics_parts.append(m)
    if progress is not None:
      last = jax.tree_util.tree_map(
          lambda x: np.asarray(x)[:, -1].mean(), m
      )
      progress(done, last)
  if len(metrics_parts) == 1:
    metrics = metrics_parts[0]
  else:
    metrics = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=1), *metrics_parts
    )
  return params, states, opt_states, metrics


# --- multi-chip dry-run entry (used by __graft_entry__) -----------------------


def dryrun_ensemble_training_step(devices) -> None:
  """Trains a tiny sharded ensemble end-to-end on the given devices.

  Exercises the 'model'-axis sharding of the vmapped ensemble (ensemble
  parallelism) on however many devices are supplied.
  """
  from jax.sharding import Mesh
  from jax.experimental import mesh_utils

  n = len(devices)
  mesh = Mesh(
      mesh_utils.create_device_mesh((n,), devices=devices), ('model',)
  )

  config = config_lib.RateLearningConfig(
      batch_size=8,
      epochs=2,
      num_models=2 * n,
      hidden_dimensions=(16,),
  )
  train_data, _ = data_utils.generate_synthetic_data(
      num_data=32, data_seed=0
  )
  train_data = jax.tree_util.tree_map(np.asarray, train_data)
  init_fn, apply_fn = model_lib.get_mlp_fn(
      config.hidden_dimensions, config.num_states, config.batchnorm
  )
  optim = optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
  train_sets, test_sets = create_dataset_splits(
      train_data, config.num_models, seed=0
  )
  params, state, _, metrics = train_multiple_models(
      train_sets,
      test_sets,
      jax.random.PRNGKey(0),
      config.num_models,
      optim,
      apply_fn,
      init_fn,
      config,
      mesh=mesh,
  )
  jax.block_until_ready(metrics['train_loss'])
  assert np.isfinite(np.asarray(metrics['train_loss'])).all()
