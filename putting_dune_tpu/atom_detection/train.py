"""Atom-detection training loop: data-parallel mesh, orbax checkpoints.

Parity: reference atom_detection/train.py:155-294 — softmax CE over one-hot
masks, adamw, accuracy metric, orbax CheckpointManager keeping the best
eval-accuracy checkpoint, 1-D 'data' mesh batch sharding (reference
:128-148). Data comes from the on-device generator (data.py) instead of
grain/TFDS.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from putting_dune_tpu.atom_detection import data as data_lib
from putting_dune_tpu.atom_detection import model as model_lib
from putting_dune_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class Config:
  """Train config (reference train.py:53-67)."""

  workdir: str
  seed: int = 0
  learning_rate: float = 1e-3
  batch_size: int = 128
  epochs: int = 100
  steps_per_epoch: int = 500  # batches per epoch
  eval_steps: int = 50
  image_size: int = 128
  features: tuple = (32, 64, 128, 256)
  grid_columns: int = 50
  noisy_images: bool = False
  # When set, the TRAIN stream mixes fully-noisy batches in with this
  # per-batch probability (eval keeps noisy_images) — robustness training
  # for the real-microscope distribution without giving up the clean
  # metric.
  noisy_fraction: Optional[float] = None
  # Optional per-class CE weights (background, carbon, silicon). The
  # reference uses unweighted CE over very large data budgets
  # (train.py:95-99); weighting counters the ~8:1 background dominance
  # when training smaller/faster.
  class_weights: Optional[tuple] = None
  # Warm-start params from this workdir (params.msgpack / best orbax ckpt)
  # when the run has no orbax checkpoint of its own yet — lets a budgeted
  # continuation run pick up from the shipped artifact after the previous
  # run's checkpoints were pruned.
  init_params_from: str = ''
  # 'synthetic' (default): on-device generated batches. 'records:<dir>':
  # a materialized TFRecord dataset (data.write_dataset / real labeled
  # data), per-process example sharding — the reference's grain/TFDS
  # loader path (atom_detection/dataset.py:81-120). Eval uses the
  # dataset's test/ split when present.
  data_source: str = 'synthetic'


class TrainState(train_state.TrainState):
  pass


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=('class_weights',)
)
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    class_weights: Optional[tuple] = None,
):
  """One SGD step; returns (state, metrics)."""

  def loss_fn(params):
    logits = state.apply_fn({'params': params}, batch['image'])
    ce = optax.softmax_cross_entropy(logits, batch['mask'])
    if class_weights is not None:
      weights = jnp.einsum(
          '...c,c->...', batch['mask'], jnp.asarray(class_weights)
      )
      loss = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)
    else:
      loss = jnp.mean(ce)
    accuracy = jnp.mean(
        jnp.argmax(logits, -1) == jnp.argmax(batch['mask'], -1)
    )
    return loss, accuracy

  (loss, accuracy), grads = jax.value_and_grad(loss_fn, has_aux=True)(
      state.params
  )
  state = state.apply_gradients(grads=grads)
  return state, {'loss': loss, 'accuracy': accuracy}


@jax.jit
def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
  logits = state.apply_fn({'params': state.params}, batch['image'])
  return jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(batch['mask'], -1))


def create_state(config: Config, mesh=None) -> TrainState:
  module = model_lib.UNet(features=tuple(config.features))
  params = module.init(
      jax.random.PRNGKey(config.seed),
      jnp.zeros((1, config.image_size, config.image_size, 1)),
  )['params']
  if mesh is not None:
    params = jax.device_put(params, mesh_lib.replicated_sharding(mesh))
  return TrainState.create(
      apply_fn=module.apply,
      params=params,
      tx=optax.adamw(config.learning_rate),
  )


def train(config: Config, *, mesh=None, progress=None,
          stop_fn=None) -> TrainState:
  """Runs the full training loop with best-checkpoint retention.

  Args:
    config: static config.
    mesh: optional jax Mesh with a 'data' axis for batch sharding (defaults
      to a 1-D mesh over all devices, reference train.py:128-148).
    progress: optional callable(epoch, metrics_dict) for logging.
  """
  import orbax.checkpoint as ocp

  if config.steps_per_epoch <= 0 and config.eval_steps <= 0:
    raise ValueError(
        'steps_per_epoch and eval_steps cannot both be 0: every epoch '
        'must produce at least one metric for the best-checkpoint '
        'manager (a checkpoint-flush-only run should set eval_steps>=1).'
    )

  if mesh is None:
    mesh = mesh_lib.make_mesh()
  state = create_state(config, mesh)
  if config.init_params_from:
    warm = load_params(
        config.init_params_from,
        dataclasses.replace(config, workdir=config.init_params_from),
    )
    state = state.replace(
        params=jax.device_put(warm, mesh_lib.replicated_sharding(mesh))
    )

  manager = ocp.CheckpointManager(
      os.path.abspath(os.path.join(config.workdir, 'checkpoints')),
      options=ocp.CheckpointManagerOptions(
          max_to_keep=3,
          best_fn=lambda m: m['accuracy'],
          best_mode='max',
      ),
  )
  # Auto-resume from the latest step (reference train.py:212-219).
  start_epoch = 0
  latest = manager.latest_step()
  if latest is not None:
    state = manager.restore(latest, args=ocp.args.StandardRestore(state))
    start_epoch = latest + 1

  # Multi-process: each process generates its share of the global batch
  # from a disjoint RNG stream, then assembles host-local arrays into
  # global batch-sharded arrays (reference: grain.ShardByJaxProcess,
  # atom_detection/dataset.py:100,111 + host_local_array_to_global_array,
  # image_alignment/train.py:384-391). Single-process this reduces exactly
  # to the plain shard_batch path.
  local_batch = mesh_lib.process_local_batch_size(config.batch_size)
  from putting_dune_tpu.io import datasets as datasets_lib

  records_dir = datasets_lib.parse_data_source(config.data_source)
  if records_dir is not None:
    train_iter = data_lib.records_dataset_iterator(
        records_dir, config.seed, batch_size=local_batch, split='train'
    )
    # "Eval uses the dataset's test/ split when present" (Config): a
    # dataset written without one (write_dataset test_examples=0) falls
    # back to the synthetic eval stream instead of failing at startup.
    try:
      eval_iter = data_lib.records_dataset_iterator(
          records_dir, config.seed + 1, batch_size=local_batch, split='test'
      )
    except FileNotFoundError:
      eval_iter = data_lib.dataset_iterator(
          mesh_lib.process_data_seed(config.seed + 1),
          batch_size=local_batch,
          image_size=config.image_size,
          grid_columns=config.grid_columns,
          noisy=config.noisy_images,
      )
  else:
    train_iter = data_lib.dataset_iterator(
        mesh_lib.process_data_seed(config.seed),
        noisy_fraction=config.noisy_fraction,
        batch_size=local_batch,
        image_size=config.image_size,
        grid_columns=config.grid_columns,
        noisy=config.noisy_images,
    )
    eval_iter = data_lib.dataset_iterator(
        mesh_lib.process_data_seed(config.seed + 1),
        batch_size=local_batch,
        image_size=config.image_size,
        grid_columns=config.grid_columns,
        noisy=config.noisy_images,
    )

  for epoch in range(start_epoch, config.epochs):
    if stop_fn is not None and stop_fn():
      break  # budget/stop hook; orbax still flushes below.
    metrics_acc = []
    for _ in range(config.steps_per_epoch):
      batch = mesh_lib.global_batch(next(train_iter), mesh)
      state, metrics = train_step(
          state, batch, class_weights=config.class_weights
      )
      metrics_acc.append(metrics)
    eval_accs = []
    for _ in range(config.eval_steps):
      batch = mesh_lib.global_batch(next(eval_iter), mesh)
      eval_accs.append(eval_step(state, batch))
    # With eval_steps=0 the best-checkpoint metric falls back to train
    # accuracy; with steps_per_epoch=0 (checkpoint-flush/eval-only epoch)
    # the train keys are omitted rather than averaging an empty list into
    # NaN. The config validation above guarantees at least one source.
    summary = {}
    if metrics_acc:
      summary['loss'] = float(
          np.mean([jax.device_get(m['loss']) for m in metrics_acc])
      )
      summary['train_accuracy'] = float(
          np.mean([jax.device_get(m['accuracy']) for m in metrics_acc])
      )
    summary['accuracy'] = (
        float(np.mean(jax.device_get(eval_accs)))
        if eval_accs else summary['train_accuracy']
    )
    manager.save(
        epoch, args=ocp.args.StandardSave(state), metrics=summary
    )
    if progress is not None:
      progress(epoch, summary)
  manager.wait_until_finished()
  return state


def save_params_msgpack(
    params, workdir: str, config: Optional[Config] = None
) -> str:
  """Writes a params-only artifact (much smaller than a full TrainState
  checkpoint; what ships under experiments/model_weights).

  When config is given, an arch.json sidecar records the UNet feature
  pyramid so loaders reconstruct the right architecture without relying
  on defaults (shipped artifacts can then change width/depth safely).
  """
  import flax.serialization

  path = os.path.join(workdir, 'params.msgpack')
  with open(path, 'wb') as f:
    f.write(flax.serialization.to_bytes(jax.device_get(params)))
  if config is not None:
    import json

    with open(os.path.join(workdir, 'arch.json'), 'w') as f:
      json.dump(
          {'features': list(config.features), 'image_size':
           config.image_size},
          f,
      )
  return path


def load_arch(workdir: str) -> Optional[dict]:
  """Reads the arch.json sidecar if present."""
  import json

  path = os.path.join(workdir, 'arch.json')
  if not os.path.exists(path):
    return None
  with open(path) as f:
    return json.load(f)


def load_params(workdir: str, config: Optional[Config] = None):
  """Restores params: params.msgpack if present, else the best orbax
  checkpoint."""
  import orbax.checkpoint as ocp

  if config is None:
    config = Config(workdir=workdir)
  arch = load_arch(workdir)
  if arch is not None and tuple(arch['features']) != tuple(config.features):
    config = dataclasses.replace(config, features=tuple(arch['features']))
  msgpack_path = os.path.join(workdir, 'params.msgpack')
  if os.path.exists(msgpack_path):
    import flax.serialization

    state = create_state(config)
    with open(msgpack_path, 'rb') as f:
      return flax.serialization.from_bytes(state.params, f.read())
  manager = ocp.CheckpointManager(
      os.path.abspath(os.path.join(workdir, 'checkpoints')),
      options=ocp.CheckpointManagerOptions(
          best_fn=lambda m: m['accuracy'], best_mode='max'
      ),
  )
  step = manager.best_step()
  if step is None:
    step = manager.latest_step()
  state = create_state(config)
  state = manager.restore(step, args=ocp.args.StandardRestore(state))
  return state.params


if __name__ == '__main__':
  from putting_dune_tpu.utils import cli

  cli.run_train_cli(
      Config,
      train,
      'Train the atom-detection UNet (single-host or multi-process; '
      'reference atom_detection/train.py:294).',
  )
