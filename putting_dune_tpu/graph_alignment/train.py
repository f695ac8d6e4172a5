"""Graph-alignment training loop.

Parity: reference graph_alignment/train.py:238-257 — drift MSE over the
global head (+ optional per-node local loss), adamw, orbax checkpoints,
data-parallel mesh batch sharding.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from putting_dune_tpu.graph_alignment import data as data_lib
from putting_dune_tpu.graph_alignment import model as model_lib
from putting_dune_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class Config:
  workdir: str
  seed: int = 0
  learning_rate: float = 1e-3
  batch_size: int = 16
  epochs: int = 100
  steps_per_epoch: int = 100
  eval_steps: int = 20
  num_frames: int = 2
  capacity: int = 256
  width: int = 64
  num_layers: int = 3
  k: int = 8
  local_loss_weight: float = 0.0
  grid_columns: int = 50
  # 'synthetic' (default): on-device generated batches. 'records:<dir>':
  # a materialized TFRecord dataset (data.write_dataset), per-process
  # example sharding — the reference's TFDS `graph_alignment` loader
  # path (graph_alignment/dataset.py:30-65). Eval uses the dataset's
  # test/ split when present.
  data_source: str = 'synthetic'


class TrainState(train_state.TrainState):
  pass


def _loss(module, params, batch, local_loss_weight):
  global_out, local_out = model_lib.batched_apply(module, params, batch)
  drift_sq = jnp.square(global_out - batch['drift']).sum(-1)
  drift_loss = jnp.mean(drift_sq)
  drift_error = jnp.mean(
      jnp.linalg.norm(global_out - batch['drift'], axis=-1)
  )
  total = drift_loss
  if local_loss_weight > 0:
    # Local head regularizer: predicted per-node displacement should be
    # small for unjittered clouds (targets are unavailable per-node).
    total = total + local_loss_weight * jnp.mean(
        jnp.square(local_out) * batch['mask'][..., None]
    )
  return total, {'loss': total, 'drift_error': drift_error}


def create_state(config: Config, mesh=None) -> TrainState:
  module = model_lib.AlignmentGraphNetwork(
      num_frames=config.num_frames,
      width=config.width,
      num_layers=config.num_layers,
      k=config.k,
  )
  n = config.num_frames * config.capacity
  params = module.init(
      jax.random.PRNGKey(config.seed),
      jnp.zeros((n, 2)),
      jnp.zeros((n,), jnp.int32),
      jnp.zeros((n,), jnp.int32),
      jnp.ones((n,), bool),
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
  import orbax.checkpoint as ocp

  if config.steps_per_epoch <= 0 and config.eval_steps <= 0:
    raise ValueError(
        'steps_per_epoch and eval_steps cannot both be 0: every epoch '
        'must produce at least one metric for the best-checkpoint '
        'manager (a checkpoint-flush-only run should set eval_steps>=1).'
    )

  if mesh is None:
    mesh = mesh_lib.make_mesh()
  module = model_lib.AlignmentGraphNetwork(
      num_frames=config.num_frames,
      width=config.width,
      num_layers=config.num_layers,
      k=config.k,
  )
  state = create_state(config, mesh)

  @functools.partial(jax.jit, donate_argnums=(0,))
  def train_step(state: TrainState, batch):
    grad_fn = jax.value_and_grad(
        lambda p: _loss(module, p, batch, config.local_loss_weight),
        has_aux=True,
    )
    (_, metrics), grads = grad_fn(state.params)
    return state.apply_gradients(grads=grads), metrics

  @jax.jit
  def eval_step(state: TrainState, batch):
    _, metrics = _loss(module, state.params, batch, 0.0)
    return metrics

  manager = ocp.CheckpointManager(
      os.path.abspath(os.path.join(config.workdir, 'checkpoints')),
      options=ocp.CheckpointManagerOptions(
          max_to_keep=3,
          best_fn=lambda m: -m['drift_error'],
          best_mode='max',
      ),
  )
  start_epoch = 0
  latest = manager.latest_step()
  if latest is not None:
    state = manager.restore(latest, args=ocp.args.StandardRestore(state))
    start_epoch = latest + 1

  # Per-process generated-data shards + global batch assembly; see
  # parallel/mesh.py (multi-process support).
  local_batch = mesh_lib.process_local_batch_size(config.batch_size)
  from putting_dune_tpu.io import datasets as datasets_lib

  def synthetic_eval_iter():
    return data_lib.dataset_iterator(
        mesh_lib.process_data_seed(config.seed + 1),
        batch_size=local_batch,
        num_frames=config.num_frames,
        capacity=config.capacity,
        grid_columns=config.grid_columns,
    )

  records_dir = datasets_lib.parse_data_source(config.data_source)
  if records_dir is not None:
    train_iter = data_lib.records_dataset_iterator(
        records_dir, config.seed, batch_size=local_batch, split='train'
    )
    # Eval uses the dataset's test/ split when present; a dataset written
    # without one falls back to the synthetic eval stream instead of
    # failing at startup.
    try:
      eval_iter = data_lib.records_dataset_iterator(
          records_dir, config.seed + 1, batch_size=local_batch, split='test'
      )
    except FileNotFoundError:
      eval_iter = synthetic_eval_iter()
  else:
    train_iter = data_lib.dataset_iterator(
        mesh_lib.process_data_seed(config.seed),
        batch_size=local_batch,
        num_frames=config.num_frames,
        capacity=config.capacity,
        grid_columns=config.grid_columns,
    )
    eval_iter = synthetic_eval_iter()
  for epoch in range(start_epoch, config.epochs):
    if stop_fn is not None and stop_fn():
      break  # budget/stop hook; orbax still flushes below.
    for _ in range(config.steps_per_epoch):
      batch = mesh_lib.global_batch(next(train_iter), mesh)
      state, metrics = train_step(state, batch)
    evals = []
    for _ in range(config.eval_steps):
      batch = mesh_lib.global_batch(next(eval_iter), mesh)
      evals.append(eval_step(state, batch))
    if evals:
      summary = {
          k: float(np.mean([jax.device_get(e[k]) for e in evals]))
          for k in evals[0]
      }
    else:
      # eval_steps=0: the best-checkpoint metric falls back to the last
      # train-step metrics rather than indexing an empty eval list.
      summary = {
          k: float(jax.device_get(v)) for k, v in metrics.items()
      }
    manager.save(epoch, args=ocp.args.StandardSave(state), metrics=summary)
    if progress is not None:
      progress(epoch, summary)
  manager.wait_until_finished()
  return state


def save_params_msgpack(params, workdir: str) -> str:
  """Writes a params-only artifact (what ships under model_weights)."""
  import flax.serialization

  path = os.path.join(workdir, 'params.msgpack')
  with open(path, 'wb') as f:
    f.write(flax.serialization.to_bytes(jax.device_get(params)))
  return path


def load_params(workdir: str, config: Optional[Config] = None):
  """Restores params: params.msgpack if present, else best orbax ckpt."""
  import orbax.checkpoint as ocp

  if config is None:
    config = Config(workdir=workdir)
  msgpack_path = os.path.join(workdir, 'params.msgpack')
  if os.path.exists(msgpack_path):
    import flax.serialization

    state = create_state(config)
    with open(msgpack_path, 'rb') as f:
      return flax.serialization.from_bytes(state.params, f.read())
  manager = ocp.CheckpointManager(
      os.path.abspath(os.path.join(workdir, 'checkpoints')),
      options=ocp.CheckpointManagerOptions(
          best_fn=lambda m: -m['drift_error'], best_mode='max'
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
      'Train the GNN point-cloud aligner (single-host or multi-process; '
      'reference graph_alignment/train.py).',
  )
