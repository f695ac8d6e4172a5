"""Image-alignment training: CE + weighted drift-MSE, mesh data parallel.

Parity: reference image_alignment/train.py:106-199 (joint loss with
final-step-only option) and :346-391 (sharded train state + batch
sharding; the reference's multihost_utils global-array plumbing reduces to
NamedSharding placement under GSPMD).
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

from putting_dune_tpu.image_alignment import data as data_lib
from putting_dune_tpu.image_alignment import model as model_lib
from putting_dune_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class Config:
  workdir: str
  seed: int = 0
  learning_rate: float = 1e-3
  batch_size: int = 32
  epochs: int = 1000
  steps_per_epoch: int = 100
  eval_steps: int = 20
  image_size: int = 128
  num_frames: int = 5
  features: tuple = (32, 64, 128, 256)
  drift_loss_weight: float = 1.0
  final_step_only: bool = False
  grid_columns: int = 50
  noisy_images: bool = False
  # When set, the TRAIN stream mixes fully-noisy frame stacks in with
  # this per-batch probability (eval keeps noisy_images) — robustness
  # training for the real-microscope distribution.
  noisy_fraction: Optional[float] = None
  # > 0 switches data gen to the inference-matched protocol: history
  # frames registered up to this claim residual (angstroms) with
  # pad_and_crop border emulation; labels = per-frame truth-minus-claim.
  registration_noise: float = 0.0
  # Mirror ImageAligner.__call__'s CLAHE + min-max preprocessing in the
  # training frames (the renderer already CLAHEs once; inference does it
  # twice).
  inference_preprocessing: bool = False
  # Fraction of registration-mode samples emulating the self-seeded first
  # window (history = identical copies of frame 0).
  seed_fraction: float = 0.0
  # Warm-start params from this workdir (params.msgpack / best orbax ckpt)
  # when the run has no orbax checkpoint of its own yet.
  init_params_from: str = ''
  # 'synthetic' (default): on-device generated stacks. 'records:<dir>':
  # a materialized TFRecord dataset (data.write_dataset, or REAL labeled
  # microscope data via data.examples_from_labeled_trajectory), with
  # per-process example sharding — the reference's grain/TFDS loader path
  # (image_alignment/dataset.py:127-147). Eval uses the dataset's test/
  # split when present.
  data_source: str = 'synthetic'
  # Weight on the per-frame segmentation CE head. Set to 0 when training
  # on real labeled trajectories (they carry drift labels but no
  # segmentation masks).
  ce_loss_weight: float = 1.0


class TrainState(train_state.TrainState):
  pass


def _losses(state_apply, params, batch, num_frames, final_step_only):
  logits, pred_drift = state_apply({'params': params}, batch['images'])
  b, h, w, _ = logits.shape
  logits = logits.reshape(b, h, w, num_frames, 3)
  mask = batch['mask'].reshape(b, h, w, num_frames, 3)
  ce = jnp.mean(optax.softmax_cross_entropy(logits, mask))
  accuracy = jnp.mean(
      jnp.argmax(logits, -1) == jnp.argmax(mask, -1)
  )

  pred_drift = pred_drift.reshape(batch['drift'].shape)
  drift_sq = jnp.square(batch['drift'] - pred_drift).sum(-1)  # (B, T)
  drift_err = jnp.linalg.norm(batch['drift'] - pred_drift, axis=-1)
  if final_step_only:
    drift_loss = jnp.mean(drift_sq[..., -1])
    drift_error = jnp.mean(drift_err[..., -1])
  else:
    drift_loss = jnp.mean(drift_sq)
    drift_error = jnp.mean(drift_err)
  return ce, accuracy, drift_loss, drift_error


@functools.partial(
    jax.jit,
    static_argnames=('num_frames', 'final_step_only'),
    donate_argnums=(0,),
)
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    drift_loss_weight: float,
    num_frames: int,
    final_step_only: bool,
    ce_loss_weight: float = 1.0,
):
  def loss_fn(params):
    ce, accuracy, drift_loss, drift_error = _losses(
        state.apply_fn, params, batch, num_frames, final_step_only
    )
    total = ce_loss_weight * ce + drift_loss_weight * drift_loss
    return total, {
        'loss': total,
        'ce': ce,
        'accuracy': accuracy,
        'drift_loss': drift_loss,
        'drift_error': drift_error,
    }

  (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
      state.params
  )
  state = state.apply_gradients(grads=grads)
  return state, metrics


@functools.partial(
    jax.jit, static_argnames=('num_frames', 'final_step_only')
)
def eval_step(state, batch, num_frames, final_step_only):
  ce, accuracy, drift_loss, drift_error = _losses(
      state.apply_fn, state.params, batch, num_frames, final_step_only
  )
  return {
      'ce': ce,
      'accuracy': accuracy,
      'drift_loss': drift_loss,
      'drift_error': drift_error,
  }


def create_state(config: Config, mesh=None) -> TrainState:
  module = model_lib.GlobalLocalUNet(
      local_output_size=3 * config.num_frames,
      global_output_size=2 * config.num_frames,
      features=tuple(config.features),
  )
  params = module.init(
      jax.random.PRNGKey(config.seed),
      jnp.zeros(
          (1, config.image_size, config.image_size, config.num_frames)
      ),
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
  state = create_state(config, mesh)
  if config.init_params_from:
    state = state.replace(
        params=jax.device_put(
            load_params(config.init_params_from),
            mesh_lib.replicated_sharding(mesh),
        )
    )

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
  # parallel/mesh.py (multi-process support). Single-process this is the
  # plain shard_batch path.
  local_batch = mesh_lib.process_local_batch_size(config.batch_size)
  from putting_dune_tpu.io import datasets as datasets_lib

  def synthetic_eval_iter():
    return data_lib.dataset_iterator(
        mesh_lib.process_data_seed(config.seed + 1),
        batch_size=local_batch,
        image_size=config.image_size,
        num_frames=config.num_frames,
        grid_columns=config.grid_columns,
        noisy=config.noisy_images,
        registration_noise=config.registration_noise,
        inference_preprocessing=config.inference_preprocessing,
        seed_fraction=config.seed_fraction,
    )

  records_dir = datasets_lib.parse_data_source(config.data_source)
  if records_dir is not None:
    train_iter = data_lib.records_dataset_iterator(
        records_dir, config.seed, batch_size=local_batch, split='train'
    )
    # Eval uses the dataset's test/ split when present; a dataset written
    # without one (write_dataset test_examples=0) falls back to the
    # synthetic eval stream instead of failing at startup.
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
        image_size=config.image_size,
        num_frames=config.num_frames,
        grid_columns=config.grid_columns,
        noisy=config.noisy_images,
        noisy_fraction=config.noisy_fraction,
        registration_noise=config.registration_noise,
        inference_preprocessing=config.inference_preprocessing,
        seed_fraction=config.seed_fraction,
    )
    eval_iter = synthetic_eval_iter()

  for epoch in range(start_epoch, config.epochs):
    if stop_fn is not None and stop_fn():
      break  # budget/stop hook; orbax still flushes below.
    for _ in range(config.steps_per_epoch):
      batch = mesh_lib.global_batch(next(train_iter), mesh)
      state, metrics = train_step(
          state,
          batch,
          config.drift_loss_weight,
          config.num_frames,
          config.final_step_only,
          config.ce_loss_weight,
      )
    evals = []
    for _ in range(config.eval_steps):
      batch = mesh_lib.global_batch(next(eval_iter), mesh)
      evals.append(
          eval_step(state, batch, config.num_frames, config.final_step_only)
      )
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


def save_params_msgpack(
    params, workdir: str, config: Optional[Config] = None
) -> str:
  """Writes a params-only artifact (what ships under model_weights).

  With config, an arch.json sidecar records the feature pyramid and frame
  count so loaders reconstruct non-default architectures (same mechanism
  as atom_detection.train.save_params_msgpack).
  """
  import flax.serialization

  path = os.path.join(workdir, 'params.msgpack')
  with open(path, 'wb') as f:
    f.write(flax.serialization.to_bytes(jax.device_get(params)))
  if config is not None:
    import json

    with open(os.path.join(workdir, 'arch.json'), 'w') as f:
      json.dump(
          {'features': list(config.features),
           'num_frames': config.num_frames,
           'image_size': config.image_size},
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
  """Restores params: params.msgpack if present, else best orbax ckpt."""
  import orbax.checkpoint as ocp

  if config is None:
    config = Config(workdir=workdir)
  arch = load_arch(workdir)
  if arch is not None:
    updates = {}
    if tuple(arch['features']) != tuple(config.features):
      updates['features'] = tuple(arch['features'])
    frames = int(arch.get('num_frames', config.num_frames))
    if frames != config.num_frames:
      updates['num_frames'] = frames
    if updates:
      config = dataclasses.replace(config, **updates)
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
      'Train the image-alignment drift network (single-host or '
      'multi-process; reference image_alignment/train.py).',
  )
