"""Warm-started detector continuation toward the reference budget.

The shipped atom_detector artifact (91.4% pixel acc) only carries
params.msgpack — its orbax history was pruned at shipping time. This run
warm-starts from that artifact (Config.init_params_from), continues
training under the same protocol (256^2 clean frames, silicon-weighted
CE) at a lower fine-tune LR, and re-ships only if the best eval accuracy
beats the warm-start baseline.

Usage: python runs/train_detector_continue.py [budget_seconds]
"""

import os
import shutil
import sys
import time

import jax
import numpy as np

from putting_dune_tpu.atom_detection import data as data_lib
from putting_dune_tpu.atom_detection import train as det_train
from putting_dune_tpu.parallel import mesh as mesh_lib

WORKDIR = 'putting_dune_tpu/experiments/model_weights/atom_detector'


def baseline_accuracy(config) -> float:
  """Eval accuracy of the shipped params on the continuation eval stream."""
  params = det_train.load_params(WORKDIR, config)
  mesh = mesh_lib.make_mesh()
  state = det_train.create_state(config, mesh)
  state = state.replace(
      params=jax.device_put(params, mesh_lib.replicated_sharding(mesh))
  )
  eval_iter = data_lib.dataset_iterator(
      mesh_lib.process_data_seed(config.seed + 1),
      batch_size=mesh_lib.process_local_batch_size(config.batch_size),
      image_size=config.image_size,
      grid_columns=config.grid_columns,
      noisy=config.noisy_images,
  )
  accs = []
  for _ in range(config.eval_steps):
    batch = mesh_lib.global_batch(next(eval_iter), mesh)
    accs.append(det_train.eval_step(state, batch))
  return float(np.mean(jax.device_get(accs)))


def retained_best_accuracy(workdir: str) -> float:
  """Best eval accuracy among the orbax checkpoints retained in workdir,
  across ALL continuation segments (a restarted run must not discard an
  earlier segment's best)."""
  import glob
  import json

  accs = []
  for path in glob.glob(os.path.join(workdir, 'checkpoints/*/metrics/metrics')):
    with open(path) as f:
      accs.append(json.load(f)['accuracy'])
  return max(accs) if accs else float('-inf')


def main() -> None:
  budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 5100.0
  lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
  arch = det_train.load_arch(WORKDIR)
  config = det_train.Config(
      workdir=WORKDIR,
      image_size=256,
      batch_size=64,
      epochs=1000,
      steps_per_epoch=200,
      eval_steps=20,
      noisy_images=False,
      class_weights=(0.2, 1.0, 10.0),
      learning_rate=lr,  # fine-tune LR (fresh run used 1e-3)
      init_params_from=WORKDIR,
      seed=7,  # fresh data stream vs the shipped run's seed
      **({'features': tuple(arch['features'])} if arch else {}),
  )
  base = baseline_accuracy(config)
  print(f'warm-start baseline accuracy: {base:.4f}', flush=True)

  t0 = time.monotonic()
  best = {'accuracy': base}

  def progress(epoch, summary):
    if summary['accuracy'] > best['accuracy']:
      best['accuracy'] = summary['accuracy']
    print(
        f'detector epoch {epoch}: acc={summary["accuracy"]:.4f} '
        f'best={best["accuracy"]:.4f} ({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  det_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )

  retained = retained_best_accuracy(WORKDIR)
  if retained <= base:
    print(
        f'no improvement over baseline ({retained:.4f} <= '
        f'{base:.4f}); keeping the shipped artifact', flush=True,
    )
    shutil.rmtree(f'{WORKDIR}/checkpoints', ignore_errors=True)
    return

  # Ship the best checkpoint over the old artifact, then prune history.
  stale = os.path.join(WORKDIR, 'params.msgpack')
  if os.path.exists(stale):
    os.remove(stale)
  params = det_train.load_params(WORKDIR, config)
  path = det_train.save_params_msgpack(params, WORKDIR, config=config)
  print(
      f'shipped {path} (accuracy {retained:.4f}, '
      f'baseline {base:.4f})', flush=True,
  )
  shutil.rmtree(f'{WORKDIR}/checkpoints', ignore_errors=True)


if __name__ == '__main__':
  main()
