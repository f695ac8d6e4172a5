"""Warm-started image-aligner continuation (ship only if better).

Mirrors runs/train_detector_continue.py for the drift aligner: starts
from the shipped registration-protocol weights (0.126 A drift error at
ship time), continues under the SAME inference-matched protocol at a
fine-tune LR, and re-ships only if the best eval drift error beats the
warm-start baseline on the continuation eval stream.

Usage: python runs/train_aligner_continue.py [budget_seconds] [lr]
"""

import glob
import json
import os
import shutil
import sys
import time

import jax
import numpy as np

from putting_dune_tpu.image_alignment import data as data_lib
from putting_dune_tpu.image_alignment import train as align_train
from putting_dune_tpu.parallel import mesh as mesh_lib

WORKDIR = 'putting_dune_tpu/experiments/model_weights/image_aligner'


def baseline_drift_error(config) -> float:
  params = align_train.load_params(WORKDIR, config)
  mesh = mesh_lib.make_mesh()
  state = align_train.create_state(config, mesh)
  state = state.replace(
      params=jax.device_put(params, mesh_lib.replicated_sharding(mesh))
  )
  eval_iter = data_lib.dataset_iterator(
      mesh_lib.process_data_seed(config.seed + 1),
      batch_size=mesh_lib.process_local_batch_size(config.batch_size),
      image_size=config.image_size,
      num_frames=config.num_frames,
      grid_columns=config.grid_columns,
      noisy=config.noisy_images,
      registration_noise=config.registration_noise,
      inference_preprocessing=config.inference_preprocessing,
      seed_fraction=config.seed_fraction,
  )
  errs = []
  for _ in range(config.eval_steps):
    batch = mesh_lib.global_batch(next(eval_iter), mesh)
    errs.append(
        align_train.eval_step(
            state, batch, config.num_frames, config.final_step_only
        )['drift_error']
    )
  return float(np.mean(jax.device_get(errs)))


def retained_best_drift(workdir: str) -> float:
  """Best (lowest) drift error among retained orbax checkpoints."""
  errs = []
  for path in glob.glob(
      os.path.join(workdir, 'checkpoints/*/metrics/metrics')
  ):
    with open(path) as f:
      errs.append(json.load(f)['drift_error'])
  return min(errs) if errs else float('inf')


def main() -> None:
  budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0
  lr = float(sys.argv[2]) if len(sys.argv) > 2 else 3e-5
  arch = align_train.load_arch(WORKDIR)
  config = align_train.Config(
      workdir=WORKDIR,
      image_size=128,
      batch_size=32,
      epochs=2000,
      steps_per_epoch=100,
      eval_steps=10,
      registration_noise=0.35,
      inference_preprocessing=True,
      seed_fraction=0.25,
      learning_rate=lr,
      init_params_from=WORKDIR,
      seed=11,  # fresh data stream vs the shipped run
      **({'features': tuple(arch['features'])} if arch else {}),
  )
  base = baseline_drift_error(config)
  print(f'warm-start baseline drift error: {base:.4f} A', flush=True)

  t0 = time.monotonic()

  def progress(epoch, summary):
    print(
        f'aligner epoch {epoch}: drift={summary["drift_error"]:.4f} '
        f'acc={summary["accuracy"]:.3f} ({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  align_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )

  retained = retained_best_drift(WORKDIR)
  if retained >= base:
    print(
        f'no improvement ({retained:.4f} >= {base:.4f}); keeping the '
        f'shipped artifact', flush=True,
    )
    shutil.rmtree(f'{WORKDIR}/checkpoints', ignore_errors=True)
    return

  stale = os.path.join(WORKDIR, 'params.msgpack')
  if os.path.exists(stale):
    os.remove(stale)
  params = align_train.load_params(WORKDIR, config)
  path = align_train.save_params_msgpack(params, WORKDIR, config=config)
  print(
      f'shipped {path} (drift {retained:.4f} A, baseline {base:.4f} A)',
      flush=True,
  )
  shutil.rmtree(f'{WORKDIR}/checkpoints', ignore_errors=True)


if __name__ == '__main__':
  main()
