"""Ships the better of (incumbent, candidate workdir) as the image aligner.

Head-to-head eval drift error on the same fresh registration-protocol
stream; copies the winner's params + arch.json into
experiments/model_weights/image_aligner when the candidate wins.

Usage: python runs/ship_aligner.py [candidate_workdir] [eval_steps]
"""

import functools
import sys

import jax
import numpy as np

from putting_dune_tpu.image_alignment import data as data_lib
from putting_dune_tpu.image_alignment import train as align_train
from putting_dune_tpu.parallel import mesh as mesh_lib
try:
  from runs import ship_lib
except ImportError:  # run as `python runs/ship_X.py` without PYTHONPATH
  import ship_lib

INCUMBENT = 'putting_dune_tpu/experiments/model_weights/image_aligner'


def eval_drift(workdir: str, features, eval_steps: int, batch: int = 32,
               seed: int = 4321, noisy: bool = False) -> float:
  config = align_train.Config(
      workdir=workdir, image_size=128, batch_size=batch,
      features=tuple(features), noisy_images=noisy,
      registration_noise=0.35, inference_preprocessing=True,
      seed_fraction=0.25,
  )
  params = align_train.load_params(workdir, config)
  mesh = mesh_lib.make_mesh()
  state = align_train.create_state(config, mesh)
  state = state.replace(
      params=jax.device_put(params, mesh_lib.replicated_sharding(mesh))
  )
  it = data_lib.dataset_iterator(
      seed, batch_size=batch, image_size=128,
      num_frames=config.num_frames, grid_columns=config.grid_columns,
      noisy=config.noisy_images, registration_noise=0.35,
      inference_preprocessing=True, seed_fraction=0.25,
  )
  errs = []
  for _ in range(eval_steps):
    b = mesh_lib.global_batch(next(it), mesh)
    errs.append(
        align_train.eval_step(
            state, b, config.num_frames, config.final_step_only
        )['drift_error']
    )
  return float(np.mean(jax.device_get(errs)))


def main() -> None:
  candidate = sys.argv[1] if len(sys.argv) > 1 else 'runs/aligner_large_wd'
  eval_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

  inc_arch = align_train.load_arch(INCUMBENT)
  inc_features = tuple(
      inc_arch['features']) if inc_arch else (32, 64, 128, 256)
  cand_arch = align_train.load_arch(candidate)
  cand_features = tuple(
      cand_arch['features']) if cand_arch else (64, 128, 256, 512)

  inc = eval_drift(INCUMBENT, inc_features, eval_steps)
  cand = eval_drift(candidate, cand_features, eval_steps)
  print(f'incumbent {inc_features}: {inc:.4f} A', flush=True)
  print(f'candidate {cand_features}: {cand:.4f} A', flush=True)
  # Robustness (informational): drift error on fully noisy renders, the
  # distribution the real-microscope inference path actually sees.
  inc_noisy = eval_drift(
      INCUMBENT, inc_features, max(eval_steps // 2, 1), noisy=True
  )
  cand_noisy = eval_drift(
      candidate, cand_features, max(eval_steps // 2, 1), noisy=True
  )
  print(f'noisy-frame drift: incumbent {inc_noisy:.4f} A '
        f'candidate {cand_noisy:.4f} A', flush=True)

  if cand >= inc:
    print('incumbent wins; not shipping', flush=True)
    return

  config = align_train.Config(
      workdir=candidate, image_size=128, features=cand_features
  )
  params = align_train.load_params(candidate, config)

  # Ship bf16 weights when the cast is drift-neutral (halves the blob).
  # Adopt the cast only if it is BOTH drift-neutral vs the f32 candidate
  # AND still beats the incumbent (a neutral cast of a narrow win could
  # otherwise ship a regression).
  bf16, bf16_drift = ship_lib.probe_bf16(
      params, candidate, align_train.save_params_msgpack,
      lambda wd: eval_drift(wd, cand_features, eval_steps),
  )
  print(f'candidate bf16 cast: {bf16_drift:.4f} A', flush=True)
  if bf16_drift <= cand * 1.02 and bf16_drift < inc:
    params, cand = bf16, bf16_drift

  shipped_config = align_train.Config(
      workdir=INCUMBENT, image_size=128, features=cand_features
  )
  path = ship_lib.ship(
      params, INCUMBENT,
      functools.partial(
          align_train.save_params_msgpack, config=shipped_config
      ),
  )
  print(f'shipped {path} ({cand:.4f} vs {inc:.4f} A)', flush=True)


if __name__ == '__main__':
  main()
