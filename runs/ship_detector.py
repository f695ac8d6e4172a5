"""Ships the better of (incumbent, candidate workdir) as the atom detector.

Evaluates BOTH models on the SAME fresh eval stream (seed disjoint from
either training run), then copies the winner's params + arch.json into
experiments/model_weights/atom_detector. Prints the head-to-head numbers
either way; does nothing if the incumbent wins.

Usage: python runs/ship_detector.py [candidate_workdir] [eval_steps]
"""

import functools
import sys

import jax
import numpy as np

from putting_dune_tpu.atom_detection import data as data_lib
from putting_dune_tpu.atom_detection import train as det_train
from putting_dune_tpu.parallel import mesh as mesh_lib
try:
  from runs import ship_lib
except ImportError:  # run as `python runs/ship_X.py` without PYTHONPATH
  import ship_lib

INCUMBENT = 'putting_dune_tpu/experiments/model_weights/atom_detector'


def eval_accuracy(workdir: str, features, eval_steps: int, batch: int = 16,
                  seed: int = 1234, noisy: bool = False) -> float:
  config = det_train.Config(
      workdir=workdir, image_size=256, batch_size=batch,
      features=tuple(features),
  )
  params = det_train.load_params(workdir, config)
  mesh = mesh_lib.make_mesh()
  state = det_train.create_state(config, mesh)
  state = state.replace(
      params=jax.device_put(params, mesh_lib.replicated_sharding(mesh))
  )
  it = data_lib.dataset_iterator(
      seed, batch_size=batch, image_size=256, grid_columns=50, noisy=noisy
  )
  accs = []
  for _ in range(eval_steps):
    batch_data = mesh_lib.global_batch(next(it), mesh)
    accs.append(det_train.eval_step(state, batch_data))
  return float(np.mean(jax.device_get(accs)))


def main() -> None:
  candidate = sys.argv[1] if len(sys.argv) > 1 else 'runs/detector_large_wd'
  eval_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

  inc_arch = det_train.load_arch(INCUMBENT)
  inc_features = tuple(
      inc_arch['features']) if inc_arch else (32, 64, 128, 256)
  cand_arch = det_train.load_arch(candidate)
  cand_features = tuple(
      cand_arch['features']) if cand_arch else (64, 128, 256, 512, 1024)

  inc_acc = eval_accuracy(INCUMBENT, inc_features, eval_steps)
  cand_acc = eval_accuracy(candidate, cand_features, eval_steps)
  print(f'incumbent {inc_features}: {inc_acc:.4f}', flush=True)
  print(f'candidate {cand_features}: {cand_acc:.4f}', flush=True)
  # Robustness (informational): accuracy on fully noisy renders, the
  # distribution the real-microscope inference path actually sees.
  inc_noisy = eval_accuracy(
      INCUMBENT, inc_features, max(eval_steps // 2, 1), noisy=True
  )
  cand_noisy = eval_accuracy(
      candidate, cand_features, max(eval_steps // 2, 1), noisy=True
  )
  print(f'noisy-frame accuracy: incumbent {inc_noisy:.4f} '
        f'candidate {cand_noisy:.4f}', flush=True)

  if cand_acc <= inc_acc:
    print('incumbent wins; not shipping', flush=True)
    return

  config = det_train.Config(
      workdir=candidate, image_size=256, features=cand_features
  )
  params = det_train.load_params(candidate, config)

  # Half the artifact (the 64..1024 net is ~74 MB f32): ship bf16 weights
  # when the cast is accuracy-neutral on the same eval stream. Adopt the
  # cast only if it is BOTH accuracy-neutral vs the f32 candidate AND
  # still beats the incumbent.
  bf16, bf16_acc = ship_lib.probe_bf16(
      params, candidate, det_train.save_params_msgpack,
      lambda wd: eval_accuracy(wd, cand_features, eval_steps),
  )
  print(f'candidate bf16 cast: {bf16_acc:.4f}', flush=True)
  if bf16_acc >= cand_acc - 0.001 and bf16_acc > inc_acc:
    params, cand_acc = bf16, bf16_acc

  shipped_config = det_train.Config(
      workdir=INCUMBENT, image_size=256, features=cand_features
  )
  path = ship_lib.ship(
      params, INCUMBENT,
      functools.partial(
          det_train.save_params_msgpack, config=shipped_config
      ),
  )
  print(f'shipped {path} ({cand_acc:.4f} vs {inc_acc:.4f})', flush=True)


if __name__ == '__main__':
  main()
