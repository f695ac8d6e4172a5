"""Coarse hyperparameter sweep for the GNN aligner (round 2).

Runs on the 8-virtual-device CPU mesh (parallel-safe next to a TPU job):
    PYTHONPATH= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python runs/sweep_graph_aligner.py [per_config_budget_s]

Each config trains under a wall budget and reports its best eval
drift_error; the winner feeds the production TPU run in
runs/train_perception2.py.
"""

import dataclasses
import shutil
import sys
import time

from putting_dune_tpu.graph_alignment import train as graph_train

BASE = dict(
    learning_rate=1e-3, width=64, num_layers=3, k=8,
    local_loss_weight=0.0, batch_size=16,
)
SWEEP = [
    {},
    {'learning_rate': 3e-4},
    {'learning_rate': 3e-3},
    {'width': 128},
    {'num_layers': 4},
    {'k': 12},
    {'local_loss_weight': 0.01},
    {'width': 128, 'learning_rate': 3e-4},
]


def run_one(overrides, budget_s: float) -> float:
  name = '_'.join(f'{k}={v}' for k, v in overrides.items()) or 'base'
  workdir = f'/tmp/graph_sweep/{name}'
  shutil.rmtree(workdir, ignore_errors=True)
  config = graph_train.Config(
      workdir=workdir,
      epochs=10_000,  # budget-limited, not epoch-limited
      steps_per_epoch=50,
      eval_steps=10,
      **{**BASE, **overrides},
  )
  t0 = time.monotonic()
  best = [float('inf')]

  def progress(epoch, summary):
    best[0] = min(best[0], summary['drift_error'])
    print(
        f'  {name} epoch {epoch}: drift={summary["drift_error"]:.3f} '
        f'best={best[0]:.3f} ({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  graph_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )
  shutil.rmtree(workdir, ignore_errors=True)
  return best[0]


if __name__ == '__main__':
  budget = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
  results = {}
  for overrides in SWEEP:
    name = '_'.join(f'{k}={v}' for k, v in overrides.items()) or 'base'
    print(f'=== {name} ===', flush=True)
    results[name] = run_one(overrides, budget)
  print('\n=== sweep results (best eval drift_error, angstroms) ===')
  for name, drift in sorted(results.items(), key=lambda kv: kv[1]):
    print(f'  {drift:.3f}  {name}')
