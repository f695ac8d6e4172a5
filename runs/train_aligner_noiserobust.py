"""Noise-robustness fine-tune of the shipped image aligner (gated ship).

Mirror of runs/train_detector_noiserobust.py for the drift aligner: the
shipped artifact's drift error on fully noisy frames (~0.20 A) is ~3x
its clean-frame error (~0.065 A). Warm-starts from the shipped weights,
fine-tunes on a MIXED stream under the inference-matched registration
protocol while the eval stream — and orbax best-checkpoint selection —
is fully noisy.

Ship gate (two metrics, head-to-head on fresh streams):
  - noisy drift must IMPROVE by > 5% over the incumbent, and
  - clean drift must stay within 5% of the incumbent.
bf16 cast adopted only when it keeps both conditions.

Usage: python runs/train_aligner_noiserobust.py [budget_s] [frac] [lr]
"""

import functools
import os
import shutil
import sys
import time

from putting_dune_tpu.image_alignment import train as align_train

try:
  from runs import ship_lib
  from runs.ship_aligner import INCUMBENT, eval_drift
except ImportError:  # run as `python runs/train_aligner_noiserobust.py`
  import ship_lib
  from ship_aligner import INCUMBENT, eval_drift

WORKDIR = 'runs/aligner_noise_wd'


def main() -> None:
  budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 5400.0
  frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
  lr = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4

  arch = align_train.load_arch(INCUMBENT)
  features = tuple(arch['features']) if arch else (32, 64, 128, 256)
  config = align_train.Config(
      workdir=WORKDIR,
      image_size=128,
      batch_size=32,
      epochs=2000,
      steps_per_epoch=100,
      eval_steps=10,
      noisy_images=True,  # eval (and best-ckpt selection) on noisy frames
      noisy_fraction=frac,  # train stream: mixed
      registration_noise=0.35,
      inference_preprocessing=True,
      seed_fraction=0.25,
      learning_rate=lr,
      features=features,
      init_params_from=INCUMBENT,
      seed=19,
  )

  eval_steps = 20
  inc_clean = eval_drift(INCUMBENT, features, eval_steps)
  inc_noisy = eval_drift(INCUMBENT, features, eval_steps, noisy=True)
  print(
      f'incumbent {features}: clean {inc_clean:.4f} A '
      f'noisy {inc_noisy:.4f} A', flush=True,
  )

  t0 = time.monotonic()
  best = {'drift': float('inf')}

  def progress(epoch, summary):
    best['drift'] = min(best['drift'], summary['drift_error'])
    print(
        f'noiserobust epoch {epoch}: noisy_drift={summary["drift_error"]:.4f} '
        f'best={best["drift"]:.4f} acc={summary["accuracy"]:.3f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  align_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )

  cand_params = align_train.load_params(WORKDIR, config)
  probe = os.path.join(WORKDIR, '_gate_probe')
  os.makedirs(probe, exist_ok=True)
  try:
    align_train.save_params_msgpack(cand_params, probe)
    cand_clean = eval_drift(probe, features, eval_steps)
    cand_noisy = eval_drift(probe, features, eval_steps, noisy=True)
  finally:
    shutil.rmtree(probe, ignore_errors=True)
  print(
      f'candidate: clean {cand_clean:.4f} A noisy {cand_noisy:.4f} A',
      flush=True,
  )

  def gate(clean, noisy):
    return noisy < 0.95 * inc_noisy and clean <= 1.05 * inc_clean

  if not gate(cand_clean, cand_noisy):
    print('gate failed; keeping the shipped artifact', flush=True)
    return

  bf16, bf16_noisy = ship_lib.probe_bf16(
      cand_params, WORKDIR, align_train.save_params_msgpack,
      lambda wd: eval_drift(wd, features, eval_steps, noisy=True),
  )
  if bf16_noisy <= cand_noisy * 1.02:
    _, bf16_clean = ship_lib.probe_bf16(
        cand_params, WORKDIR, align_train.save_params_msgpack,
        lambda wd: eval_drift(wd, features, eval_steps),
    )
    print(
        f'candidate bf16 cast: clean {bf16_clean:.4f} A '
        f'noisy {bf16_noisy:.4f} A', flush=True,
    )
    if gate(bf16_clean, bf16_noisy):
      cand_params, cand_clean, cand_noisy = bf16, bf16_clean, bf16_noisy

  shipped_config = align_train.Config(
      workdir=INCUMBENT, image_size=128, features=features
  )
  path = ship_lib.ship(
      cand_params, INCUMBENT,
      functools.partial(
          align_train.save_params_msgpack, config=shipped_config
      ),
  )
  print(
      f'shipped {path} (clean {cand_clean:.4f} vs {inc_clean:.4f} A, '
      f'noisy {cand_noisy:.4f} vs {inc_noisy:.4f} A)', flush=True,
  )
  shutil.rmtree(f'{WORKDIR}/checkpoints', ignore_errors=True)


if __name__ == '__main__':
  main()
