"""Reference-scale GlobalLocalUNet capacity experiment for the aligner.

Same rationale as runs/train_detector_large.py: the shipped drift
aligner (0.126 A) uses a half-width 32..256 UNet; the reference's
image-alignment UNet is 64..1024. Trains the wider net from scratch
under the inference-matched registration protocol; ship manually via
runs/ship_aligner.py if the eval drift error clearly beats the incumbent.

Usage: python runs/train_aligner_large.py [budget_seconds] [batch]
"""

import json
import os
import sys
import time

from putting_dune_tpu.image_alignment import train as align_train

WORKDIR = 'runs/aligner_large_wd'


def main() -> None:
  budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 5400.0
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
  config = align_train.Config(
      workdir=WORKDIR,
      image_size=128,
      batch_size=batch,
      epochs=2000,
      steps_per_epoch=100,
      eval_steps=10,
      registration_noise=0.35,
      inference_preprocessing=True,
      seed_fraction=0.25,
      learning_rate=1e-3,
      features=(64, 128, 256, 512),
      seed=5,
  )
  # Record the architecture in the workdir up front so downstream tools
  # (runs/ship_aligner.py) resolve the candidate pyramid from the sidecar
  # instead of a hard-coded default.
  os.makedirs(WORKDIR, exist_ok=True)
  with open(os.path.join(WORKDIR, 'arch.json'), 'w') as f:
    json.dump(
        {'features': list(config.features),
         'num_frames': config.num_frames,
         'image_size': config.image_size},
        f,
    )
  t0 = time.monotonic()
  best = {'drift': float('inf')}

  def progress(epoch, summary):
    best['drift'] = min(best['drift'], summary['drift_error'])
    print(
        f'aligner-large epoch {epoch}: drift={summary["drift_error"]:.4f} '
        f'best={best["drift"]:.4f} acc={summary["accuracy"]:.3f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  align_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )
  print(f'done; best drift {best["drift"]:.4f} A', flush=True)


if __name__ == '__main__':
  main()
