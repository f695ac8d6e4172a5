"""Reference-scale UNet capacity experiment for atom detection.

The shipped detector (92.0% pixel acc) uses a half-width 4-level UNet
(features 32..256) and has PLATEAUED under continued training (+0.05%
over 40 warm-started epochs) — it is capacity-limited, not budget-
limited. This trains the REFERENCE-default architecture (features
64..1024, atom_detection/model.py:38-85 in /root/reference) under the
same protocol. Checkpoints to its own workdir; ship manually via
runs/ship_detector.py if the eval accuracy clearly beats the incumbent.

Usage: python runs/train_detector_large.py [budget_seconds] [batch]
"""

import json
import os
import sys
import time

from putting_dune_tpu.atom_detection import train as det_train

WORKDIR = 'runs/detector_large_wd'


def main() -> None:
  budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 9000.0
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
  config = det_train.Config(
      workdir=WORKDIR,
      image_size=256,
      batch_size=batch,
      epochs=1000,
      steps_per_epoch=100,
      eval_steps=10,
      noisy_images=False,
      class_weights=(0.2, 1.0, 10.0),
      learning_rate=1e-3,
      features=(64, 128, 256, 512, 1024),
      seed=3,
  )
  # Record the architecture in the workdir up front so downstream tools
  # (runs/ship_detector.py) resolve the candidate pyramid from the
  # sidecar instead of a hard-coded default.
  os.makedirs(WORKDIR, exist_ok=True)
  with open(os.path.join(WORKDIR, 'arch.json'), 'w') as f:
    json.dump(
        {'features': list(config.features),
         'image_size': config.image_size},
        f,
    )
  t0 = time.monotonic()
  best = {'accuracy': 0.0}

  def progress(epoch, summary):
    best['accuracy'] = max(best['accuracy'], summary['accuracy'])
    print(
        f'large epoch {epoch}: acc={summary["accuracy"]:.4f} '
        f'best={best["accuracy"]:.4f} loss={summary["loss"]:.4f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  det_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )
  print(f'done; best eval accuracy {best["accuracy"]:.4f}', flush=True)


if __name__ == '__main__':
  main()
