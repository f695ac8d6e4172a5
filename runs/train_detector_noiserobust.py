"""Noise-robustness fine-tune of the shipped detector (gated ship).

The shipped detector is trained on clean renders; its accuracy on fully
noisy frames (the distribution the real-microscope inference path sees)
trails its clean accuracy by ~13 points. This warm-starts from the
shipped artifact and fine-tunes on a MIXED stream (noisy_fraction of
batches fully noisy, rest clean) while the eval stream — and hence
orbax best-checkpoint selection — is fully noisy.

Ship gate (two metrics, evaluated head-to-head on fresh streams):
  - noisy accuracy must IMPROVE by > 0.005 over the incumbent, and
  - clean accuracy must stay within 0.003 of the incumbent.
bf16 cast adopted only when it keeps both conditions.

Usage: python runs/train_detector_noiserobust.py [budget_s] [frac] [lr]
"""

import functools
import sys
import time

from putting_dune_tpu.atom_detection import train as det_train

try:
  from runs import ship_lib
  from runs.ship_detector import INCUMBENT, eval_accuracy
except ImportError:  # run as `python runs/train_detector_noiserobust.py`
  import ship_lib
  from ship_detector import INCUMBENT, eval_accuracy

WORKDIR = 'runs/detector_noise_wd'


def main() -> None:
  budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 7200.0
  frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
  lr = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4

  arch = det_train.load_arch(INCUMBENT)
  features = tuple(arch['features']) if arch else (32, 64, 128, 256)
  config = det_train.Config(
      workdir=WORKDIR,
      image_size=256,
      batch_size=32,
      epochs=1000,
      steps_per_epoch=100,
      eval_steps=10,
      noisy_images=True,  # eval (and best-ckpt selection) on noisy frames
      noisy_fraction=frac,  # train stream: mixed
      class_weights=(0.2, 1.0, 10.0),
      learning_rate=lr,
      features=features,
      init_params_from=INCUMBENT,
      seed=13,
  )

  eval_steps = 20
  inc_clean = eval_accuracy(INCUMBENT, features, eval_steps)
  inc_noisy = eval_accuracy(INCUMBENT, features, eval_steps, noisy=True)
  print(
      f'incumbent {features}: clean {inc_clean:.4f} noisy {inc_noisy:.4f}',
      flush=True,
  )

  t0 = time.monotonic()
  best = {'accuracy': 0.0}

  def progress(epoch, summary):
    best['accuracy'] = max(best['accuracy'], summary['accuracy'])
    print(
        f'noiserobust epoch {epoch}: noisy_acc={summary["accuracy"]:.4f} '
        f'best={best["accuracy"]:.4f} loss={summary["loss"]:.4f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  det_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )

  cand_params = det_train.load_params(WORKDIR, config)
  # Head-to-head on fresh streams via a params-only probe dir (the
  # workdir's orbax checkpoints would shadow params.msgpack).
  import os
  import shutil

  probe = os.path.join(WORKDIR, '_gate_probe')
  os.makedirs(probe, exist_ok=True)
  try:
    det_train.save_params_msgpack(cand_params, probe)
    cand_clean = eval_accuracy(probe, features, eval_steps)
    cand_noisy = eval_accuracy(probe, features, eval_steps, noisy=True)
  finally:
    shutil.rmtree(probe, ignore_errors=True)
  print(
      f'candidate: clean {cand_clean:.4f} noisy {cand_noisy:.4f}',
      flush=True,
  )

  def gate(clean, noisy):
    return noisy > inc_noisy + 0.005 and clean >= inc_clean - 0.003

  if not gate(cand_clean, cand_noisy):
    print('gate failed; keeping the shipped artifact', flush=True)
    return

  bf16, bf16_noisy = ship_lib.probe_bf16(
      cand_params, WORKDIR, det_train.save_params_msgpack,
      lambda wd: eval_accuracy(wd, features, eval_steps, noisy=True),
  )
  # The clean side of the bf16 gate needs its own probe eval.
  bf16_clean = None
  if bf16_noisy >= cand_noisy - 0.001:
    _, bf16_clean = ship_lib.probe_bf16(
        cand_params, WORKDIR, det_train.save_params_msgpack,
        lambda wd: eval_accuracy(wd, features, eval_steps),
    )
    print(
        f'candidate bf16 cast: clean {bf16_clean:.4f} noisy {bf16_noisy:.4f}',
        flush=True,
    )
    if gate(bf16_clean, bf16_noisy):
      cand_params, cand_clean, cand_noisy = bf16, bf16_clean, bf16_noisy

  shipped_config = det_train.Config(
      workdir=INCUMBENT, image_size=256, features=features
  )
  path = ship_lib.ship(
      cand_params, INCUMBENT,
      functools.partial(det_train.save_params_msgpack, config=shipped_config),
  )
  print(
      f'shipped {path} (clean {cand_clean:.4f} vs {inc_clean:.4f}, '
      f'noisy {cand_noisy:.4f} vs {inc_noisy:.4f})',
      flush=True,
  )
  shutil.rmtree(f'{WORKDIR}/checkpoints', ignore_errors=True)


if __name__ == '__main__':
  main()
