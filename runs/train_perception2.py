"""Round-2 production training for the perception stack on one TPU.

Order matters: the image aligner retrains FROM SCRATCH first (its drift
labels changed — the old convention zeroed the final-frame head, so the
shipped round-1 weights cannot correct live frames), then the detector
and GNN aligner continue toward bigger budgets. Every loop checkpoints
via orbax and ships a slim params.msgpack; interrupting and re-running
resumes.

Usage: python runs/train_perception2.py [aligner|detector|graph|all]
"""

import os
import shutil
import sys
import time

WEIGHTS = 'putting_dune_tpu/experiments/model_weights'


def _ship(train_mod, config, extra_markers=()) -> None:
  stale = os.path.join(config.workdir, 'params.msgpack')
  if os.path.exists(stale):
    os.remove(stale)
  params = train_mod.load_params(config.workdir, config)
  path = train_mod.save_params_msgpack(params, config.workdir)
  for marker in extra_markers:
    with open(os.path.join(config.workdir, marker), 'w') as f:
      f.write('1\n')
  print(f'shipped {path}', flush=True)
  shutil.rmtree(f'{config.workdir}/checkpoints', ignore_errors=True)


def train_aligner(budget_s: float = 5400.0) -> None:
  """Fresh retrain under the cumulative-drift labels."""
  from putting_dune_tpu.image_alignment import train as align_train

  workdir = f'{WEIGHTS}/image_aligner'
  marker = os.path.join(workdir, 'LABELS_CUMULATIVE')
  if not os.path.exists(marker):
    # Old-convention weights are unusable — clear the slate once.
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)

  config = align_train.Config(
      workdir=workdir,
      image_size=128,
      batch_size=32,
      epochs=400,
      steps_per_epoch=100,
      eval_steps=10,
  )
  t0 = time.monotonic()

  def progress(epoch, summary):
    print(
        f'aligner epoch {epoch}: drift={summary["drift_error"]:.3f} '
        f'acc={summary["accuracy"]:.3f} ({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  align_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )
  _ship(align_train, config, extra_markers=('LABELS_CUMULATIVE',))


def train_aligner_registration(budget_s: float = 2400.0) -> None:
  """Fine-tune under the inference-matched registration protocol.

  Starts from the shipped cumulative-label weights and adapts the model
  to what align_trajectories actually feeds it: pad-and-crop registered
  history (small claim residuals + zero borders), final-frame residual
  labels. Ships over the same workdir.
  """
  from putting_dune_tpu.image_alignment import train as align_train

  workdir = f'{WEIGHTS}/image_aligner'
  config = align_train.Config(
      workdir=workdir,
      image_size=128,
      batch_size=32,
      epochs=200,
      steps_per_epoch=100,
      eval_steps=10,
      registration_noise=0.35,
      inference_preprocessing=True,
      seed_fraction=0.25,
      init_params_from=workdir,
  )
  t0 = time.monotonic()

  def progress(epoch, summary):
    print(
        f'aligner-reg epoch {epoch}: drift={summary["drift_error"]:.3f} '
        f'acc={summary["accuracy"]:.3f} ({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  align_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )
  _ship(
      align_train, config,
      extra_markers=('LABELS_CUMULATIVE', 'REGISTRATION_TRAINED'),
  )


def train_detector(budget_s: float = 5400.0) -> None:
  from putting_dune_tpu.atom_detection import train as det_train

  config = det_train.Config(
      workdir=f'{WEIGHTS}/atom_detector',
      image_size=256,
      batch_size=64,
      epochs=400,
      steps_per_epoch=200,
      eval_steps=20,
      noisy_images=False,
      class_weights=(0.2, 1.0, 10.0),
  )
  t0 = time.monotonic()

  def progress(epoch, summary):
    print(
        f'detector epoch {epoch}: acc={summary["accuracy"]:.4f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  det_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )
  _ship(det_train, config)


def train_graph_aligner(budget_s: float = 3600.0) -> None:
  from putting_dune_tpu.graph_alignment import train as graph_train

  config = graph_train.Config(
      workdir=f'{WEIGHTS}/graph_aligner',
      epochs=300,
      steps_per_epoch=100,
      eval_steps=10,
  )
  t0 = time.monotonic()

  def progress(epoch, summary):
    print(
        f'graph epoch {epoch}: drift={summary["drift_error"]:.3f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  graph_train.train(
      config, progress=progress,
      stop_fn=lambda: time.monotonic() - t0 > budget_s,
  )
  _ship(graph_train, config)


if __name__ == '__main__':
  which = sys.argv[1] if len(sys.argv) > 1 else 'all'
  budget = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
  if which in ('all', 'aligner'):
    train_aligner(budget or 5400.0)
  if which in ('all', 'detector'):
    train_detector(budget or 5400.0)
  if which in ('all', 'graph'):
    train_graph_aligner(budget or 3600.0)
  if which in ('aligner2',):
    train_aligner_registration(budget or 2400.0)
