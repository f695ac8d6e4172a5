"""Production training for the perception stack on one TPU.

Trains the atom-detection UNet (256^2, the reference's export resolution)
and the image-alignment drift network, shipping orbax checkpoints under
putting_dune_tpu/experiments/model_weights/ where the inference wrappers
(AtomDetector.from_checkpoint / ImageAligner.from_checkpoint) load them.
"""

import sys
import time

WEIGHTS = 'putting_dune_tpu/experiments/model_weights'


def _ship(train_mod, config) -> None:
  """Exports best params as a slim msgpack and drops the orbax dirs."""
  import os
  import shutil

  # Remove any stale msgpack first: load_params prefers it over the
  # freshly trained orbax checkpoints.
  stale = os.path.join(config.workdir, 'params.msgpack')
  if os.path.exists(stale):
    os.remove(stale)
  params = train_mod.load_params(config.workdir, config)
  path = train_mod.save_params_msgpack(params, config.workdir)
  print(f'shipped {path}', flush=True)
  shutil.rmtree(f'{config.workdir}/checkpoints', ignore_errors=True)


def train_detector() -> None:
  from putting_dune_tpu.atom_detection import train as det_train

  config = det_train.Config(
      workdir=f'{WEIGHTS}/atom_detector',
      image_size=256,
      batch_size=64,
      epochs=48,
      steps_per_epoch=200,
      eval_steps=20,
      noisy_images=False,
      # Counter the ~8:1 background class dominance at this budget (the
      # reference trains unweighted over 50M examples).
      class_weights=(0.2, 1.0, 10.0),
  )
  t0 = time.monotonic()

  def progress(epoch, summary):
    print(
        f'detector epoch {epoch}: acc={summary["accuracy"]:.4f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  det_train.train(config, progress=progress)
  _ship(det_train, config)


def train_aligner() -> None:
  from putting_dune_tpu.image_alignment import train as align_train

  config = align_train.Config(
      workdir=f'{WEIGHTS}/image_aligner',
      image_size=128,
      batch_size=32,
      epochs=120,
      steps_per_epoch=100,
      eval_steps=10,
  )
  t0 = time.monotonic()

  def progress(epoch, summary):
    drift = summary.get('drift_error', summary)
    print(
        f'aligner epoch {epoch}: {drift} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  align_train.train(config, progress=progress)
  _ship(align_train, config)


def train_graph_aligner() -> None:
  from putting_dune_tpu.graph_alignment import train as graph_train

  config = graph_train.Config(
      workdir=f'{WEIGHTS}/graph_aligner',
      epochs=100,
      steps_per_epoch=100,
      eval_steps=10,
  )
  t0 = time.monotonic()

  def progress(epoch, summary):
    print(
        f'graph epoch {epoch}: {summary} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )

  graph_train.train(config, progress=progress)
  _ship(graph_train, config)


if __name__ == '__main__':
  which = sys.argv[1] if len(sys.argv) > 1 else 'both'
  if which in ('both', 'detector'):
    train_detector()
  if which in ('both', 'aligner'):
    train_aligner()
  if which in ('both', 'graph'):
    train_graph_aligner()
