"""End-to-end rate-model training from recorded trajectories.

Parity: /root/reference/putting_dune/pipeline/train_rate_learner.py —
transition filtering/canonicalization into DataPoints (:294-515), dataset
stacking (:518-565), the neural rate-network path (train ensemble ->
metrics -> distill -> save, :706-760) and the sklearn voting-classifier
alternative (:110-181, :762-820). Saved models are native JAX checkpoints
(LearnedRatePredictor.save) instead of jax2tf TF SavedModels.

CLI:
  python -m putting_dune_tpu.pipeline.train_rate_learner \
      --source_path=trajectories.tfrecords --workdir=/tmp/run
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import os
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.io import records
from putting_dune_tpu.pipeline import trajectories_to_transitions as t2t
from putting_dune_tpu.rate_learning import config as config_lib
from putting_dune_tpu.rate_learning import data_utils


class LearnerType(str, enum.Enum):
  RATE_NETWORK = 'rate_network'
  CLASSIFICATION_NETWORK = 'classification_network'
  SKLEARN_MLP = 'sklearn_mlp'
  KNN = 'knn'
  GP = 'gp'
  RANDOM_FOREST = 'random_forest'
  SVM = 'svm'


@dataclasses.dataclass
class Args:
  """CLI arguments (reference train_rate_learner.py:62-91)."""

  source_path: str
  workdir: str
  log_metrics: bool = True
  plot_metrics: bool = True
  visualize_rates: bool = True
  batch_size: int = 256
  epochs: int = 500
  # Epochs per device program: one giant multi-hundred-epoch XLA program
  # runs for tens of minutes without host interaction, which remote-TPU
  # relays can kill; chunking also yields progress logs.
  epoch_chunk: int = 50
  num_models: int = 100
  bootstrap: bool = True
  hidden_dimensions: Tuple[int, ...] = (128, 128)
  weight_decay: float = 1e-1
  learning_rate: float = 1e-3
  val_frac: float = 0.0
  neighbor_distance_cutoff: float = (
      constants.CARBON_BOND_DISTANCE_ANGSTROMS / 2
  )
  seed: int = 42
  distill: bool = True
  augment_data: bool = True
  use_voltage: bool = True
  use_current: bool = True
  batchnorm: bool = True
  dropout_rate: float = 0.0
  class_loss_weight: float = 0.1
  rate_loss_weight: float = 1.0
  previous_controls_at_current_timestep: bool = False
  learner_type: str = 'rate_network'


@dataclasses.dataclass
class DataPoint:
  """One canonicalized transition (reference :93-99)."""

  next_state: int
  beam_pos: np.ndarray
  seconds_between: float
  current: Optional[float]
  voltage: Optional[float]


def transitions_to_datapoints(
    transitions: Sequence[md.Transition],
    *,
    neighbor_distance_cutoff: float = (
        constants.CARBON_BOND_DISTANCE_ANGSTROMS / 2
    ),
) -> Tuple[List[DataPoint], Dict[str, int]]:
  """Filters and canonicalizes transitions for rate learning.

  Filtering parity (reference :294-515): single control; exactly one
  silicon before AND after; threefold (not fourfold) local coordination;
  consistent neighbor sets across the pair; the successor identified by
  the nearest before-neighbor to the after-silicon; beam standardized to
  the canonical frame (neighbor nearest the beam on +x).

  Returns (datapoints, drop-reason counts).
  """
  counts = {
      'no_controls': 0,
      'wrong_number_of_silicons': 0,
      'no_silicon_neighbor': 0,
      'wrong_number_of_neighbors': 0,
      'fourfold': 0,
      'not_threefold': 0,
      'neighbors_too_distant': 0,
      'kept': 0,
  }
  data: List[DataPoint] = []

  for transition in transitions:
    if len(transition.controls) != 1:
      counts['no_controls'] += 1
      continue
    control = transition.fov_before.microscope_frame_to_material_frame(
        transition.controls[0]
    )
    grid_before = transition.fov_before.microscope_frame_to_material_frame(
        transition.grid_before
    )
    grid_after = transition.fov_after.microscope_frame_to_material_frame(
        transition.grid_after
    )

    si_before = grid_before.atom_positions[
        grid_before.atomic_numbers == constants.SILICON
    ]
    if si_before.shape != (1, 2):
      counts['wrong_number_of_silicons'] += 1
      continue

    if grid_before.num_atoms < 10 or grid_after.num_atoms < 4:
      counts['wrong_number_of_neighbors'] += 1
      continue

    # 10 nearest (incl. self) in the before grid.
    d_before = np.linalg.norm(
        grid_before.atom_positions - si_before, axis=-1
    )
    order_before = np.argsort(d_before, kind='stable')[:10]
    neighbor_positions_before = grid_before.atom_positions[order_before]
    dist = d_before[order_before]

    # Coordination checks (reference :377-391).
    is_fourfold = abs(dist[1] - dist[4]) < 0.5
    is_threefold = (dist[1:4] < 2.0).all() and (dist[4:] > 2.0).all()
    if is_fourfold:
      counts['fourfold'] += 1
      continue
    if not is_threefold:
      counts['not_threefold'] += 1
      continue
    neighbor_positions_before = neighbor_positions_before[:4]

    # 4 nearest (incl. site) in the after grid, around the OLD si position.
    d_after = np.linalg.norm(
        grid_after.atom_positions - si_before, axis=-1
    )
    order_after = np.argsort(d_after, kind='stable')[:4]
    neighbor_positions_after = grid_after.atom_positions[order_after]
    neighbor_numbers_after = grid_after.atomic_numbers[order_after]

    si_after = grid_after.atom_positions[
        grid_after.atomic_numbers == constants.SILICON
    ]
    if si_after.shape != (1, 2):
      counts['wrong_number_of_silicons'] += 1
      continue
    if not (neighbor_numbers_after == constants.SILICON).any():
      counts['no_silicon_neighbor'] += 1
      continue

    # Neighbor-set consistency across the pair (reference :431-441).
    pair_dist = np.linalg.norm(
        neighbor_positions_before[:, None, :]
        - neighbor_positions_after[None, :, :],
        axis=-1,
    ).min(axis=-1)
    if pair_dist.mean() > neighbor_distance_cutoff:
      counts['neighbors_too_distant'] += 1
      continue

    # Canonical frame: rotate so the neighbor nearest the beam is on +x.
    control_delta = control.position - si_before.reshape(-1)
    neighbor_deltas = neighbor_positions_before - si_before
    beam_std, _, neighbor_order = data_utils.standardize_beam_and_neighbors(
        control_delta, neighbor_deltas[1:]
    )

    # Successor label: nearest before-neighbor slot to the after-silicon,
    # mapped through the canonical ordering (reference :452-462).
    slot = int(
        np.argmin(
            np.linalg.norm(neighbor_positions_before - si_after, axis=-1)
        )
    )
    if slot > 0:
      next_state = int(np.argsort(neighbor_order)[slot - 1] + 1)
    else:
      next_state = 0

    data.append(
        DataPoint(
            next_state=next_state,
            beam_pos=beam_std.reshape(2),
            seconds_between=control.dwell_time.total_seconds(),
            current=control.current_na,
            voltage=control.voltage_kv,
        )
    )
    counts['kept'] += 1

  return data, counts


def stack_data(
    data: Sequence[DataPoint],
    use_current: bool = False,
    use_voltage: bool = False,
    dwell_time_in_context: bool = False,
    *,
    num_neighbors: int = 3,
) -> Dict[str, Optional[np.ndarray]]:
  """Stacks datapoints into a training dataset (reference :518-565).

  Context column order is [current, voltage, (dwell)] — the same order the
  predictor prepends at inference (predictor.predict).
  """
  next_state = np.stack([d.next_state for d in data]).astype(np.int32)
  position = np.stack([d.beam_pos for d in data]).astype(np.float32)
  dt = np.stack([d.seconds_between for d in data]).astype(np.float32)
  rates = np.zeros((len(data), num_neighbors), np.float32)

  context_cols = []
  if use_current:
    context_cols.append(
        np.stack([d.current if d.current is not None else 0.0 for d in data])
    )
  if use_voltage:
    context_cols.append(
        np.stack([d.voltage if d.voltage is not None else 0.0 for d in data])
    )
  if dwell_time_in_context:
    context_cols.append(dt)
  context = (
      np.stack(context_cols, axis=-1).astype(np.float32)
      if context_cols
      else np.zeros((len(data), 0), np.float32)
  )
  return {
      'next_state': next_state,
      'dt': dt,
      'position': position,
      'rates': rates,
      'context': context,
  }


# --- sklearn classifier path ---------------------------------------------------


def get_sklearn_classifier(
    learner_type: str, args: Args, standardize: bool = True, **kwargs
):
  """Builds an sklearn classifier (reference :110-155)."""
  from sklearn import ensemble as skensemble
  from sklearn import gaussian_process as skgp
  from sklearn import neighbors as skneighbors
  from sklearn import pipeline as skpipeline
  from sklearn import preprocessing as skpreprocessing
  from sklearn import svm as sksvm
  from sklearn import neural_network as sknn

  lt = LearnerType(learner_type)
  if lt == LearnerType.SKLEARN_MLP:
    model = sknn.MLPClassifier(
        alpha=args.weight_decay, max_iter=args.epochs, **kwargs
    )
  elif lt == LearnerType.KNN:
    model = skneighbors.KNeighborsClassifier(25, **kwargs)
  elif lt == LearnerType.GP:
    model = skgp.GaussianProcessClassifier(
        1.0 * skgp.kernels.RBF(1.0), **kwargs
    )
  elif lt == LearnerType.RANDOM_FOREST:
    model = skensemble.RandomForestClassifier(
        max_depth=5, n_estimators=10, **kwargs
    )
  elif lt == LearnerType.SVM:
    model = sksvm.SVC(gamma=2, C=1, probability=True, **kwargs)
  else:
    raise ValueError(f'Invalid learner type {learner_type}.')
  if standardize:
    model = skpipeline.make_pipeline(
        skpreprocessing.StandardScaler(), model
    )
  return model


def train_sklearn_classifier(model, training_data, testing_data):
  """Fit + accuracy scores (reference :158-181)."""
  model.fit(training_data['context'], training_data['next_state'])
  train_acc = model.score(
      training_data['context'], training_data['next_state']
  )
  test_acc = model.score(testing_data['context'], testing_data['next_state'])
  return model, train_acc, test_acc


# --- helpers -------------------------------------------------------------------


def load_trajectories_from_records(path: str) -> List[md.Trajectory]:
  """Loads trajectories from one records file or a directory of them."""
  paths = []
  if os.path.isdir(path):
    paths = [os.path.join(path, p) for p in sorted(os.listdir(path))]
  else:
    paths = [path]
  out = []
  for p in paths:
    out.extend(records.read_records(p, md.Trajectory))
  return out


def main(args: Args):
  import jax.numpy as jnp
  import numpy as np

  from putting_dune_tpu.rate_learning.predictor import LearnedRatePredictor

  os.makedirs(args.workdir, exist_ok=True)
  trajectories = load_trajectories_from_records(args.source_path)
  transitions = t2t.trajectories_to_transitions(
      trajectories,
      previous_controls_at_current_timestep=(
          args.previous_controls_at_current_timestep
      ),
  )
  datapoints, counts = transitions_to_datapoints(
      transitions, neighbor_distance_cutoff=args.neighbor_distance_cutoff
  )
  print('Transition filter counts:', counts, flush=True)
  if counts['no_controls'] and not args.previous_controls_at_current_timestep:
    # One dropped transition per trajectory is the signature of a logger
    # that attaches each control to the POST-exposure observation (the
    # first observation then has none) being read with the default
    # convention — which silently pairs every remaining transition with
    # the PREVIOUS step's beam position.
    print(
        f'Hint: {counts["no_controls"]} transitions had no controls. If '
        'your trajectories attach controls to the post-exposure '
        'observation, pass --previous_controls_at_current_timestep '
        '(otherwise each datapoint trains on the prior step\'s beam).',
        flush=True,
    )

  learner_type = LearnerType(args.learner_type)
  stacked = stack_data(
      datapoints,
      use_current=args.use_current,
      use_voltage=args.use_voltage,
      dwell_time_in_context=learner_type != LearnerType.RATE_NETWORK,
  )
  if learner_type != LearnerType.RATE_NETWORK:
    # Constant dt turns the survival model into plain classification.
    stacked['dt'] = np.ones_like(stacked['dt'])

  rng_key = jax.random.PRNGKey(args.seed)

  if learner_type in (
      LearnerType.RATE_NETWORK, LearnerType.CLASSIFICATION_NETWORK
  ):
    config = config_lib.RateLearningConfig(
        beam_units='angstroms',  # pipeline canonicalizes raw angstroms
        batch_size=args.batch_size,
        epochs=args.epochs,
        num_models=args.num_models,
        bootstrap=args.bootstrap,
        hidden_dimensions=tuple(args.hidden_dimensions),
        weight_decay=args.weight_decay,
        learning_rate=args.learning_rate,
        val_frac=args.val_frac,
        use_voltage=args.use_voltage,
        use_current=args.use_current,
        class_loss_weight=args.class_loss_weight,
        rate_loss_weight=args.rate_loss_weight,
        augment_data=args.augment_data,
        batchnorm=args.batchnorm,
        dropout_rate=args.dropout_rate,
    )
    init_key, train_key = jax.random.split(rng_key)
    predictor = LearnedRatePredictor(init_key=init_key, config=config)

    def _progress(done_epochs, last_metrics):
      print(
          f'epoch {done_epochs}/{config.epochs}: '
          + ' '.join(f'{k}={v:.4f}' for k, v in sorted(last_metrics.items())),
          flush=True,
      )

    metrics = predictor.train(
        stacked, train_key, bootstrap=args.bootstrap,
        epoch_chunk=args.epoch_chunk, progress=_progress,
    )

    if args.log_metrics:
      np.savez_compressed(
          os.path.join(args.workdir, 'metrics.npz'),
          **{k: np.asarray(v) for k, v in metrics.items()},
      )
    if args.plot_metrics:
      _plot_metrics(metrics, args.workdir)
    if args.distill:
      augmented = data_utils.augment_data(
          next_state=jnp.asarray(stacked['next_state']),
          dt=jnp.asarray(stacked['dt']),
          rates=jnp.asarray(stacked['rates']),
          position=jnp.asarray(stacked['position']),
          context=jnp.asarray(stacked['context']),
      )
      predictor.distill(jax.tree_util.tree_map(np.asarray, augmented))
    predictor.save(args.workdir)
    rate_fn = lambda x: np.asarray(predictor.apply_model(jnp.asarray(x)))
  else:
    import joblib
    from sklearn import ensemble as skensemble

    from putting_dune_tpu.rate_learning import train as train_lib

    train_sets, test_sets = train_lib.create_dataset_splits(
        stacked,
        num_splits=args.num_models,
        seed=args.seed,
        bootstrap=args.bootstrap,
        augment=args.augment_data,
        test_fraction=args.val_frac,
    )
    models, train_accs, test_accs = [], [], []
    for i in range(args.num_models):
      train_data = {k: np.asarray(v[i]) for k, v in train_sets.items()}
      test_data = {k: np.asarray(v[i]) for k, v in test_sets.items()}
      model = get_sklearn_classifier(args.learner_type, args)
      model, tr, te = train_sklearn_classifier(model, train_data, test_data)
      joblib.dump(
          model, os.path.join(args.workdir, f'{args.learner_type}_{i}.joblib')
      )
      models.append(model)
      train_accs.append(tr)
      test_accs.append(te)
    ensemble = skensemble.VotingClassifier(
        [(f'{args.learner_type}_{i}', m) for i, m in enumerate(models)],
        voting='soft',
    )
    ensemble.estimators_ = models
    ensemble.le_ = None  # fitted estimators injected directly
    joblib.dump(
        ensemble,
        os.path.join(args.workdir, f'{args.learner_type}_ensemble.joblib'),
    )
    if args.log_metrics:
      np.savez_compressed(
          os.path.join(args.workdir, 'metrics.npz'),
          train_accuracy=np.asarray(train_accs),
          test_accuracy=np.asarray(test_accs),
      )
    rate_fn = lambda x: np.mean(
        [m.predict_proba(x)[..., 1:] for m in models], axis=0
    )

  if args.visualize_rates and len(datapoints) > 0:
    from putting_dune_tpu import plotting_utils

    context = stacked['context']
    fixed = np.median(context, axis=0) if context.size else None
    plotting_utils.visualize_rates(
        os.path.join(args.workdir, 'avg_context_rates.png'),
        rate_fn,
        grid_range=10.0,
        num_points=300**2,
        fixed_context=fixed,
    )
  return stacked


def _plot_metrics(metrics: Mapping[str, Any], workdir: str) -> None:
  import matplotlib

  matplotlib.use('Agg')
  import matplotlib.pyplot as plt

  for k, v in metrics.items():
    v = np.asarray(v)
    plt.figure()
    for i in range(v.shape[0]):
      plt.plot(v[i])
    plt.plot(v.mean(0), label='Average', linewidth=4)
    plt.axvline(int(v.mean(0).argmin()), label='Best iteration')
    plt.yscale('log')
    plt.legend()
    plt.title(k.replace('_', ' ').title())
    plt.savefig(os.path.join(workdir, f'{k}.png'), bbox_inches='tight')
    plt.close()


def _parse_args() -> Args:
  parser = argparse.ArgumentParser(description=__doc__)
  for field in dataclasses.fields(Args):
    name = f'--{field.name}'
    if field.type == 'bool' or isinstance(field.default, bool):
      parser.add_argument(
          name,
          action=argparse.BooleanOptionalAction,
          default=field.default,
      )
    elif field.name == 'hidden_dimensions':
      parser.add_argument(
          name, type=int, nargs='+', default=list(field.default)
      )
    elif field.default is dataclasses.MISSING:
      parser.add_argument(name, required=True)
    else:
      parser.add_argument(name, type=type(field.default),
                          default=field.default)
  ns = parser.parse_args()
  kwargs = vars(ns)
  kwargs['hidden_dimensions'] = tuple(kwargs['hidden_dimensions'])
  return Args(**kwargs)


def cli() -> None:
  """Console entry point."""
  main(_parse_args())


if __name__ == '__main__':
  cli()
