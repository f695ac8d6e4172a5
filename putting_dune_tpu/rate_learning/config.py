"""Static training configs (hashable dataclasses; jit-static friendly).

Default values mirror the reference ml_collections configs
(/root/reference/putting_dune/rate_learning/learn_rates.py:40-64).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RateLearningConfig:
  batch_size: int = 256
  epochs: int = 500
  num_models: int = 50
  bootstrap: bool = True
  hidden_dimensions: tuple[int, ...] = (256, 256)
  weight_decay: float = 1e-3
  learning_rate: float = 1e-3
  val_frac: float = 0.0
  use_voltage: bool = True
  use_current: bool = True
  dwell_time_in_context: bool = False
  class_loss_weight: float = 1.0
  rate_loss_weight: float = 1.0
  augment_data: bool = True
  batchnorm: bool = True
  dropout_rate: float = 0.0
  num_states: int = 3
  # Units of the canonicalized beam offset the model was TRAINED on:
  # 'bonds' for synthetic prior data (data_utils generates positions in
  # bond-length units), 'angstroms' for pipeline transition data
  # (train_rate_learner canonicalizes raw angstrom offsets). The reference
  # has a genuine inconsistency here — its predict() always divides by the
  # bond length (learn_rates.py:941) while its pipeline trains on
  # angstroms (train_rate_learner.py:444-452), which mis-normalizes
  # BatchNorm inputs at inference; recording the unit fixes it.
  beam_units: str = 'bonds'


@dataclasses.dataclass(frozen=True)
class DistillConfig:
  batch_size: int = 4096
  epochs: int = 10_000
  batches_per_epoch: int = 10
