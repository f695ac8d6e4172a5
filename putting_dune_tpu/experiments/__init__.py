"""Named experiment registry (microscope / train / eval)."""

from putting_dune_tpu.experiments.experiments import (
    AdaptersAndGoal,
    EvalExperiment,
    MicroscopeExperiment,
    SimulatorSpec,
    TrainExperiment,
)
from putting_dune_tpu.experiments import registry

__all__ = [
    'AdaptersAndGoal',
    'EvalExperiment',
    'MicroscopeExperiment',
    'SimulatorSpec',
    'TrainExperiment',
    'registry',
]
