"""Rate learning: survival-likelihood training of neural KMC rate models.

TPU-first rewrite of /root/reference/putting_dune/rate_learning/: flax MLPs,
lax.scan training, one vmapped (and mesh-shardable) bootstrap ensemble, and
a predictor that plugs straight into the on-device simulator — no TF
SavedModel detour.
"""

from putting_dune_tpu.rate_learning.config import (
    DistillConfig,
    RateLearningConfig,
)
from putting_dune_tpu.rate_learning.predictor import LearnedRatePredictor

__all__ = ['DistillConfig', 'RateLearningConfig', 'LearnedRatePredictor']
