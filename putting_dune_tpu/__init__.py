"""putting_dune_tpu: a TPU-native rebuild of Putting Dune.

A brand-new JAX/XLA framework with the capabilities of google/putting-dune:
the STEM microscope simulator (graphene + silicon dopant kinetic Monte
Carlo), dm_env RL environment, rate-learning stack, imaging/detection/
alignment stacks, and offline data pipelines — redesigned batch-first so
thousands of environments step per TPU chip.
"""

__version__ = '0.1.0'
