"""Domain-randomized image-generation parameter sampling.

Parity: reference imaging.py:42-72 (sample_image_parameters and
sample_noisy_image_parameters), vectorized over a batch of environments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from putting_dune_tpu import structures


def sample_imaging_params(
    key: jax.Array, batch_size: int, *, noisy: bool = False
) -> structures.ImagingParams:
  """Samples per-environment imaging parameters.

  noisy=False matches sample_image_parameters (imaging.py:42-54);
  noisy=True matches the hand-tuned very-noisy variant (imaging.py:57-72).
  """
  keys = jax.random.split(key, 9)
  b = (batch_size,)

  def u(k, lo, hi):
    return jax.random.uniform(k, b, minval=lo, maxval=hi)

  return structures.ImagingParams(
      intensity_exponent=u(keys[0], 1.4, 2.0),
      gaussian_variance=u(keys[1], 0.0, 0.3 if noisy else 5e-3),
      jitter_rate=u(keys[2], 0.0, 5.0),
      poisson_rate_multiplier=(
          jax.random.exponential(keys[3], b) * 15.0 + 1.0
      ),
      salt_and_pepper_amount=u(keys[4], 0.0, 1e-2 if noisy else 1e-3),
      blur_amount=u(keys[5], 0.0, 0.25 if noisy else 1.0),
      contrast_gamma=(
          u(keys[6], 0.5, 1.5) if noisy else u(keys[6], 0.7, 1.3)
      ),
      exponential_lambda=u(keys[7], 0.0, 0.25 if noisy else 0.2),
      uniform_noise_scale=u(keys[8], 0.0, 0.25 if noisy else 0.2),
  )
