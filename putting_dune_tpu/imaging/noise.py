"""Jittable STEM noise operators.

Parity targets: reference imaging.py:176-236. Each op takes (B, H, W) float32
frames and per-env (B,) parameters, and is pure/jit-safe. Distributional
equivalence is the goal (different PRNG streams than NumPy).

Notes vs the reference:
  * Poisson: exact jax.random.poisson (same law as rng.poisson).
  * Jitter: per-row circular roll with Poisson-distributed shifts, done as a
    single modular gather instead of a per-row Python loop.
  * Salt & pepper: skimage flips `amount` of pixels, half to 1 and half to 0;
    we draw one uniform per pixel and threshold, which realizes the same
    per-pixel Bernoulli(amount/2) salt / Bernoulli(amount/2) pepper law.
  * Gaussian: additive N(0, var) then clip to [0, 1] (skimage.random_noise
    clips its output range).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _renorm(image: jnp.ndarray) -> jnp.ndarray:
  peak = jnp.max(image, axis=(-2, -1), keepdims=True)
  return image / jnp.maximum(peak, 1e-20)


def apply_poisson_noise(
    key: jax.Array, image: jnp.ndarray, rate_multiplier: jnp.ndarray
) -> jnp.ndarray:
  """Shot noise: Poisson(image * multiplier), max-normalized.

  Parity: imaging.py:199-203.
  """
  lam = image * rate_multiplier[:, None, None]
  counts = jax.random.poisson(key, lam).astype(jnp.float32)
  return _renorm(counts)


def apply_jitter(
    key: jax.Array, image: jnp.ndarray, jitter_rate: jnp.ndarray
) -> jnp.ndarray:
  """Row-wise circular shifts, shift_i ~ Poisson(jitter_rate).

  Parity: imaging.py:188-196 (np.roll per row).
  """
  b, h, w = image.shape
  shifts = jax.random.poisson(key, jitter_rate[:, None], (b, h))  # (B, H)
  cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), dimension=2)
  src = jnp.mod(cols - shifts[..., None].astype(jnp.int32), w)
  return jnp.take_along_axis(image, src, axis=-1)


def apply_salt_and_pepper(
    key: jax.Array, image: jnp.ndarray, amount: jnp.ndarray
) -> jnp.ndarray:
  """Flips ~amount of pixels: half to 1.0 (salt), half to 0.0 (pepper).

  Parity: imaging.py:206-209 / skimage s&p mode.
  """
  u = jax.random.uniform(key, image.shape)
  a = amount[:, None, None]
  image = jnp.where(u < a / 2.0, 1.0, image)
  image = jnp.where((u >= a / 2.0) & (u < a), 0.0, image)
  return image


def apply_contrast(image: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
  """Gamma contrast adjustment: image ** gamma (imaging.py:217-218)."""
  return jnp.power(jnp.maximum(image, 0.0), gamma[:, None, None])


def apply_uniform_noise(
    key: jax.Array, image: jnp.ndarray, noise_scale: jnp.ndarray
) -> jnp.ndarray:
  """Additive U(0, scale) noise, max-normalized (imaging.py:231-236)."""
  noise = jax.random.uniform(key, image.shape) * noise_scale[:, None, None]
  return _renorm(image + noise)


def apply_exponential_noise(
    key: jax.Array, image: jnp.ndarray, noise_scale: jnp.ndarray
) -> jnp.ndarray:
  """Additive Exp(scale) noise, max-normalized (imaging.py:221-228)."""
  noise = jax.random.exponential(key, image.shape) * noise_scale[:, None, None]
  return _renorm(image + noise)


def apply_gaussian_noise(
    key: jax.Array, image: jnp.ndarray, variance: jnp.ndarray
) -> jnp.ndarray:
  """Additive N(0, var) noise, clipped to [0, 1] (imaging.py:176-185)."""
  sigma = jnp.sqrt(variance)[:, None, None]
  noise = jax.random.normal(key, image.shape) * sigma
  return jnp.clip(image + noise, 0.0, 1.0)
