"""Transition-rate functions for the silicon dopant, batched and jittable.

TPU-first rewrite of the reference rate predictors
(/root/reference/putting_dune/graphene.py:121-461). Every function here maps

    (si_pos (B, 2), neighbor_pos (B, 3, 2), beam_pos (B, 2)) -> rates (B, 3)

in the material frame (angstroms), with no per-call object construction, no
successor-grid materialization (the KMC engine relabels a site index
instead), and closed-form Gaussian densities instead of scipy.stats calls.

A RateFunction for the KMC engine is any callable with this signature;
learned neural predictors (rate_learning/) plug in the same way.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import geometry

RateFunction = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


class RateFunctionProtocol(Protocol):

  def __call__(
      self,
      si_pos: jnp.ndarray,
      neighbor_pos: jnp.ndarray,
      beam_pos: jnp.ndarray,
  ) -> jnp.ndarray:
    ...


def simple_canonical_rates(
    si_pos: jnp.ndarray,
    neighbor_pos: jnp.ndarray,
    beam_pos: jnp.ndarray,
) -> jnp.ndarray:
  """Inverse-square beam-falloff rates (reference graphene.py:133-166).

  rate_i = 1 / ((4 * d_i / bond)^2 + 1) where d_i = |beam - neighbor_i|.
  Max rate = 1 when the beam sits exactly on a neighbor.
  """
  del si_pos  # Rates depend only on beam-to-neighbor distance.
  delta = beam_pos[..., None, :] - neighbor_pos  # (B, 3, 2)
  dist = jnp.linalg.norm(delta, axis=-1)
  dist = dist / constants.CARBON_BOND_DISTANCE_ANGSTROMS
  return 1.0 / (jnp.square(dist * 4.0) + 1.0)


def _gaussian2_exponent(
    diff: jnp.ndarray, cov: jnp.ndarray
) -> jnp.ndarray:
  """-0.5 * diff^T cov^{-1} diff for a 2x2 covariance, closed form."""
  a, b = cov[0, 0], cov[0, 1]
  c, d = cov[1, 0], cov[1, 1]
  det = a * d - b * c
  dx = diff[..., 0]
  dy = diff[..., 1]
  quad = (d * dx * dx - (b + c) * dx * dy + a * dy * dy) / det
  return -0.5 * quad


def prior_rates(
    si_pos: jnp.ndarray,
    neighbor_pos: jnp.ndarray,
    beam_pos: jnp.ndarray,
    *,
    mean: np.ndarray | None = None,
    cov: np.ndarray | None = None,
    max_rate: float | None = None,
) -> jnp.ndarray:
  """Human-designed Gaussian prior rates (reference graphene.py:169-229).

  For each neighbor: rotate the prior mean (0.85 bonds along +x) to that
  neighbor's direction, then evaluate a Gaussian (cov 0.1*I in bond units)
  at the beam position relative to the silicon, scaled so the peak equals
  max_rate = ln(2)/3. The density ratio pdf(x)/pdf(mean) reduces to
  exp(-0.5 * d^T cov^{-1} d), so no normalization constants are needed.

  Reference-parity note (bug-for-bug): the reference rotates the prior MEAN
  by -angle_i (graphene.py:223), which places the peak beam position at the
  REFLECTION (angle -a_i) of neighbor i rather than at the neighbor itself
  whenever the neighbor is off the x-axis. We preserve that exact behavior
  here (verified against a scipy oracle in tests); see prior_rates_aligned
  for the physically-intended variant whose peak sits 0.85 bonds toward
  each neighbor.
  """
  return _prior_rates_impl(
      si_pos, neighbor_pos, beam_pos, mean=mean, cov=cov, max_rate=max_rate,
      aligned=False,
  )


def prior_rates_aligned(
    si_pos: jnp.ndarray,
    neighbor_pos: jnp.ndarray,
    beam_pos: jnp.ndarray,
    *,
    mean: np.ndarray | None = None,
    cov: np.ndarray | None = None,
    max_rate: float | None = None,
) -> jnp.ndarray:
  """Gaussian prior rates peaking 0.85 bonds TOWARD each neighbor.

  Equivalent to prior_rates but rotating the beam into the neighbor's
  canonical frame (rotate(beam, -a_i) vs mean) instead of rotating the mean,
  which fixes the reference's reflection quirk (graphene.py:223). Use this
  when you want the documented physical prior rather than bit-parity.
  """
  return _prior_rates_impl(
      si_pos, neighbor_pos, beam_pos, mean=mean, cov=cov, max_rate=max_rate,
      aligned=True,
  )


def _prior_rates_impl(
    si_pos, neighbor_pos, beam_pos, *, mean, cov, max_rate, aligned: bool
) -> jnp.ndarray:
  mean = constants.SIGR_PRIOR_RATE_MEAN if mean is None else np.asarray(mean)
  cov = constants.SIGR_PRIOR_RATE_COV if cov is None else np.asarray(cov)
  max_rate = constants.SIGR_PRIOR_MAX_RATE if max_rate is None else max_rate

  rel_neighbors = neighbor_pos - si_pos[..., None, :]  # (B, 3, 2)
  rel_beam = (beam_pos - si_pos) / constants.CARBON_BOND_DISTANCE_ANGSTROMS

  # cos/sin of each neighbor's angle without atan2/cos/sin: for
  # a = atan2(dy, dx), cos(a) = dx/r and sin(a) = dy/r. This is the hot
  # path of the KMC loop body, so transcendentals matter.
  nx, ny = rel_neighbors[..., 0], rel_neighbors[..., 1]
  inv_r = jax.lax.rsqrt(nx * nx + ny * ny)
  c = nx * inv_r  # (B, 3) cos(angle_i)
  s = ny * inv_r  # (B, 3) sin(angle_i)

  mean_arr = jnp.asarray(mean, dtype=jnp.float32)
  m0, m1 = mean_arr[..., 0], mean_arr[..., 1]
  if aligned:
    # Rotate the beam into each neighbor's canonical frame (by -angle);
    # peak when the beam sits `mean` bond-lengths toward the neighbor.
    bx = rel_beam[..., None, 0]
    by = rel_beam[..., None, 1]
    diff = jnp.stack(
        [bx * c + by * s - m0, -bx * s + by * c - m1], axis=-1
    )
  else:
    # Reference behavior: rotate the MEAN by -angle (graphene.py:223).
    rotated_mean = jnp.stack(
        [m0 * c + m1 * s, -m0 * s + m1 * c], axis=-1
    )
    diff = rel_beam[..., None, :] - rotated_mean
  exponent = _gaussian2_exponent(diff, jnp.asarray(cov, dtype=jnp.float32))
  return max_rate * jnp.exp(exponent)


@dataclasses.dataclass(frozen=True)
class GaussianMixtureRateFunction:
  """Mixture-of-Gaussians learned rate family (reference graphene.py:279-461).

  Each mixture component places a Gaussian at ``si + delta_i * loc_distance``
  along the silicon->neighbor vector, with covariance axes aligned to that
  vector (variances[:, 0] along it, variances[:, 1] across it). Densities are
  evaluated at the absolute beam position in the material frame and scaled so
  the largest component peak equals max_rate.

  Parameters are host numpy; __call__ is pure jnp and jit-safe (the number of
  mixtures is static).
  """

  max_rate: float
  mixture_weights: np.ndarray  # (M,)
  loc_distances: np.ndarray  # (M,)
  variances: np.ndarray  # (M, 2)

  @property
  def normalizing_factor(self) -> float:
    """max_rate / max_m (w_m * peak-density of component m)."""
    det = self.variances[:, 0] * self.variances[:, 1]
    mode_prob = 1.0 / (2.0 * np.pi * np.sqrt(det))
    max_mode_prob = np.max(mode_prob * self.mixture_weights)
    return float(self.max_rate / max_mode_prob)

  def __call__(
      self,
      si_pos: jnp.ndarray,
      neighbor_pos: jnp.ndarray,
      beam_pos: jnp.ndarray,
  ) -> jnp.ndarray:
    delta = neighbor_pos - si_pos[..., None, :]  # (B, 3, 2)
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    e1 = delta / norm  # unit along si->neighbor
    e2 = jnp.stack([-e1[..., 1], e1[..., 0]], axis=-1)  # unit orthogonal

    loc_d = jnp.asarray(self.loc_distances, dtype=jnp.float32)  # (M,)
    weights = jnp.asarray(self.mixture_weights, dtype=jnp.float32)  # (M,)
    variances = jnp.asarray(self.variances, dtype=jnp.float32)  # (M, 2)

    # loc[m] = si + delta * loc_d[m]; diff to the absolute beam position.
    # (B, 3, M, 2)
    loc = (
        si_pos[..., None, None, :]
        + delta[..., None, :] * loc_d[:, None]
    )
    diff = beam_pos[..., None, None, :] - loc

    # The covariance eigenbasis is orthonormal, so the quadratic form is
    # (diff.e1)^2/v1 + (diff.e2)^2/v2 and det = v1*v2 (the reference builds
    # the full matrix and pinv; graphene.py:342-377).
    p1 = jnp.sum(diff * e1[..., None, :], axis=-1)  # (B, 3, M)
    p2 = jnp.sum(diff * e2[..., None, :], axis=-1)
    v1 = variances[:, 0]
    v2 = variances[:, 1]
    quad = p1 * p1 / v1 + p2 * p2 / v2
    density = jnp.exp(-0.5 * quad) / (2.0 * jnp.pi * jnp.sqrt(v1 * v2))

    rates = jnp.sum(density * weights * self.normalizing_factor, axis=-1)
    return rates

  # -- (de)serialization: msgpack, same bundle keys as the reference
  # (graphene.py:392-427) so artifacts interoperate.

  def serialize_to_directory(self, save_dir) -> None:
    import os
    import msgpack

    from putting_dune_tpu.io import serialization

    os.makedirs(save_dir, exist_ok=True)
    bundle = {
        'sem_ver': '1.0.0',
        'max_rate': float(self.max_rate),
        'mixture_weights': np.asarray(self.mixture_weights),
        'loc_distances': np.asarray(self.loc_distances),
        'variances': np.asarray(self.variances),
    }
    path = os.path.join(save_dir, 'gmm_parameters.mpk')
    with open(path, 'wb') as f:
      f.write(msgpack.packb(bundle, default=serialization.msgpack_encode))

  @classmethod
  def deserialize_from_directory(cls, load_dir) -> (
      'GaussianMixtureRateFunction'):
    import os
    import msgpack

    from putting_dune_tpu.io import serialization

    path = os.path.join(load_dir, 'gmm_parameters.mpk')
    with open(path, 'rb') as f:
      bundle = msgpack.unpackb(
          f.read(),
          object_hook=serialization.msgpack_decode,
          # msgpack_numpy-layout array dicts use bytes keys (b'nd', ...).
          strict_map_key=False,
      )
    return cls(
        max_rate=bundle['max_rate'],
        mixture_weights=np.asarray(bundle['mixture_weights']),
        loc_distances=np.asarray(bundle['loc_distances']),
        variances=np.asarray(bundle['variances']),
    )

  @classmethod
  def sample_new(
      cls, rng: np.random.Generator
  ) -> 'GaussianMixtureRateFunction':
    """Random GMM for domain randomization (reference graphene.py:429-445)."""
    num_mixtures = rng.poisson(2.0) + 1
    max_rate = rng.uniform(0.01, 1.0)
    mixture_weights = rng.uniform(0.0, 10.0, size=(num_mixtures,))
    mixture_weights = mixture_weights / np.sum(mixture_weights)
    loc_distances = rng.uniform(-2.0, 3.0, size=(num_mixtures,))
    variances = rng.uniform(0.1, 5.0, size=(num_mixtures, 2))
    return cls(
        max_rate=max_rate,
        mixture_weights=mixture_weights,
        loc_distances=loc_distances,
        variances=variances,
    )

  def __eq__(self, other) -> bool:
    if not isinstance(other, GaussianMixtureRateFunction):
      return NotImplemented
    if (
        self.mixture_weights.shape != other.mixture_weights.shape
        or self.loc_distances.shape != other.loc_distances.shape
        or self.variances.shape != other.variances.shape
    ):
      return False
    return (
        abs(self.max_rate - other.max_rate) <= 1e-3
        and (np.abs(self.mixture_weights - other.mixture_weights) <= 1e-3)
        .all()
        and (np.abs(self.loc_distances - other.loc_distances) <= 1e-3).all()
        and (np.abs(self.variances - other.variances) <= 1e-3).all()
    )

  def __hash__(self):
    return hash((
        round(float(self.max_rate), 3),
        self.mixture_weights.shape,
    ))
