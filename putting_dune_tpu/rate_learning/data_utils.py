"""Dataset generation, augmentation and canonicalization for rate learning.

TPU-first rewrite of /root/reference/putting_dune/rate_learning/data_utils.py.
Semantics preserved:

  * 6-fold symmetry augmentation: optional y-reflection then all 3 lattice
    rotations (data_utils.py:49-155, 355-386);
  * synthetic data from the physical prior or a random network
    (data_utils.py:158-303);
  * bootstrap / fractional splits (data_utils.py:306-352);
  * canonical frame standardization: rotate so the neighbor nearest the
    beam lies on the +x axis (data_utils.py:389-432) — here also provided
    as a batched jnp version so the learned predictor can run inside the
    jitted simulator.
"""

from __future__ import annotations

import enum
import functools
from typing import Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import geometry


class SyntheticDataType(str, enum.Enum):
  NETWORK = 'network'
  PRIOR = 'prior'


# --- symmetry augmentation ---------------------------------------------------


def rotate_positions_all(position: jnp.ndarray, num_states: int = 3):
  """Stacks the position rotated by 2*pi*k/num_states, k=0..n-1."""
  rots = [
      geometry.rotate_coordinates(position, 2.0 * jnp.pi * k / num_states)
      for k in range(num_states)
  ]
  return jnp.stack(rots, 0)


def reflect_transitions(
    next_state: jnp.ndarray,
    dt: jnp.ndarray,
    rates: jnp.ndarray,
    position: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
):
  """Reflects a batch of transitions across y=0 (data_utils.py:85-105).

  Under the reflection, neighbor 0 (on the +x axis) is fixed and neighbors
  1 and 2 swap; state 0 means "no transition" and is preserved.
  """
  swap = jnp.asarray([0, 2, 1])
  ref_rates = rates[..., swap]
  ref_position = position * jnp.asarray([1.0, -1.0])
  ref_state = swap[jnp.maximum(next_state - 1, 0)] + 1
  ref_state = jnp.where(next_state > 0, ref_state, 0)
  return ref_state, dt, ref_rates, ref_position, context


def rotate_dataset(
    next_state: jnp.ndarray,
    dt: jnp.ndarray,
    rates: jnp.ndarray,
    position: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
    num_states: int = 3,
):
  """All lattice rotations of a dataset, concatenated (data_utils:111-155).

  Rotation k advances the neighbor labels by k (mod 3), rolls the rate
  vector accordingly, and rotates positions by 2*pi*k/3.
  """
  out_states, out_dt, out_rates, out_pos, out_ctx = [], [], [], [], []
  for k in range(num_states):
    rot_state = jnp.where(
        next_state > 0,
        (next_state - 1 + k) % num_states + 1,
        0,
    )
    out_states.append(rot_state)
    out_dt.append(dt)
    out_rates.append(jnp.roll(rates, k, axis=-1))
    out_pos.append(
        geometry.rotate_coordinates(position, 2.0 * jnp.pi * k / num_states)
    )
    if context is not None:
      out_ctx.append(context)
  return (
      jnp.concatenate(out_states),
      jnp.concatenate(out_dt),
      jnp.concatenate(out_rates),
      jnp.concatenate(out_pos),
      jnp.concatenate(out_ctx) if context is not None else None,
  )


def augment_data(
    next_state: jnp.ndarray,
    dt: jnp.ndarray,
    rates: jnp.ndarray,
    position: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
    reflect: bool = True,
    num_states: int = 3,
) -> Mapping[str, jnp.ndarray]:
  """Adds all valid reflections and rotations (data_utils.py:355-386)."""
  if reflect:
    r_state, r_dt, r_rates, r_pos, r_ctx = reflect_transitions(
        next_state, dt, rates, position, context
    )
    next_state = jnp.concatenate([next_state, r_state])
    dt = jnp.concatenate([dt, r_dt])
    rates = jnp.concatenate([rates, r_rates])
    position = jnp.concatenate([position, r_pos])
    if context is not None:
      context = jnp.concatenate([context, r_ctx])

  next_state, dt, rates, position, context = rotate_dataset(
      next_state, dt, rates, position, context, num_states=num_states
  )
  return {
      'next_state': next_state,
      'dt': dt,
      'rates': rates,
      'position': position,
      'context': context,
  }


# --- synthetic data ----------------------------------------------------------


def prior_rates_canonical(position: jnp.ndarray) -> jnp.ndarray:
  """Prior rates for a canonical 3-neighbor frame.

  rate_k = prior Gaussian evaluated at position rotated by 2*pi*k/3, peak
  SIGR_PRIOR_MAX_RATE (data_utils.py:252-257 + graphene.py:121-130).
  position: (..., 2) beam position in bond units.
  """
  mean = jnp.asarray(constants.SIGR_PRIOR_RATE_MEAN)
  var = float(constants.SIGR_PRIOR_RATE_COV[0, 0])
  rot = rotate_positions_all(position)  # (3, ..., 2)
  d2 = jnp.sum(jnp.square(rot - mean), axis=-1)
  rates = constants.SIGR_PRIOR_MAX_RATE * jnp.exp(-0.5 * d2 / var)
  return jnp.moveaxis(rates, 0, -1)  # (..., 3)


def generate_synthetic_data(
    num_data: int = 100,
    data_seed: Optional[int] = None,
    num_states: int = 3,
    position_dim: int = 2,
    context_dim: int = 2,
    actual_time_range: Tuple[float, float] = (0.0, 5.0),
    mode: SyntheticDataType = SyntheticDataType.PRIOR,
):
  """Synthetic transition datasets for tests/benchmarks (data_utils:158-303).

  Each record: context (noise dims), position (beam), true rates, an
  exposure window dt ~ U(time_range), and next_state in {0 = none,
  1..3 = neighbor} sampled from the rate law.

  Returns (train_data, test_data) dicts of arrays.
  """
  if data_seed is None:
    data_seed = 0
  key = jax.random.PRNGKey(data_seed)
  key, init_key = jax.random.split(key)

  if mode == SyntheticDataType.NETWORK:
    from putting_dune_tpu.rate_learning import model as model_lib

    init_fn, apply_fn = model_lib.get_mlp_fn(
        (1, 64), num_states, batchnorm=False
    )
    net_params, net_state = init_fn(
        init_key, jnp.zeros(context_dim + position_dim)
    )

  def sample_one(key):
    ks = jax.random.split(key, 6)
    if mode == SyntheticDataType.PRIOR:
      position = jax.random.multivariate_normal(
          ks[0],
          jnp.asarray(constants.SIGR_PRIOR_RATE_MEAN),
          jnp.asarray(constants.SIGR_PRIOR_RATE_COV) * 1.5,
      )
      context = jax.random.normal(ks[1], (context_dim,))
      rates = prior_rates_canonical(position)
      # Random lattice rotation for coverage.
      rot_k = jax.random.randint(ks[2], (), 0, num_states)
      position = geometry.rotate_coordinates(
          position, 2.0 * jnp.pi * rot_k / num_states
      )
      rates_rolled = jnp.roll(rates, rot_k)
      rates_for_choice = rates
      full_position = position
    else:
      full = jax.random.normal(ks[1], (context_dim + position_dim,))
      context = full[:context_dim]
      full_position = full[context_dim:]
      out, _ = apply_fn(net_params, net_state, ks[2], full, False)
      rates_for_choice = out[:-1]
      rates_rolled = rates_for_choice
      rot_k = jnp.asarray(0)

    total = jnp.sum(rates_for_choice)
    probs = rates_for_choice / total
    raw_state = jax.random.choice(ks[3], num_states, (), p=probs)
    raw_state = (raw_state + rot_k) % num_states
    next_time = jax.random.exponential(ks[4]) / total
    dt = jax.random.uniform(
        ks[5], (), minval=actual_time_range[0], maxval=actual_time_range[1]
    )
    transitioned = next_time < dt
    next_state = jnp.where(transitioned, raw_state + 1, 0)
    return {
        'next_state': next_state.astype(jnp.int32),
        'dt': dt,
        'rates': rates_rolled,
        'context': context,
        'position': full_position,
    }

  def sample_dataset(key):
    keys = jax.random.split(key, num_data)
    return jax.vmap(sample_one)(keys)

  train_key, test_key = jax.random.split(key)
  return sample_dataset(train_key), sample_dataset(test_key)


# --- splits ------------------------------------------------------------------


def bootstrap_dataset(data: Mapping[str, np.ndarray], seed: int):
  """Bootstrap resample; test set = out-of-bag samples (data_utils:306-325)."""
  rng = np.random.default_rng(seed)
  n = len(next(iter(data.values())))
  indices = rng.choice(n, size=n, replace=True)
  train = {k: np.asarray(a)[indices] for k, a in data.items()}
  oob = np.setdiff1d(np.arange(n), indices)
  test = {k: np.asarray(a)[oob] for k, a in data.items()}
  return train, test


def split_dataset(
    data: Mapping[str, np.ndarray], seed: int, test_fraction: float = 0.1
):
  """Random train/test split (data_utils.py:328-352)."""
  rng = np.random.default_rng(seed)
  n = len(next(iter(data.values())))
  perm = rng.permutation(n)
  cut = int(n * test_fraction)
  test_idx, train_idx = perm[:cut], perm[cut:]
  train = {k: np.asarray(a)[train_idx] for k, a in data.items()}
  test = {k: np.asarray(a)[test_idx] for k, a in data.items()}
  return train, test


# --- canonicalization --------------------------------------------------------


def standardize_beam_and_neighbors(
    beam_position: np.ndarray, neighbor_position: np.ndarray
):
  """Rotates so the neighbor nearest the beam lies on +x (host, numpy).

  Parity: data_utils.py:389-432 (including the reference's mixed units:
  the beam is typically pre-scaled to bond units while neighbors stay in
  angstroms; the nearest-neighbor choice uses those raw values).

  Returns (rotated beam, rotated neighbors, state_order) where state_order
  maps canonical rank (CCW from +x) -> original neighbor index.
  """
  beam = np.asarray(beam_position).reshape(1, 2)
  nbrs = np.asarray(neighbor_position).reshape(-1, 2)
  nearest = np.argmin(np.linalg.norm(nbrs - beam, axis=1))
  angles = np.arctan2(nbrs[:, 1], nbrs[:, 0])
  rot = -angles[nearest]

  cos, sin = np.cos(rot), np.sin(rot)
  mat = np.array([[cos, sin], [-sin, cos]])
  new_nbrs = nbrs @ mat
  new_beam = beam @ mat

  positive = (angles + rot) % (2 * np.pi)
  state_order = np.argsort(positive)
  return new_beam, new_nbrs, state_order


def standardize_batched(
    beam_position: jnp.ndarray, neighbor_position: jnp.ndarray
):
  """Batched jnp standardization for in-simulator learned rate prediction.

  Args:
    beam_position: (B, 2) beam relative to silicon (bond units).
    neighbor_position: (B, 3, 2) neighbors relative to silicon (angstroms).

  Returns:
    (rotated beam (B, 2), rotated neighbors (B, 3, 2), state_order (B, 3)).
  """
  d = jnp.linalg.norm(
      neighbor_position - beam_position[:, None, :], axis=-1
  )
  nearest = jnp.argmin(d, axis=-1)  # (B,)
  angles = geometry.get_angles(neighbor_position)  # (B, 3)
  rot = -jnp.take_along_axis(angles, nearest[:, None], axis=-1)[:, 0]

  new_nbrs = geometry.rotate_coordinates(neighbor_position, rot[:, None])
  new_beam = geometry.rotate_coordinates(beam_position, rot)
  positive = jnp.mod(angles + rot[:, None], 2.0 * jnp.pi)
  state_order = jnp.argsort(positive, axis=-1)
  return new_beam, new_nbrs, state_order
