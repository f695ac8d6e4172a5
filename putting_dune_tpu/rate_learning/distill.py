"""Ensemble-to-single distillation on synthetic Gaussian data.

Parity: reference learn_rates.py:332-527. The student is trained to match
the ensemble's mean per-neighbor rates on Gaussian-resampled contexts
(mean/std from the real data).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from putting_dune_tpu.rate_learning import losses


def distill_loss(
    params,
    network_state,
    ensemble_params,
    ensemble_state,
    key: jax.Array,
    batch_size: int,
    apply_fn,
    data_mean: jnp.ndarray,
    data_scale: jnp.ndarray,
):
  """L2 between student and mean-teacher per-neighbor rates (ref :332-394)."""
  rng, data_key, eval_key = jax.random.split(key, 3)
  datapoints = (
      jax.random.normal(
          data_key, (batch_size, *data_mean.shape), dtype=jnp.float32
      )
      * data_scale
      + data_mean
  )

  @functools.partial(jax.vmap, in_axes=(0, 0, None, None))
  def teacher_apply(params, state, x, key):
    out, _ = apply_fn(params, state, key, x, False)
    return losses.predicted_rates_to_per_neighbor(out)

  targets = teacher_apply(
      ensemble_params, ensemble_state, datapoints, eval_key
  ).mean(0)

  pred, network_state = apply_fn(
      params, network_state, rng, datapoints, True
  )
  pred = losses.predicted_rates_to_per_neighbor(pred)
  loss = jnp.mean(jnp.sum(jnp.square(pred - targets), axis=-1))
  return loss, network_state


@functools.partial(
    jax.jit,
    static_argnames=('optim', 'batch_size', 'apply_fn', 'batches'),
)
def distill_train_epoch(
    params,
    network_state,
    ensemble_params,
    ensemble_state,
    opt_state,
    key: jax.Array,
    batches: int,
    optim,
    batch_size: int,
    apply_fn,
    data_mean: jnp.ndarray,
    data_scale: jnp.ndarray,
):
  """One scanned distillation epoch (reference learn_rates.py:397-474)."""

  def step(carry, key):
    params, network_state, opt_state = carry
    grad_fn = jax.value_and_grad(distill_loss, has_aux=True)
    (loss, network_state), grad = grad_fn(
        params,
        network_state,
        ensemble_params,
        ensemble_state,
        key,
        batch_size,
        apply_fn,
        data_mean,
        data_scale,
    )
    updates, opt_state = optim.update(grad, opt_state, params=params)
    params = optax.apply_updates(params, updates)
    return (params, network_state, opt_state), loss

  keys = jax.random.split(key, batches)
  (params, network_state, opt_state), losses_out = jax.lax.scan(
      step, (params, network_state, opt_state), keys
  )
  return params, network_state, opt_state, keys[-1], jnp.mean(losses_out)


def distill_multiple_models_to_single(
    key: jax.Array,
    optim,
    apply_fn,
    init_fn,
    ensemble_params,
    ensemble_state,
    batch_size: int,
    epochs: int,
    batches_per_epoch: int,
    data_mean: jnp.ndarray,
    data_scale: jnp.ndarray,
):
  """Distills the ensemble into one student (reference :477-527)."""
  train_key, init_key = jax.random.split(key)
  params, network_state = init_fn(init_key, data_mean[None])
  opt_state = optim.init(params)

  history = np.zeros(epochs, dtype=np.float32)
  for i in range(epochs):
    params, network_state, opt_state, train_key, loss = distill_train_epoch(
        params,
        network_state,
        ensemble_params,
        ensemble_state,
        opt_state,
        train_key,
        batches_per_epoch,
        optim,
        batch_size,
        apply_fn,
        data_mean,
        data_scale,
    )
    history[i] = float(loss)

  return params, network_state, train_key, {'distill_loss': history}
