"""Exponential-survival likelihood loss for rate learning.

Parity: reference learn_rates.py:102-164 (batched_loss_fn). The model emits
[directional logits..., total rate]; the loss combines:

  * total-rate survival likelihood: P(no transition in dt) = exp(-rate*dt),
    so -log P(transition) = -log(1 - exp(-rate*dt)) for transitioned rows
    and rate*dt for untransitioned rows;
  * a cross-entropy over WHICH neighbor was chosen, masked to rows that
    transitioned (next_state in {1..3}; 0 = none).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def batched_loss_fn(
    params,
    network_state,
    apply_fn,
    next_state: jnp.ndarray,
    elapsed_time: jnp.ndarray,
    did_transition: jnp.ndarray,
    context: jnp.ndarray,
    key: jax.Array,
    is_training: bool = True,
    class_loss_weight: float = 1.0,
    rate_loss_weight: float = 1.0,
):
  """Mean loss over a minibatch; aux = (state, rates, rate/class losses)."""
  next_state = next_state.reshape(-1)
  elapsed_time = elapsed_time.reshape(-1)
  did_transition = did_transition.reshape(-1).astype(jnp.float32)

  predicted, network_state = apply_fn(
      params, network_state, key, context, is_training
  )
  total_rate = predicted[:, -1]
  no_transition_prob = jnp.exp(-total_rate * elapsed_time)
  no_transition_prob = jnp.clip(no_transition_prob, max=1.0 - 1e-6)
  rate_loss = -(
      did_transition * jnp.log1p(-no_transition_prob)
      + (1.0 - did_transition) * (-total_rate * elapsed_time)
  )

  logprobs = jax.nn.log_softmax(predicted[:, :-1], axis=-1)
  chosen = jnp.take_along_axis(
      logprobs, jnp.maximum(next_state - 1, 0)[:, None], axis=-1
  )[:, 0]
  class_loss = -chosen * did_transition

  losses = class_loss * class_loss_weight + rate_loss * rate_loss_weight
  per_neighbor_rates = (
      jax.nn.softmax(predicted[:, :-1], axis=-1) * predicted[:, -1:]
  )
  return (
      jnp.mean(losses),
      (network_state, per_neighbor_rates, rate_loss, class_loss),
  )


def predicted_rates_to_per_neighbor(predicted: jnp.ndarray) -> jnp.ndarray:
  """[logits..., total] -> per-neighbor rates (softmax * total)."""
  return jax.nn.softmax(predicted[..., :-1], axis=-1) * predicted[..., -1:]
