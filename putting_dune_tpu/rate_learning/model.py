"""The rate-prediction MLP.

TPU-first rewrite of the reference Haiku model (learn_rates.py:80-99):
a flax.linen MLP with optional BatchNorm input normalization and swish
activations, emitting softplus(num_states directional logits + total rate)
so outputs live in (0, inf). The (init_fn, apply_fn) pair mirrors the
reference's functional calling convention so the ensemble trains as ONE
vmapped program.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Params = dict
State = dict
ApplyFn = Callable[..., Tuple[jnp.ndarray, State]]


class RateMLP(nn.Module):
  """MLP emitting (num_states + 1) positive outputs.

  Output layout (matching the reference head): [:-1] are directional logits
  (softmax gives per-neighbor probabilities), [-1] is the total rate.
  """

  hidden_dimensions: Sequence[int] = (64, 64)
  num_states: int = 3
  batchnorm: bool = True
  dropout_rate: float = 0.0

  @nn.compact
  def __call__(self, x: jnp.ndarray, *, is_training: bool = True):
    if self.batchnorm:
      x = nn.BatchNorm(
          use_running_average=not is_training,
          momentum=0.9,
          use_bias=True,
          use_scale=True,
      )(x)
    for width in self.hidden_dimensions:
      x = nn.Dense(width)(x)
      x = nn.swish(x)
      if self.dropout_rate > 0.0:
        x = nn.Dropout(self.dropout_rate, deterministic=not is_training)(x)
    x = nn.Dense(self.num_states + 1)(x)
    return jax.nn.softplus(x)


def get_mlp_fn(
    hidden_dimensions: Sequence[int] = (64, 64),
    num_states: int = 3,
    batchnorm: bool = True,
    dropout_rate: float = 0.0,
):
  """Returns (init_fn, apply_fn) with the reference calling convention.

  init_fn(key, x)                              -> (params, state)
  apply_fn(params, state, key, x, is_training) -> (outputs, new_state)

  `state` holds BatchNorm running statistics (flax 'batch_stats').
  """
  module = RateMLP(
      hidden_dimensions=tuple(hidden_dimensions),
      num_states=num_states,
      batchnorm=batchnorm,
      dropout_rate=dropout_rate,
  )

  def init_fn(key, x):
    if x.ndim == 1:
      x = x[None]
    variables = module.init(
        {'params': key, 'dropout': key}, x, is_training=True
    )
    params = variables['params']
    state = variables.get('batch_stats', {})
    return params, state

  def apply_fn(params, state, key, x, is_training=True):
    squeeze = x.ndim == 1
    if squeeze:
      x = x[None]
    variables = {'params': params, 'batch_stats': state}
    if is_training:
      out, mutated = module.apply(
          variables,
          x,
          is_training=True,
          rngs={'dropout': key},
          mutable=['batch_stats'],
      )
      new_state = mutated.get('batch_stats', state)
    else:
      out = module.apply(
          variables, x, is_training=False, rngs={'dropout': key}
      )
      new_state = state
    if squeeze:
      out = out[0]
    return out, new_state

  return init_fn, apply_fn
