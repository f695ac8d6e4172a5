"""Global-local UNet: per-pixel segmentation + global drift regression.

Capability parity with the reference GlobalLocalUNet
(image_alignment/model.py:38-105): a UNet trunk over a T-frame stack whose
bottleneck also feeds a global head (1x1 conv -> LayerNorm -> GeLU ->
spatial mean -> Dense) regressing the per-frame drift. Local output:
(B, H, W, local_output_size); global output: (B, global_output_size).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GlobalLocalUNet(nn.Module):
  """UNet emitting (segmentation logits, global drift vector)."""

  local_output_size: int = 3
  global_output_size: int = 2
  features: Sequence[int] = (64, 128, 256, 512, 1024)
  activation: Callable[[jax.Array], jax.Array] = nn.gelu

  def _block(self, x, width, name, kernel=(3, 3)):
    x = nn.Conv(width, kernel, padding='SAME', name=name)(x)
    x = nn.LayerNorm()(x)
    return self.activation(x)

  @nn.compact
  def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    single = x.ndim == 3
    if single:
      x = x[None]

    x = self._block(x, self.features[0], 'stem', kernel=(7, 7))

    skips = []
    for depth, width in enumerate(self.features[:-1]):
      x = self._block(x, width, f'down_{depth}')
      skips.append(x)
      x = nn.max_pool(x, (2, 2), strides=(2, 2))

    x = self._block(x, self.features[-1], 'bottleneck')
    bottleneck = x

    for depth in reversed(range(len(self.features) - 1)):
      width = self.features[depth]
      x = nn.ConvTranspose(
          width, (3, 3), strides=(2, 2), padding='SAME',
          name=f'up_transpose_{depth}',
      )(x)
      x = jnp.concatenate([x, skips[depth]], axis=-1)
      x = self._block(x, width, f'up_{depth}')

    local = nn.Conv(
        self.local_output_size, (7, 7), padding='SAME', name='local_head'
    )(x)

    g = nn.Conv(256, (1, 1), name='global_conv')(bottleneck)
    g = nn.LayerNorm()(g)
    g = self.activation(g)
    g = g.mean(axis=(-2, -3))
    global_out = nn.Dense(self.global_output_size, name='global_head')(g)

    if single:
      return local[0], global_out[0]
    return local, global_out
