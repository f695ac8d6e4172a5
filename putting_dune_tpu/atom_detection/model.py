"""UNet for STEM-image semantic segmentation.

Capability parity with the reference UNet (atom_detection/model.py:38-85):
encoder-decoder with skip connections, LayerNorm + GeLU, default feature
pyramid 64..1024, 1x1 conv head over num_classes (background / carbon /
silicon). Written iteratively (explicit down/up loops) rather than
recursively, and over batched NHWC inputs directly so the MXU sees large
convolutions without an outer vmap.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class UNet(nn.Module):
  """Encoder-decoder segmentation network.

  Input (B, H, W, C) -> logits (B, H, W, num_classes). H, W must be
  divisible by 2**(len(features)-1).
  """

  num_classes: int = 3
  features: Sequence[int] = (64, 128, 256, 512, 1024)
  activation: Callable[[jax.Array], jax.Array] = nn.gelu

  def _block(self, x: jax.Array, width: int, name: str) -> jax.Array:
    x = nn.Conv(width, (3, 3), padding='SAME', name=name)(x)
    x = nn.LayerNorm()(x)
    return self.activation(x)

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    single = x.ndim == 3
    if single:
      x = x[None]

    skips = []
    for depth, width in enumerate(self.features[:-1]):
      x = self._block(x, width, f'down_{depth}')
      skips.append(x)
      x = nn.max_pool(x, (2, 2), strides=(2, 2))

    x = self._block(x, self.features[-1], 'bottleneck')

    for depth in reversed(range(len(self.features) - 1)):
      width = self.features[depth]
      x = nn.ConvTranspose(
          width, (3, 3), strides=(2, 2), padding='SAME',
          name=f'up_transpose_{depth}',
      )(x)
      x = jnp.concatenate([x, skips[depth]], axis=-1)
      x = self._block(x, width, f'up_{depth}')

    x = nn.Conv(self.num_classes, (1, 1), name='head')(x)
    return x[0] if single else x
