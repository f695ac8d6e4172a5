"""Contrast-limited adaptive histogram equalization (CLAHE) on TPU.

The reference finishes its STEM pipeline with skimage's equalize_adapthist
(reference imaging.py:264). skimage is not a dependency here; this is this
framework's native fixed-grid CLAHE, jit-safe with static shapes:

  * the image is divided into a grid x grid tile mesh (default 8x8, matching
    skimage's default kernel of 1/8 image size);
  * per-tile histograms over `nbins` gray levels are computed via a
    sort + searchsorted cumulative count (no scatter, no (pixels x bins)
    materialization — TPU-friendly);
  * histograms are clipped at clip_limit * tile_pixels with the excess mass
    redistributed uniformly;
  * each pixel is remapped through the CDFs of its 4 surrounding tiles with
    bilinear interpolation.

Output is in [0, 1]. This matches skimage qualitatively (same algorithm
family and defaults) but is not bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=('clip_limit', 'grid_size', 'nbins')
)
def equalize_adapthist(
    image: jnp.ndarray,
    clip_limit: float = 0.01,
    grid_size: int = 8,
    nbins: int = 256,
) -> jnp.ndarray:
  """Applies CLAHE to a batch of frames.

  Args:
    image: (B, H, W) float32 in [0, 1]; H and W must be divisible by
      grid_size.
    clip_limit: histogram clip fraction (of tile pixel count).
    grid_size: tiles per side.
    nbins: gray-level bins.

  Returns:
    (B, H, W) float32 in [0, 1].
  """
  b, h, w = image.shape
  g = grid_size
  if h % g or w % g:
    raise ValueError(f'Image dims ({h}, {w}) must be divisible by {g}.')
  th, tw = h // g, w // g
  npx = th * tw

  bins = jnp.clip((image * nbins).astype(jnp.int32), 0, nbins - 1)

  # (B, g, g, tile_pixels)
  tiles = bins.reshape(b, g, th, g, tw).transpose(0, 1, 3, 2, 4)
  tiles = tiles.reshape(b, g, g, npx)

  # Cumulative counts via sort + searchsorted: cum[v] = #(pixels <= v).
  sorted_tiles = jnp.sort(tiles, axis=-1)
  levels = jnp.arange(nbins, dtype=jnp.int32)
  cum = jax.vmap(
      lambda s: jnp.searchsorted(s, levels, side='right'),
  )(sorted_tiles.reshape(-1, npx)).reshape(b, g, g, nbins)
  hist = jnp.diff(cum, axis=-1, prepend=0).astype(jnp.float32)

  # Clip + uniform redistribution of the excess.
  clim = jnp.maximum(clip_limit * npx, 1.0)
  excess = jnp.sum(jnp.maximum(hist - clim, 0.0), axis=-1, keepdims=True)
  hist = jnp.minimum(hist, clim) + excess / nbins

  cdf = jnp.cumsum(hist, axis=-1)
  mapping = cdf / cdf[..., -1:]  # (B, g, g, nbins) in (0, 1]

  # Bilinear interpolation between the 4 surrounding tile mappings.
  def axis_weights(extent: int, tile: int):
    coords = (jnp.arange(extent, dtype=jnp.float32) + 0.5) / tile - 0.5
    i0 = jnp.clip(jnp.floor(coords), 0, g - 2).astype(jnp.int32)
    frac = jnp.clip(coords - i0.astype(jnp.float32), 0.0, 1.0)
    return i0, frac

  ry0, rfy = axis_weights(h, th)  # (H,)
  cx0, cfx = axis_weights(w, tw)  # (W,)

  flat_map = mapping.reshape(b, g * g * nbins)

  def corner(dy: int, dx: int) -> jnp.ndarray:
    ty = (ry0 + dy)[None, :, None]  # (1, H, 1)
    tx = (cx0 + dx)[None, None, :]  # (1, 1, W)
    idx = (ty * g + tx) * nbins + bins  # (B, H, W)
    return jnp.take_along_axis(flat_map, idx.reshape(b, -1), axis=-1).reshape(
        b, h, w
    )

  wy = rfy[None, :, None]
  wx = cfx[None, None, :]
  out = (
      corner(0, 0) * (1 - wy) * (1 - wx)
      + corner(0, 1) * (1 - wy) * wx
      + corner(1, 0) * wy * (1 - wx)
      + corner(1, 1) * wy * wx
  )
  return out
