"""Fully-fused Pallas CLAHE kernel.

The XLA formulation (imaging/clahe.py) is HBM-traffic-bound: the
(pixels x bins) one-hot is materialized (~1 GB per 256-frame batch) and
read twice. This kernel keeps everything per-image in VMEM: per dual
block it builds the one-hot once in registers/VMEM, accumulates the
quadrant histogram contributions, then (after clip + cdf) multiplies the
same-shape comparison matrix against the 4 corner LUTs on the MXU. HBM
traffic is bins in + pixels out.

Semantics identical to imaging.clahe.equalize_adapthist (exact: both
compute f32 histograms; the LUT matmul is bf16 like the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    blocks_ref,  # (1, G1*G1, P) int32 dual-block pixel bins
    wgt_ref,  # (P, 4) f32 bilinear weights
    out_ref,  # (1, G1*G1, P) f32
    hist_ref,  # scratch (G*G, V) f32 per-tile histograms
    luts_ref,  # scratch (4, V) f32 corner LUTs of the current block
    oh_ref,  # scratch (G1*G1, P, V) bf16 cached per-block one-hots
    *,
    g: int,
    th: int,
    tw: int,
    nbins: int,
    clip_limit: float,
):
  g1 = g + 1
  p = th * tw
  npx = float(th * tw)

  bin_iota = jax.lax.broadcasted_iota(jnp.int32, (p, nbins), 1)
  # Quadrant masks over the in-block pixel axis (row-major th x tw), as a
  # (4, P) matrix so the per-quadrant histogram sums ride the MXU. bf16 is
  # exact here: masks are 0/1 and quadrant counts are small integers.
  row_ids = jax.lax.broadcasted_iota(jnp.int32, (4, p), 1) // tw
  col_ids = jax.lax.broadcasted_iota(jnp.int32, (4, p), 1) % tw
  quad_id = jax.lax.broadcasted_iota(jnp.int32, (4, p), 0)
  top = row_ids < th // 2
  left = col_ids < tw // 2
  # Rows: 0=TL, 1=TR, 2=BL, 3=BR.
  want_top = quad_id < 2
  want_left = (quad_id % 2) == 0
  quad_masks = jnp.logical_and(
      top == want_top, left == want_left
  ).astype(jnp.bfloat16)

  # ---- phase 1: per-tile histograms from dual-block quadrant sums ----
  hist_ref[:, :] = jnp.zeros((g * g, nbins), jnp.float32)

  # Unrolled at trace time: k is static, so the border conditions and tile
  # indices are static (no dynamic control flow / dynamic scatter).
  for k in range(g1 * g1):
    i, j = divmod(k, g1)
    onehot = (blocks_ref[0, k, :][:, None] == bin_iota).astype(jnp.bfloat16)
    oh_ref[k, :, :] = onehot  # cached for the interpolation phase
    qsum = jax.lax.dot_general(
        quad_masks, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4, V): rows TL, TR, BL, BR
    # Tile (ti, tj) = BR(ti, tj) + BL(ti, tj+1) + TR(ti+1, tj)
    # + TL(ti+1, tj+1)  [dual-block indices]. Invert: this block (i, j)
    # contributes BR -> tile (i, j), BL -> tile (i, j-1),
    # TR -> tile (i-1, j), TL -> tile (i-1, j-1), borders dropped.
    if i < g and j < g:
      t = i * g + j
      hist_ref[t, :] = hist_ref[t, :] + qsum[3, :]
    if i < g and j >= 1:
      t = i * g + (j - 1)
      hist_ref[t, :] = hist_ref[t, :] + qsum[2, :]
    if i >= 1 and j < g:
      t = (i - 1) * g + j
      hist_ref[t, :] = hist_ref[t, :] + qsum[1, :]
    if i >= 1 and j >= 1:
      t = (i - 1) * g + (j - 1)
      hist_ref[t, :] = hist_ref[t, :] + qsum[0, :]

  # ---- phase 2: clip + redistribute + cdf -> mapping in-place ----
  hist = hist_ref[:, :]
  clim = max(clip_limit * npx, 1.0)
  excess = jnp.sum(jnp.maximum(hist - clim, 0.0), axis=-1, keepdims=True)
  hist = jnp.minimum(hist, clim) + excess / nbins
  # cumsum isn't lowerable on Mosaic TC; a lower-triangular matmul is, and
  # the (V, V) mask rides the MXU.
  tri = (
      jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 0)
      <= jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 1)
  ).astype(jnp.float32)
  cdf = jax.lax.dot_general(
      hist, tri,
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  hist_ref[:, :] = cdf / cdf[:, -1:]

  # ---- phase 3: per-block corner-LUT interpolation (static unroll) ----
  wgt_t = wgt_ref[:, :].T  # (4, P)
  for k in range(g1 * g1):
    i, j = divmod(k, g1)
    ci0 = min(max(i - 1, 0), g - 1)
    ci1 = min(max(i, 0), g - 1)
    cj0 = min(max(j - 1, 0), g - 1)
    cj1 = min(max(j, 0), g - 1)
    luts_ref[0, :] = hist_ref[ci0 * g + cj0, :]
    luts_ref[1, :] = hist_ref[ci0 * g + cj1, :]
    luts_ref[2, :] = hist_ref[ci1 * g + cj0, :]
    luts_ref[3, :] = hist_ref[ci1 * g + cj1, :]

    vals = jax.lax.dot_general(
        luts_ref[:, :].astype(jnp.bfloat16),
        oh_ref[k, :, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4, P)
    out_ref[0, k, :] = jnp.sum(vals * wgt_t, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=('g', 'th', 'tw', 'nbins', 'clip_limit', 'interpret'),
)
def clahe_fused(
    blocks: jnp.ndarray,  # (B, (g+1)^2, th*tw) int32 dual-block bins
    weights: jnp.ndarray,  # (th*tw, 4) f32 bilinear weights
    *,
    g: int,
    th: int,
    tw: int,
    nbins: int = 256,
    clip_limit: float = 0.01,
    interpret: bool = False,
) -> jnp.ndarray:
  """Returns (B, (g+1)^2, th*tw) remapped pixels."""
  b, k, p = blocks.shape
  kernel = functools.partial(
      _kernel, g=g, th=th, tw=tw, nbins=nbins, clip_limit=clip_limit
  )
  return pl.pallas_call(
      kernel,
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, k, p), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((p, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, k, p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, k, p), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((g * g, nbins), jnp.float32),
          pltpu.VMEM((4, nbins), jnp.float32),
          pltpu.VMEM((k, p, nbins), jnp.bfloat16),
      ],
      interpret=interpret,
  )(blocks, weights)
