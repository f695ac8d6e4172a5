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
    q_ref,  # scratch (G1*G1, 2, 2, V) f32 per-block quadrant histograms
    oh_ref,  # scratch (G1*G1, P, V) int8 cached per-block one-hots
    *,
    g: int,
    th: int,
    tw: int,
    nbins: int,
    clip_limit: float,
):
  """Three phases per image, all in VMEM.

  The one-hot compare is the dominant VPU cost, so it runs ONCE per block:
  phase 1 builds it block-by-block (small temps), caches it as int8 (half
  the VMEM of bf16), and phase 3 re-reads the cache in 27-block slices for
  batched MXU dots. One-hot counting is exact in bf16/int8 (0/1 values,
  quadrant counts are small integers).
  """
  g1 = g + 1
  k = g1 * g1
  p = th * tw
  npx = float(th * tw)

  # Slice size over the block axis (phase 3): a divisor of K.
  slc = 27 if k % 27 == 0 else g1  # divisor of K = g1*g1
  bin_iota = jax.lax.broadcasted_iota(jnp.int32, (p, nbins), 1)

  # ---- phase 1: per-block quadrant histograms via slab sums ----
  # Quadrants are contiguous half-row/half-col slabs of the row-major
  # (th, tw) block, so their sums are plain reductions over non-minor axes.
  # One block at a time: the (P, V) compare temp is 131 KB, leaving VMEM
  # for the full one-hot cache.
  for a in range(k):
    oh = (blocks_ref[0, a, :][:, None] == bin_iota).astype(jnp.int8)
    oh_ref[a, :, :] = oh
    q_ref[a] = jnp.sum(
        oh.astype(jnp.bfloat16).reshape(2, th // 2, 2, tw // 2, nbins),
        axis=(1, 3),
        dtype=jnp.float32,
    )  # (2, 2, V); [r, c]: r=0 top rows, r=1 bottom rows.

  q = q_ref[:, :, :, :].reshape(g1, g1, 2, 2, nbins)
  # Tile (ti, tj) = BR of dual (ti, tj) + BL of dual (ti, tj+1)
  # + TR of dual (ti+1, tj) + TL of dual (ti+1, tj+1).
  hist = (
      q[:g, :g, 1, 1]
      + q[:g, 1:, 1, 0]
      + q[1:, :g, 0, 1]
      + q[1:, 1:, 0, 0]
  )  # (g, g, V)

  # ---- phase 2: clip + redistribute + cdf ----
  hist = hist.reshape(g * g, nbins)
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
  mapping = (cdf / cdf[:, -1:]).reshape(g, g, nbins)

  # ---- phase 3: corner-LUT interpolation, batched over blocks ----
  # Corner LUTs per dual block (i, j): tiles (clip(i-1), clip(i)) x
  # (clip(j-1), clip(j)), built by edge replication (static slices).
  mpr = jnp.concatenate([mapping[:1], mapping, mapping[-1:]], axis=0)
  mpc = jnp.concatenate([mpr[:, :1], mpr, mpr[:, -1:]], axis=1)
  # (g+2, g+2, V)
  luts = jnp.stack(
      [
          mpc[0:g1, 0:g1],  # (i-1, j-1)
          mpc[0:g1, 1:g1 + 1],  # (i-1, j)
          mpc[1:g1 + 1, 0:g1],  # (i,   j-1)
          mpc[1:g1 + 1, 1:g1 + 1],  # (i,   j)
      ],
      axis=2,
  ).reshape(k, 4, nbins).astype(jnp.bfloat16)

  wgt_t = wgt_ref[:, :].T  # (4, P)
  for a in range(0, k, slc):
    vals = jax.lax.dot_general(
        luts[a:a + slc],
        oh_ref[a:a + slc].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (slc, 4, P)
    out_ref[0, a:a + slc, :] = jnp.sum(vals * wgt_t[None, :, :], axis=1)


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

  def call(x):
    c = x.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, k, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, k, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, 2, 2, nbins), jnp.float32),
            pltpu.VMEM((k, p, nbins), jnp.int8),
        ],
        interpret=interpret,
    )(x, weights)

  return call(blocks)
