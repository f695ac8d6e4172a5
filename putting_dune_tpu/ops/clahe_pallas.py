"""Pallas TPU kernel for the CLAHE LUT interpolation.

The XLA formulation (imaging/clahe.py) expresses the per-pixel LUT lookup
as a dual-block one-hot matmul, which works but streams a ~2 GB one-hot
through HBM per 256-frame batch. This kernel keeps the one-hot in VMEM:
each grid program handles one batch element, loops over its dual blocks,
builds the (P, nbins) one-hot in VMEM, multiplies against the four corner
LUTs on the MXU, and applies the bilinear weights — HBM traffic is just
bins in / LUTs in / pixels out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_kernel(bins_ref, luts_ref, wgt_ref, out_ref):
  """out[k, p] = sum_c wgt[p, c] * luts[k, bin[k, p], c] for one batch elem.

  Shapes (leading batch-block dim of 1 stripped by indexing):
    bins_ref: (1, K, P) int32; luts_ref: (1, K, V, 4) f32;
    wgt_ref: (P, 4) f32; out_ref: (1, K, P) f32.
  """
  k_blocks = bins_ref.shape[1]
  p = bins_ref.shape[2]
  nbins = luts_ref.shape[2]

  def body(i, _):
    bins = bins_ref[0, i, :]  # (P,)
    onehot = (
        bins[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (p, nbins), 1)
    ).astype(jnp.bfloat16)
    vals = jnp.dot(
        onehot,
        luts_ref[0, i, :, :].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (P, 4)
    out_ref[0, i, :] = jnp.sum(vals * wgt_ref[:, :], axis=-1)
    return ()

  jax.lax.fori_loop(0, k_blocks, body, ())


def _k_chunk(k: int, v: int, p: int) -> int:
  """Largest divisor of k keeping the per-program VMEM block under ~2 MB."""
  budget = 2 * 1024 * 1024
  per_block = v * 4 * 4 + p * 4 * 2  # luts f32 x4 + bins/out
  best = 1
  for c in range(1, k + 1):
    if k % c == 0 and c * per_block <= budget:
      best = c
  return best


@functools.partial(jax.jit, static_argnames=('interpret',))
def clahe_interpolate(
    blocks: jnp.ndarray,  # (B, K, P) int32 dual-block pixel bins
    luts: jnp.ndarray,  # (B, K, V, 4) float32 corner LUTs
    weights: jnp.ndarray,  # (P, 4) float32 bilinear weights
    interpret: bool = False,
) -> jnp.ndarray:
  """Applies the 4-corner LUT interpolation with a Pallas kernel.

  Returns (B, K, P) float32 remapped pixels.
  """
  b, k, p = blocks.shape
  v = luts.shape[2]
  kc = _k_chunk(k, v, p)

  def call(blocks_c, luts_c):
    bc = blocks_c.shape[0]
    return pl.pallas_call(
        _interp_kernel,
        grid=(bc, k // kc),
        in_specs=[
            pl.BlockSpec((1, kc, p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, v, 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kc, p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, k, p), jnp.float32),
        interpret=interpret,
    )(blocks_c, luts_c, weights)

  # Chunk the batch so XLA never stages a large custom-call output in
  # scoped VMEM (observed with whole-batch outputs on v5e).
  chunk = 8
  if b % chunk != 0:
    return call(blocks, luts)
  blocks_c = blocks.reshape(b // chunk, chunk, k, p)
  luts_c = luts.reshape(b // chunk, chunk, k, v, 4)
  out = jax.lax.map(lambda args: call(*args), (blocks_c, luts_c))
  return out.reshape(b, k, p)
