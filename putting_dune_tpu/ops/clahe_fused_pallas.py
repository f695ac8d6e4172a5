"""Fully-fused Pallas CLAHE kernel.

The XLA formulation (imaging/clahe.py) is HBM-traffic-bound: the
(pixels x bins) one-hot is materialized (~1 GB per 256-frame batch) and
read twice. This kernel keeps everything per-image in VMEM: per-tile
histograms come from a hi/lo-nibble factorization contracted on the MXU
(_nibble_histograms — 16x fewer VPU compares than a direct one-hot),
clip + cdf run as a triangular matmul, and every pixel of the
dual-block (half-tile-offset) layout is remapped through its four
corner LUTs with native lane gathers (Mosaic lowers take_along_axis
when the gather dimension fits one 128-lane vreg, so each LUT is
gathered in 128-bin segments + select). HBM traffic is bins in +
pixels out. Measured 0.82 ms per 256-frame 128x128 round on a v5e —
10x the XLA path (3.0 ms with the earlier all-compare phase 1).

Semantics identical to imaging.clahe.equalize_adapthist; the LUT lookup
here is exact f32 (the XLA path quantizes the LUT matmul to bf16 on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tiles per block-diagonal nibble matmul: M = N = _NIBBLE_SLC * 16 = 128,
# exactly one MXU tile. See _nibble_histograms.
_NIBBLE_SLC = 8


def _nibble_histograms(rows: jnp.ndarray, nbins: int) -> jnp.ndarray:
  """256-bin histograms of (slc, P) int32 rows via hi/lo nibble matmuls.

  The naive in-kernel histogram builds a (P, 256) one-hot with P*256 VPU
  compares per tile — the dominant cost of the fused CLAHE kernel
  (measured 2.3 of 3.0 ms per 256-frame round). Factoring each bin into
  hi/lo nibbles (b = 16h + l) needs only 2*16*P compares, and the joint
  count hist2d[s, h, l] = sum_p [hi_p==h][lo_p==l] becomes ONE
  block-diagonal 128x128xP MXU matmul per 8 tiles (off-diagonal blocks —
  cross-tile products — are computed and discarded; the MXU is otherwise
  idle here, and one full-tile matmul beats 8 latency-bound 16x16 dots).

  The (16, 16) diagonal blocks are then flattened to 256-lane histogram
  rows without any sublane->lane reshape (which Mosaic cannot lower):
  zero the off-diagonal blocks, scatter l -> lanes {16h+l} via a static
  0/1 matmul, and select sublane h(v) per lane group with a mask-reduce.

  Exact f32: all products are 0/1 and counts are < 2^24. Requires
  nbins == 256 and rows.shape[0] == _NIBBLE_SLC. Measured: drops the
  128^2-render fused kernel from 3.02 to 0.82 ms per 256-frame round.
  """
  slc, p = rows.shape
  nh = 16
  m = slc * nh
  assert nbins == nh * nh and slc == _NIBBLE_SLC

  hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nh, 1), 1)
  hi = jax.lax.shift_right_logical(rows, 4)[:, None, :]
  lo = jax.lax.bitwise_and(rows, 15)[:, None, :]
  oh_hi = (hi == hi_iota).astype(jnp.float32).reshape(m, p)
  oh_lo = (lo == hi_iota).astype(jnp.float32).reshape(m, p)
  r = jax.lax.dot_general(
      oh_hi, oh_lo,
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  )  # (m, m); diagonal (16, 16) blocks are the per-tile hist2ds

  ri = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
  ci = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
  dmask = (
      jax.lax.shift_right_logical(ri, 4)
      == jax.lax.shift_right_logical(ci, 4)
  ).astype(jnp.float32)
  ji = jax.lax.broadcasted_iota(jnp.int32, (m, nbins), 0)
  vi = jax.lax.broadcasted_iota(jnp.int32, (m, nbins), 1)
  scat = (
      jax.lax.bitwise_and(ji, 15) == jax.lax.bitwise_and(vi, 15)
  ).astype(jnp.float32)  # [j % 16 == v % 16]
  flat16 = jax.lax.dot_general(
      r * dmask, scat,
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )  # (m, V): row 16s+h holds hist2d_s[h, l(v)] at lane v
  hsel = jax.lax.broadcasted_iota(jnp.int32, (1, nh, nbins), 1)
  vsel = jax.lax.broadcasted_iota(jnp.int32, (1, nh, nbins), 2)
  selmask = (
      hsel
      == jax.lax.bitwise_and(jax.lax.shift_right_logical(vsel, 4), 15)
  ).astype(jnp.float32)  # [h == h(v)]
  return jnp.sum(flat16.reshape(slc, nh, nbins) * selmask, axis=1)


def _kernel(
    blocks_ref,  # (IMG, G1*G1, P) int32 dual-block pixel bins
    tiles_ref,  # (IMG, G*G, P) int32 tile-layout pixel bins (no padding)
    wgt_ref,  # (P, 4) f32 bilinear weights
    out_ref,  # (IMG, G1*G1, P) f32
    hist_ref,  # scratch (G*G, V) f32 per-tile histograms
    luts_ref,  # scratch (4, G1*G1, V) f32 corner LUTs, corner-major
    *,
    g: int,
    th: int,
    tw: int,
    nbins: int,
    clip_limit: float,
    img_per_program: int,
):
  """Three phases per image, all in VMEM; multiple images per grid step
  amortize per-program overhead.

  Phase 1 builds a per-block one-hot (the dominant VPU cost) for the
  quadrant histogram slab sums; phase 2 clips/redistributes and computes
  the cdf with a lower-triangular matmul (Mosaic has no cumsum); phase 3
  remaps every pixel through its block's 4 corner LUTs with 128-lane
  take_along_axis gathers — no one-hot cache, no MXU dots.
  """
  g1 = g + 1
  k = g1 * g1
  p = th * tw
  npx = float(th * tw)

  t = g * g
  # Slice size: largest divisor of the tile count whose (slc, P, V) f32
  # compare temp stays within ~3 MB, so big tiles (256^2 images) still
  # fit VMEM.
  slc = 1
  for cand in range(t, 0, -1):
    if t % cand == 0 and cand * p * nbins * 4 <= 3 * 2**20:
      slc = cand
      break
  bin_iota = jax.lax.broadcasted_iota(jnp.int32, (p, nbins), 1)
  lane = 128
  tri = (
      jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 0)
      <= jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 1)
  ).astype(jnp.float32)
  wgt_t = wgt_ref[:, :].T  # (4, P)

  use_nibble = nbins == 256 and t % _NIBBLE_SLC == 0

  def process_image(img: int) -> None:
    # ---- phase 1: per-tile histograms straight from the tile layout ----
    # The dual-block (half-tile-offset) layout is only needed for the
    # interpolation phase; histograms come from the UNPADDED tile view —
    # 21% fewer compares than histogramming the padded dual blocks, and
    # no quadrant bookkeeping. The default path is the hi/lo-nibble MXU
    # factorization (_nibble_histograms, 3.7x the one-hot compare loop);
    # the one-hot fallback covers nbins != 256 / odd tile counts. f32
    # one-hots + f32 sums are exact for counts up to 2^24 >> any tile
    # size. (An earlier per-tile 16x16-dot nibble variant WAS slower —
    # latency-bound low-M dots; the block-diagonal batching fixes that.)
    if use_nibble:
      for a in range(0, t, _NIBBLE_SLC):
        hist_ref[a:a + _NIBBLE_SLC] = _nibble_histograms(
            tiles_ref[img, a:a + _NIBBLE_SLC, :], nbins
        )
    else:
      for a in range(0, t, slc):
        oh = (
            tiles_ref[img, a:a + slc, :][:, :, None] == bin_iota[None]
        ).astype(jnp.float32)  # (slc, P, V)
        hist_ref[a:a + slc] = jnp.sum(oh, axis=1)  # (slc, V)

    # ---- phase 2: clip + redistribute + cdf ----
    hist = hist_ref[:, :]
    clim = max(clip_limit * npx, 1.0)
    excess = jnp.sum(
        jnp.maximum(hist - clim, 0.0), axis=-1, keepdims=True
    )
    hist = jnp.minimum(hist, clim) + excess / nbins
    # cumsum isn't lowerable on Mosaic TC; a lower-triangular matmul is,
    # and the (V, V) mask rides the MXU.
    cdf = jax.lax.dot_general(
        hist, tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mapping = (cdf / cdf[:, -1:]).reshape(g, g, nbins)

    # ---- phase 3: corner-LUT remap via native lane gathers ----
    # Corner LUTs per dual block (i, j): tiles (clip(i-1), clip(i)) x
    # (clip(j-1), clip(j)), built by edge replication (static slices).
    mpr = jnp.concatenate([mapping[:1], mapping, mapping[-1:]], axis=0)
    mpc = jnp.concatenate([mpr[:, :1], mpr, mpr[:, -1:]], axis=1)
    # (g+2, g+2, V). Staged via VMEM scratch (corner-major, contiguous
    # (K, V) per corner): Mosaic's gather lowering wants plainly
    # laid-out ref operands, not fused stack/broadcast expressions.
    luts_ref[:, :, :] = jnp.stack(
        [
            mpc[0:g1, 0:g1],  # (i-1, j-1)
            mpc[0:g1, 1:g1 + 1],  # (i-1, j)
            mpc[1:g1 + 1, 0:g1],  # (i,   j-1)
            mpc[1:g1 + 1, 1:g1 + 1],  # (i,   j)
        ],
        axis=0,
    ).reshape(4, k, nbins)

    # Mosaic's lane gather is limited to one 128-lane vreg along the
    # gather dimension, so gather each 128-bin LUT segment and select.
    for c0 in range(0, p, lane):
      pc = min(lane, p - c0)
      idxc = blocks_ref[img, :, c0:c0 + pc]  # (K, pc)
      out_acc = jnp.zeros((k, pc), jnp.float32)
      for c in range(4):
        acc = jnp.zeros((k, pc), jnp.float32)
        for s0 in range(0, nbins, lane):
          sw = min(lane, nbins - s0)
          seg = luts_ref[c, :, s0:s0 + sw]  # (K, sw)
          within = jnp.logical_and(idxc >= s0, idxc < s0 + sw)
          idx_m = jnp.clip(idxc - s0, 0, sw - 1)
          acc = jnp.where(
              within, jnp.take_along_axis(seg, idx_m, axis=1), acc
          )
        out_acc = out_acc + acc * wgt_t[c:c + 1, c0:c0 + pc]
      out_ref[img, :, c0:c0 + pc] = out_acc

  for img in range(img_per_program):
    process_image(img)


@functools.partial(
    jax.jit,
    static_argnames=('g', 'th', 'tw', 'nbins', 'clip_limit', 'interpret'),
)
def clahe_fused(
    blocks: jnp.ndarray,  # (B, (g+1)^2, th*tw) int32 dual-block bins
    tiles: jnp.ndarray,  # (B, g^2, th*tw) int32 tile-layout bins
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
  # Images per grid step: amortizes per-program overhead; bounded by the
  # (IMG, K, P) int32 in + f32 out staying a small share of VMEM.
  img = 1
  for cand in (4, 2):
    if b % cand == 0 and cand * k * p * 8 <= 4 * 2**20:
      img = cand
      break
  kernel = functools.partial(
      _kernel, g=g, th=th, tw=tw, nbins=nbins, clip_limit=clip_limit,
      img_per_program=img,
  )
  return pl.pallas_call(
      kernel,
      grid=(b // img,),
      in_specs=[
          pl.BlockSpec((img, k, p), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((img, g * g, p), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((p, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((img, k, p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, k, p), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((g * g, nbins), jnp.float32),
          pltpu.VMEM((4, k, nbins), jnp.float32),
      ],
      interpret=interpret,
  )(blocks, tiles, weights)


# --- large-tile variant (two kernels) -----------------------------------------
#
# At 512^2 render size (the reference default, imaging.py:39) a tile is
# th*tw = 4096 px; the single fused kernel's working set (dual blocks in +
# out + compare temps + LUT staging, all per image) exceeds the 16 MB VMEM
# scope (~44 MB measured). The split below stays VMEM-safe at ANY tile
# size by separating the per-image reduction from the per-pixel map:
#
#   kernel 1 (grid over images):  tile bins -> clipped/cdf'd corner LUTs
#       VMEM: one (g^2, P) tile layout + (slc, P, V) compare temp + LUTs.
#   kernel 2 (grid over images x pixel chunks): dual-block bins -> output
#       VMEM: a (K, PC) chunk of bins/out + the image's (4, K, V) LUTs.
#
# HBM traffic: bins read twice + LUTs once ~= 3 px-words/px, vs the XLA
# path's one-hot at V/2 px-words/px (bf16) — a ~40x reduction at V=256.


def _hist_kernel_nibble(
    tiles_ref,  # (1, SLC, P) int32 — 8 tiles' pixel bins
    hist_ref,  # out (1, SLC, V) f32
    *,
    nbins: int,
):
  """Eight tiles per grid step through the nibble-MXU histogram.

  At 4096-px tiles the (P, V) one-hot costs 1M compares per tile; the
  nibble factorization needs 131k plus one well-shaped (128, P, 128)
  MXU contraction per 8 tiles (see _nibble_histograms). The f32 compare
  temps (2 x (128, P) = 4 MB at 512^2 renders) stay well inside VMEM.
  """
  hist_ref[0] = _nibble_histograms(tiles_ref[0], nbins)


def _hist_kernel_nibble_u8(
    tiles_ref,  # (1, 4*SLC, P) uint8 — 32 tiles' pixel bins
    hist_ref,  # out (1, 4*SLC, V) f32
    *,
    nbins: int,
):
  """uint8 tile bins: 32 sublanes per grid step (the int8 memory tiling
  is (32, 128), so a (…, 8, P) u8 block would waste 4x the sublanes),
  widened to int32 in VMEM and fed through the nibble histogram in
  _NIBBLE_SLC slices. Quarters the tiles array's HBM traffic."""
  for a in range(0, 4 * _NIBBLE_SLC, _NIBBLE_SLC):
    hist_ref[0, a:a + _NIBBLE_SLC] = _nibble_histograms(
        tiles_ref[0, a:a + _NIBBLE_SLC, :].astype(jnp.int32), nbins
    )


def _hist_kernel(
    tiles_ref,  # (1, 1, P) int32 — ONE tile's pixel bins
    hist_ref,  # out (1, 1, V) f32 — that tile's histogram
    *,
    nbins: int,
):
  """One tile per grid step: the (P, V) one-hot compare temp exists once.

  (A single unrolled loop over tiles keeps every iteration's one-hot live
  on the VMEM stack simultaneously — the 16 MB scoped-vmem OOM the
  single-kernel variant hits at 4096-px tiles; dynamic ref slices inside
  fori_loop lower to an unsupported Mosaic gather. Static per-step blocks
  avoid both.)
  """
  p = tiles_ref.shape[-1]
  bin_iota = jax.lax.broadcasted_iota(jnp.int32, (p, nbins), 1)
  row = tiles_ref[0, 0, :]  # (P,)
  # f32 one-hot: native 32-bit lanes end to end (the int8 formulation's
  # pack/unpack round-trip doubled the VPU op count); exact for any P.
  oh = (row[:, None] == bin_iota).astype(jnp.float32)  # (P, V)
  hist_ref[0, 0, :] = jnp.sum(oh, axis=0)


def _lut_kernel(
    hist_ref,  # (1, G*G, V) f32 per-tile histograms
    luts_ref,  # out (1, 4, G1*G1, V) f32 corner LUTs
    *,
    g: int,
    npx: int,
    nbins: int,
    clip_limit: float,
):
  g1 = g + 1
  k = g1 * g1
  tri = (
      jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 0)
      <= jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 1)
  ).astype(jnp.float32)

  hist = hist_ref[0]
  clim = max(clip_limit * npx, 1.0)
  excess = jnp.sum(jnp.maximum(hist - clim, 0.0), axis=-1, keepdims=True)
  hist = jnp.minimum(hist, clim) + excess / nbins
  cdf = jax.lax.dot_general(
      hist, tri,
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  mapping = (cdf / cdf[:, -1:]).reshape(g, g, nbins)

  mpr = jnp.concatenate([mapping[:1], mapping, mapping[-1:]], axis=0)
  mpc = jnp.concatenate([mpr[:, :1], mpr, mpr[:, -1:]], axis=1)
  luts_ref[0] = jnp.stack(
      [
          mpc[0:g1, 0:g1],
          mpc[0:g1, 1:g1 + 1],
          mpc[1:g1 + 1, 0:g1],
          mpc[1:g1 + 1, 1:g1 + 1],
      ],
      axis=0,
  ).reshape(4, k, nbins)


def _remap_kernel(
    blocks_ref,  # (1, K, PC) int32 dual-block pixel bins (pixel chunk)
    luts_ref,  # (1, 4, K, V) f32 corner LUTs
    wgt_ref,  # (PC, 4) f32 bilinear weights (pixel chunk)
    out_ref,  # (1, K, PC) f32
    luts_s,  # scratch (4, K, V) f32 — plainly-laid-out gather operand
    *,
    k: int,
    nbins: int,
    pc: int,
):
  lane = 128
  # Mosaic's gather lowering wants a plainly laid-out 3-D ref operand, not
  # a slice of the 4-D input block — stage through scratch (same trick as
  # the single fused kernel).
  luts_s[:, :, :] = luts_ref[0]
  wgt_t = wgt_ref[:, :].T  # (4, PC)
  for c0 in range(0, pc, lane):
    w = min(lane, pc - c0)
    idxc = blocks_ref[0, :, c0:c0 + w]  # (K, w)
    out_acc = jnp.zeros((k, w), jnp.float32)
    for c in range(4):
      acc = jnp.zeros((k, w), jnp.float32)
      for s0 in range(0, nbins, lane):
        sw = min(lane, nbins - s0)
        seg = luts_s[c, :, s0:s0 + sw]  # (K, sw)
        within = jnp.logical_and(idxc >= s0, idxc < s0 + sw)
        idx_m = jnp.clip(idxc - s0, 0, sw - 1)
        acc = jnp.where(
            within, jnp.take_along_axis(seg, idx_m, axis=1), acc
        )
      out_acc = out_acc + acc * wgt_t[c:c + 1, c0:c0 + w]
    out_ref[0, :, c0:c0 + w] = out_acc


def _remap_natural_kernel(
    bins_ref,  # (1, TH, WP) int32 or uint8 — one dual-block row band,
    # natural layout (the production route feeds uint8; the gather below
    # handles either dtype)
    luts_ref,  # (1, 4, 1, G1, V) f32 — corner LUTs for this band's G1 blocks
    out_ref,  # (1, TH, WP) f32
    lutv_ref,  # scratch (G1+1, TH, V/2) int32 — packed pre-blended LUTs
    *,
    th: int,
    tw: int,
    g1: int,
    nbins: int,
):
  """Remaps one padded row band in its NATURAL (rows, cols) layout.

  The (B, K, P) flattened dual-block layout the original remap kernel
  consumes costs two large XLA transposes around the pallas calls
  (measured 1.8 + 1.3 ms per 64-frame 512² round — more than the kernels
  themselves). Here the band is read as it sits in HBM, and the natural
  row structure enables a halving the flat layout cannot express:
  within a band, the bilinear row weight fy is CONSTANT PER ROW, so the
  (top, bottom) corner pairs collapse into one per-row table
  LUTv[side][j][r] = (1-fy_r)·corner_top + fy_r·corner_bottom built once
  per band — 2 gathers per pixel (left/right side) instead of 4
  (corners). take_along_axis reads op[r, idx[r, i]], i.e. per-row
  tables come free. Bilinear weights come from iotas — no weight
  operand. Chunks are exactly 128 lanes (Mosaic's gather needs
  idx.shape == operand.shape); a chunk spanning multiple dual blocks
  gathers each block's tables and selects by lane position.
  """
  lane = 128
  wp = g1 * tw
  assert nbins == 2 * lane, 'natural remap packs exactly 256 bins'

  # ---- vertical preblend: (G1+1, TH, 128) int32 scratch per band ----
  # LUTv[t][r] = (1-fy_r)·corner_top + fy_r·corner_bottom of tile COLUMN
  # clip(t-1): adjacent dual blocks share tables (block j's right table
  # IS block j+1's left), so a band has only G1+1 distinct vertical
  # tables and a chunk spanning n blocks gathers n+1 of them, not 2n.
  # The two 128-bin halves pack as bf16 pairs into one int32 lane (lo
  # half in bits 0-15, hi in 16-31) so the remap needs ONE gather per
  # table — bin segments become a bit select instead of a second
  # gather+mask pass. bf16 LUT quantization matches the XLA path, which
  # feeds its LUT matmul bf16 on TPU.
  fy = (
      jax.lax.broadcasted_iota(jnp.int32, (th, nbins), 0).astype(jnp.float32)
      + 0.5
  ) / th  # (TH, V) — constant along V
  for t in range(g1 + 1):
    if t == 0:
      top = luts_ref[0, 0, 0, 0:1, :]  # corner (i-1, j-1) of block 0
      bot = luts_ref[0, 2, 0, 0:1, :]  # corner (i,   j-1) of block 0
    else:
      top = luts_ref[0, 1, 0, t - 1:t, :]  # corner (i-1, j) of block t-1
      bot = luts_ref[0, 3, 0, t - 1:t, :]  # corner (i,   j) of block t-1
    blended = top + fy * (bot - top)  # (TH, V) f32
    lo16 = jax.lax.bitcast_convert_type(
        blended[:, :lane].astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.int32)
    hi16 = jax.lax.bitcast_convert_type(
        blended[:, lane:].astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.int32)
    lutv_ref[t] = jax.lax.bitwise_or(lo16, jax.lax.shift_left(hi16, 16))

  # Mosaic's gather lowering needs idx.shape == operand.shape, so every
  # chunk is exactly `lane` wide; when wp % lane != 0 the final chunk
  # OVERLAPS the previous one (starts at wp - lane) and only its fresh
  # trailing columns are written.
  starts = list(range(0, wp - lane + 1, lane))
  tail = wp % lane
  if tail:
    starts.append(wp - lane)

  for c0 in starts:
    w = lane
    idx = bins_ref[0, :, c0:c0 + w]  # (TH, w) int32 or uint8
    if idx.dtype != jnp.int32:
      idx = idx.astype(jnp.int32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
    col = lane_i + c0
    # tw is a power of two (routing guarantee), so % and // are masks.
    col_in_tile = jax.lax.bitwise_and(col, tw - 1)
    j_of_lane = jax.lax.shift_right_logical(col, tw.bit_length() - 1)
    fx = (col_in_tile.astype(jnp.float32) + 0.5) / tw
    idx_m = jax.lax.bitwise_and(idx, lane - 1)
    in_hi = idx >= lane
    # bf16 value sits in the top 16 bits after the select below; widening
    # bf16 -> f32 is exactly "top 16 bits, zero-filled mantissa tail".
    himask = jnp.int32(-65536)  # 0xFFFF0000

    j_first = c0 // tw
    j_last = (c0 + w - 1) // tw
    # One gather per DISTINCT table: blocks j_first..j_last need tables
    # j_first..j_last+1 (block j interpolates tables j and j+1).
    acc = {}
    for t in range(j_first, j_last + 2):
      packed = jnp.take_along_axis(
          lutv_ref[t, :, :], idx_m, axis=1
      )  # (TH, w) int32: both halves of table t
      bits = jnp.where(
          in_hi,
          jax.lax.bitwise_and(packed, himask),
          jax.lax.shift_left(packed, 16),
      )
      acc[t] = jax.lax.bitcast_convert_type(bits, jnp.float32)
    val_l = acc[j_first]
    val_r = acc[j_first + 1]
    for j in range(j_first + 1, j_last + 1):
      sel = j_of_lane == j
      val_l = jnp.where(sel, acc[j], val_l)
      val_r = jnp.where(sel, acc[j + 1], val_r)
    out_acc = val_l + fx * (val_r - val_l)
    if tail and c0 == wp - lane and c0 % lane:
      # Overlapping tail: keep only the columns not already written.
      out_ref[0, :, wp - tail:wp] = out_acc[:, lane - tail:]
    else:
      out_ref[0, :, c0:c0 + w] = out_acc


@functools.partial(
    jax.jit,
    static_argnames=('g', 'th', 'tw', 'nbins', 'clip_limit', 'interpret'),
)
def clahe_fused_large_natural(
    bins_padded: jnp.ndarray,  # (B, (g+1)*th, (g+1)*tw) int32 or uint8
    # (production passes uint8 to quarter the HBM traffic), edge-padded
    tiles: jnp.ndarray,  # (B, g^2, th*tw) int32 or uint8 tile-layout bins
    # (the dtype check below routes uint8 through the nibble histogram)
    *,
    g: int,
    th: int,
    tw: int,
    nbins: int = 256,
    clip_limit: float = 0.01,
    interpret: bool = False,
) -> jnp.ndarray:
  """VMEM-safe split CLAHE, natural-layout remap: no dual-block transposes.

  Same semantics as clahe_fused_large, but the remap phase reads the
  edge-padded bins in their natural (B, HP, WP) layout, one dual-block
  row band per grid step, and writes the equalized padded image in
  natural layout (the caller crops the half-tile border). Requires tw
  to be a power of two (all synthetic render sizes qualify); arbitrary
  sizes stay on clahe_fused_large.
  """
  b = bins_padded.shape[0]
  t = g * g
  g1 = g + 1
  p = th * tw
  assert tw & (tw - 1) == 0, 'natural remap requires power-of-two tiles'
  assert bins_padded.shape[1:] == (g1 * th, g1 * tw), bins_padded.shape

  if (
      tiles.dtype == jnp.uint8
      and nbins == 256
      and (b * t) % (4 * _NIBBLE_SLC) == 0
  ):
    groups = b * t // (4 * _NIBBLE_SLC)
    hist = pl.pallas_call(
        functools.partial(_hist_kernel_nibble_u8, nbins=nbins),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((1, 4 * _NIBBLE_SLC, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * _NIBBLE_SLC, nbins),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (groups, 4 * _NIBBLE_SLC, nbins), jnp.float32
        ),
        interpret=interpret,
    )(tiles.reshape(groups, 4 * _NIBBLE_SLC, p)).reshape(b, t, nbins)
  elif nbins == 256 and (b * t) % _NIBBLE_SLC == 0:
    tiles = tiles.astype(jnp.int32)
    groups = b * t // _NIBBLE_SLC
    hist = pl.pallas_call(
        functools.partial(_hist_kernel_nibble, nbins=nbins),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((1, _NIBBLE_SLC, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _NIBBLE_SLC, nbins),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (groups, _NIBBLE_SLC, nbins), jnp.float32
        ),
        interpret=interpret,
    )(tiles.reshape(groups, _NIBBLE_SLC, p)).reshape(b, t, nbins)
  else:
    tiles = tiles.astype(jnp.int32)
    hist = pl.pallas_call(
        functools.partial(_hist_kernel, nbins=nbins),
        grid=(b * t,),
        in_specs=[
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nbins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * t, 1, nbins), jnp.float32),
        interpret=interpret,
    )(tiles.reshape(b * t, 1, p)).reshape(b, t, nbins)

  k = g1 * g1
  luts = pl.pallas_call(
      functools.partial(
          _lut_kernel,
          g=g, npx=p, nbins=nbins, clip_limit=clip_limit,
      ),
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, t, nbins), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 4, k, nbins), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, 4, k, nbins), jnp.float32),
      interpret=interpret,
  )(hist)
  # Band i consumes LUT rows [i*g1, (i+1)*g1) — expose them as a
  # band-major axis so the remap BlockSpec can slice per grid step.
  luts_banded = luts.reshape(b, 4, g1, g1, nbins)

  return pl.pallas_call(
      functools.partial(
          _remap_natural_kernel, th=th, tw=tw, g1=g1, nbins=nbins
      ),
      grid=(b, g1),
      in_specs=[
          pl.BlockSpec((1, th, g1 * tw), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4, 1, g1, nbins), lambda i, j: (i, 0, j, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, th, g1 * tw), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, g1 * th, g1 * tw), jnp.float32),
      scratch_shapes=[pltpu.VMEM((g1 + 1, th, nbins // 2), jnp.int32)],
      interpret=interpret,
  )(bins_padded, luts_banded.reshape(b, 4, g1, g1, nbins))


@functools.partial(
    jax.jit,
    static_argnames=('g', 'th', 'tw', 'nbins', 'clip_limit', 'interpret'),
)
def clahe_fused_large(
    blocks: jnp.ndarray,  # (B, (g+1)^2, th*tw) int32 dual-block bins
    tiles: jnp.ndarray,  # (B, g^2, th*tw) int32 tile-layout bins
    weights: jnp.ndarray,  # (th*tw, 4) f32 bilinear weights
    *,
    g: int,
    th: int,
    tw: int,
    nbins: int = 256,
    clip_limit: float = 0.01,
    interpret: bool = False,
) -> jnp.ndarray:
  """VMEM-safe split CLAHE for large tiles; same semantics as clahe_fused."""
  b, k, p = blocks.shape
  t = g * g

  if nbins == 256 and (b * t) % _NIBBLE_SLC == 0:
    # Eight tiles per grid step through the nibble-MXU histogram.
    groups = b * t // _NIBBLE_SLC
    hist = pl.pallas_call(
        functools.partial(_hist_kernel_nibble, nbins=nbins),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((1, _NIBBLE_SLC, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _NIBBLE_SLC, nbins),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (groups, _NIBBLE_SLC, nbins), jnp.float32
        ),
        interpret=interpret,
    )(tiles.reshape(groups, _NIBBLE_SLC, p)).reshape(b, t, nbins)
  else:
    # One tile per grid step, tiles folded into the leading grid axis
    # with a singleton sublane dim (block sublane must divide 8 or equal
    # the array dim — 1 == 1 satisfies the latter).
    hist = pl.pallas_call(
        functools.partial(_hist_kernel, nbins=nbins),
        grid=(b * t,),
        in_specs=[
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nbins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * t, 1, nbins), jnp.float32),
        interpret=interpret,
    )(tiles.reshape(b * t, 1, p)).reshape(b, t, nbins)

  luts = pl.pallas_call(
      functools.partial(
          _lut_kernel,
          g=g, npx=th * tw, nbins=nbins, clip_limit=clip_limit,
      ),
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, t, nbins), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 4, k, nbins), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, 4, k, nbins), jnp.float32),
      interpret=interpret,
  )(hist)

  # Pixel-chunk width: lane-aligned, small enough that (K, PC) in/out plus
  # the (4, K, V) LUTs stay well inside VMEM at any tile size.
  pc = p
  for cand in (2048, 1024, 512, 256, 128):
    if p > 2048 and p % cand == 0:
      pc = cand
      break
  return pl.pallas_call(
      functools.partial(_remap_kernel, k=k, nbins=nbins, pc=pc),
      grid=(b, p // pc),
      in_specs=[
          pl.BlockSpec((1, k, pc), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4, k, nbins), lambda i, j: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((pc, 4), lambda i, j: (j, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, k, pc), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, k, p), jnp.float32),
      scratch_shapes=[pltpu.VMEM((4, k, nbins), jnp.float32)],
      interpret=interpret,
  )(blocks, luts, weights)
