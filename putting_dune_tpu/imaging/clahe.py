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
    jax.jit,
    static_argnames=('clip_limit', 'grid_size', 'nbins', 'backend'),
)
def equalize_adapthist(
    image: jnp.ndarray,
    clip_limit: float = 0.01,
    grid_size: int = 8,
    nbins: int = 256,
    backend: str = 'auto',
) -> jnp.ndarray:
  """Applies CLAHE to a batch of frames.

  Args:
    image: (B, H, W) float32 in [0, 1]; H and W must be divisible by
      grid_size.
    clip_limit: histogram clip fraction (of tile pixel count).
    grid_size: tiles per side.
    nbins: gray-level bins.
    backend: 'pallas_fused' (ops/clahe_fused_pallas.py — tiles up to 512 px
      use the fully-fused VMEM-resident kernel: nibble-MXU histograms +
      clip + cdf + LUT interpolation in one pallas_call, ~0.82 ms for a
      256-frame 128x128 batch on a v5e vs ~8.2 ms for 'xla'; larger
      lane-aligned tiles use the VMEM-safe three-call split serving the
      reference's 512^2 default render: 4190 frames/s at 512^2 B=64), 'xla'
      (one-hot matmul through HBM — materializes B*(g+1)^2*npx*nbins bf16,
      10.9 GB at 256 frames x 256^2: do NOT use at large sizes on TPU),
      or 'pallas' (ops/clahe_pallas.py, non-fused LUT-interp kernel;
      correct but slower — kept as a tuning baseline). 'auto' picks the
      appropriate pallas kernel on TPU for any lane-aligned size and
      'xla' otherwise; on CPU always 'xla' (interpret mode is slow).

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

  # Dual-block view (offset by half a tile): built ONCE and reused by both
  # the histogram (via quadrant sums below) and the LUT interpolation —
  # the (pixels x bins) one-hot is the dominant memory traffic, so it is
  # materialized a single time.
  pad_h, pad_w = th // 2, tw // 2
  bins_padded = jnp.pad(
      bins, ((0, 0), (pad_h, th - pad_h), (pad_w, tw - pad_w)), mode='edge'
  )  # (B, (g+1)*th, (g+1)*tw)
  blocks = bins_padded.reshape(b, g + 1, th, g + 1, tw)
  blocks = blocks.transpose(0, 1, 3, 2, 4).reshape(
      b, (g + 1) * (g + 1), th * tw
  )

  # In-block fractional weights: fy = (row_in_block + 0.5) / th.
  fy = ((jnp.arange(th, dtype=jnp.float32) + 0.5) / th)[:, None]
  fx = ((jnp.arange(tw, dtype=jnp.float32) + 0.5) / tw)[None, :]
  wgt = jnp.stack(
      [
          (1 - fy) * (1 - fx),
          (1 - fy) * fx,
          fy * (1 - fx),
          fy * fx,
      ],
      axis=-1,
  ).reshape(th * tw, 4)

  # Fully-fused kernel shortcut: everything below (one-hot histograms,
  # clip/cdf, gather-based LUT remap) happens inside one pallas_call in
  # VMEM. The kernel slices its per-block compare temp adaptively, so the
  # only hard requirements are lane-aligned pixels (the gather runs in
  # 128-lane chunks; tiles of 64x64-and-larger images satisfy this) and a
  # single-vreg-wide LUT segment.
  on_cpu = jax.default_backend() == 'cpu'
  # 'auto' routes tiles up to 512 pixels (images up to 128^2 at the
  # default 8x8 grid) to the single fused kernel, and larger lane-aligned
  # tiles (256^2, 512^2 — the reference's default render size) to the
  # VMEM-safe two-kernel split. Both are TPU-validated; the XLA one-hot
  # path remains only for CPU and odd sizes.
  fused_small = (npx % 128 == 0 or npx <= 128) and npx <= 512
  fused_large = npx % 128 == 0 and npx > 512
  if backend == 'pallas_fused' or (
      backend == 'auto' and not on_cpu and (fused_small or fused_large)
  ):
    from putting_dune_tpu.ops import clahe_fused_pallas

    # Tile-layout bins (unpadded) for the histogram phase — the padded
    # dual-block layout is only needed for the interpolation phase.
    tiles = (
        bins.reshape(b, g, th, g, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, g * g, th * tw)
    )
    # tw >= 64: at 32-px tiles a 128-lane chunk spans four dual blocks
    # and the natural remap's gather duplication outweighs the transpose
    # savings (measured 2.65 vs 2.27 ms/round at 256²-grid-8, B=128);
    # at 64-px tiles and up the natural path wins (512²: 2.99 vs 4.97).
    if (
        not fused_small
        and (tw & (tw - 1)) == 0
        and tw >= 64
        # Band blocks must stay sublane-tile aligned for the WIDEST
        # memory tiling on the route: the uint8 bins_padded input has
        # (32, 128) tiling, so a band starting at j*th needs th % 32 == 0
        # (th % 8 only covers the f32 output; a 24-px band height from a
        # non-square render could hit a Mosaic relayout or layout error).
        and th % 32 == 0
        and nbins == 256
        and (g + 1) * tw >= 128
    ):
      # Natural-layout remap: reads/writes the padded image as it sits in
      # HBM, skipping the (B, K, P) dual-block transposes on both sides
      # (measured 3x the kernel cost at 512^2 — see the kernel docstring).
      # Bins fit uint8 (nbins == 256 on this route), quartering the
      # pad/transpose traffic of the remaining prep; the kernels widen
      # in VMEM.
      bins8 = bins.astype(jnp.uint8)
      bins8_padded = jnp.pad(
          bins8,
          ((0, 0), (pad_h, th - pad_h), (pad_w, tw - pad_w)),
          mode='edge',
      )
      tiles8 = (
          bins8.reshape(b, g, th, g, tw)
          .transpose(0, 1, 3, 2, 4)
          .reshape(b, g * g, th * tw)
      )
      out_padded = clahe_fused_pallas.clahe_fused_large_natural(
          bins8_padded,
          tiles8,
          g=g,
          th=th,
          tw=tw,
          nbins=nbins,
          clip_limit=clip_limit,
          interpret=on_cpu,
      )
      return out_padded[:, pad_h:pad_h + h, pad_w:pad_w + w]
    fused_fn = (
        clahe_fused_pallas.clahe_fused
        if fused_small
        else clahe_fused_pallas.clahe_fused_large
    )
    out_blocks = fused_fn(
        blocks,
        tiles,
        wgt,
        g=g,
        th=th,
        tw=tw,
        nbins=nbins,
        clip_limit=clip_limit,
        interpret=on_cpu,
    )
    out_padded = (
        out_blocks.reshape(b, g + 1, g + 1, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, (g + 1) * th, (g + 1) * tw)
    )
    return out_padded[:, pad_h:pad_h + h, pad_w:pad_w + w]

  # bf16 halves the dominant HBM traffic on TPU; CPU XLA lacks bf16 dots.
  compute_dtype = (
      jnp.float32 if jax.default_backend() == 'cpu' else jnp.bfloat16
  )
  onehot = jax.nn.one_hot(blocks, nbins, dtype=compute_dtype)

  # Histogram via quadrant sums of the dual-block one-hot: tile (i, j) is
  # the union of the 4 inner quadrants of dual blocks (i..i+1, j..j+1).
  # Quadrants are contiguous half-row/half-col slabs, so their sums are
  # plain streaming reductions (no scatter, no padded matmul).
  oh6 = onehot.reshape(b, g + 1, g + 1, th, tw, nbins)
  oh_q = oh6.reshape(
      b, g + 1, g + 1, 2, th // 2, 2, tw // 2, nbins
  ).sum(axis=(4, 6)).astype(jnp.float32)  # (B, g+1, g+1, 2, 2, V)
  # Quadrant index [r, c]: r=0 top rows, r=1 bottom rows (likewise cols).
  # The padded rows/cols contribute only edge-replicated pixels; tile
  # (i, j) = BR of dual (i, j) + BL of dual (i, j+1) + TR of dual
  # (i+1, j) + TL of dual (i+1, j+1).
  hist = (
      oh_q[:, :g, :g, 1, 1]
      + oh_q[:, :g, 1:, 1, 0]
      + oh_q[:, 1:, :g, 0, 1]
      + oh_q[:, 1:, 1:, 0, 0]
  )  # (B, g, g, nbins)

  # Clip + uniform redistribution of the excess.
  clim = jnp.maximum(clip_limit * npx, 1.0)
  excess = jnp.sum(jnp.maximum(hist - clim, 0.0), axis=-1, keepdims=True)
  hist = jnp.minimum(hist, clim) + excess / nbins

  cdf = jnp.cumsum(hist, axis=-1)
  mapping = cdf / cdf[..., -1:]  # (B, g, g, nbins) in (0, 1]

  # --- bilinear interpolation between the 4 surrounding tile mappings ---
  # TPU-first formulation: per-pixel LUT gathers are very slow on TPU, so
  # the lookup is expressed as a one-hot matmul on the MXU over the SAME
  # dual blocks (every pixel inside a dual block interpolates the same
  # four tile mappings): out = onehot(bins) @ [LUT00 LUT01 LUT10 LUT11]
  # followed by a bilinear-weighted sum. One can show the clipped corner
  # tiles + in-block fractional weights reproduce the standard
  # clamped-edge bilinear scheme exactly.
  # Corner LUTs per dual block: tiles (clip(i-1), clip(i)) x (clip(j-1),
  # clip(j)), built with edge padding (no gathers).
  mp = jnp.pad(
      mapping, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge'
  )  # (B, g+2, g+2, V)
  corners = jnp.stack(
      [
          mp[:, 0:g + 1, 0:g + 1],  # (i-1, j-1)
          mp[:, 0:g + 1, 1:g + 2],  # (i-1, j)
          mp[:, 1:g + 2, 0:g + 1],  # (i,   j-1)
          mp[:, 1:g + 2, 1:g + 2],  # (i,   j)
      ],
      axis=-1,
  )  # (B, g+1, g+1, V, 4)
  luts = corners.reshape(b, (g + 1) * (g + 1), nbins, 4)

  if backend == 'pallas':
    from putting_dune_tpu.ops import clahe_pallas

    out_blocks = clahe_pallas.clahe_interpolate(
        blocks, luts, wgt, interpret=jax.default_backend() == 'cpu'
    )
  else:
    # Contract with the 4-wide corner dim on the MXU's sublane axis (pads
    # 4 -> 8) rather than the lane axis (4 -> 128): ~4x faster here.
    vals = jnp.einsum(
        'bkvc,bkpv->bkcp',
        luts.astype(compute_dtype),
        onehot,
        preferred_element_type=jnp.float32,
    )  # (B, K, 4, P)
    out_blocks = jnp.einsum('bkcp,pc->bkp', vals, wgt)

  out_padded = (
      out_blocks.reshape(b, g + 1, g + 1, th, tw)
      .transpose(0, 1, 3, 2, 4)
      .reshape(b, (g + 1) * th, (g + 1) * tw)
  )
  return out_padded[:, pad_h:pad_h + h, pad_w:pad_w + w]


def equalize_adapthist_padded(
    image: jnp.ndarray,
    clip_limit: float = 0.01,
    grid_size: int = 8,
    nbins: int = 256,
    backend: str = 'auto',
) -> jnp.ndarray:
  """CLAHE for frames of ANY spatial size (real-microscope inputs).

  The core `equalize_adapthist` requires H and W divisible by
  2*grid_size (tiles plus their even quadrant split); synthetic frames
  (128/256/512) always are, but REAL microscope dumps come in arbitrary
  sizes (e.g. 1000x1000). Mirroring skimage's equalize_adapthist —
  which reflect-pads up to a multiple of its kernel size and crops back
  (the reference's imaging.py:239-265 noise chain ends in exactly that
  call) — this wrapper pads symmetrically, equalizes, and crops.

  Note: a padded size is generally not 128-lane aligned, so on TPU the
  computation takes the XLA one-hot path, which materializes large
  intermediates at big sizes; arbitrary-size frames are a host/offline
  pipeline concern, so run those under a CPU jax context.
  """
  b, h, w = image.shape
  mult = 2 * grid_size
  ph = (-h) % mult
  pw = (-w) % mult
  if not ph and not pw:
    return equalize_adapthist(image, clip_limit, grid_size, nbins, backend)
  pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
  # Reflect padding needs pad < dim; tiny frames fall back to edge.
  mode = 'reflect' if min(h, w) > mult else 'edge'
  padded = jnp.pad(image, pads, mode=mode)
  out = equalize_adapthist(padded, clip_limit, grid_size, nbins, backend)
  return out[:, pads[1][0]:pads[1][0] + h, pads[2][0]:pads[2][0] + w]
