"""Fused Pallas STEM splat: clean-image render in one kernel.

The XLA splat (imaging/render.py render_clean_image) materializes two
(B, K, S) Gaussian factor tensors in HBM (~134 MB each at 256 frames x
512 atoms x 128 px) and evaluates exp() for every (atom, pixel) pair —
measured 0.48 ms of the 1.66 ms 128^2 render round, almost all HBM
traffic + VPU transcendentals.

This kernel exploits two structural facts:
  * bin centers are INTEGERS (floor'd histogram bins), and
  * sigma is a per-image scalar,
so every atom's 1-D kernel row is a shifted copy of ONE common truncated
Gaussian profile of length 2S. Per image the kernel evaluates exp() just
2*2S times (vs 2*K*S), builds the (K, S) factor matrices with native
128-lane gathers from the profile (same segment-gather pattern as the
CLAHE LUT remap), contracts them on the MXU, and max-normalizes — all
VMEM-resident. HBM traffic: (B, K) bins/weights in + (B, S, S) image out.

Numerics match render_clean_image to float tolerance (identical exp
arguments; the MXU contraction uses f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _gather_shifted_profile(
    prof_b: jnp.ndarray,  # (K, 2S) f32: per-row COPY of the profile
    shift: jnp.ndarray,  # (K, 1) f32 integer-valued: bin center per atom
    s: int,
) -> jnp.ndarray:
  """rows[k, c] = prof_b[k, c - shift[k] + S] for c in [0, S).

  The gather dimension is processed in 128-lane segments (Mosaic's lane
  gather handles one vreg of lanes at a time), output in 128-lane chunks.
  """
  k = prof_b.shape[0]
  out_chunks = []
  for c0 in range(0, s, _LANE):
    lane = jax.lax.broadcasted_iota(jnp.int32, (k, _LANE), 1) + c0
    idx = lane - shift.astype(jnp.int32) + s  # in (0, 2S)
    acc = jnp.zeros((k, _LANE), jnp.float32)
    for s0 in range(0, 2 * s, _LANE):
      seg = prof_b[:, s0:s0 + _LANE]
      within = jnp.logical_and(idx >= s0, idx < s0 + _LANE)
      gathered = jnp.take_along_axis(
          seg, jnp.clip(idx - s0, 0, _LANE - 1), axis=1
      )
      acc = jnp.where(within, gathered, acc)
    out_chunks.append(acc)
  if len(out_chunks) == 1:
    return out_chunks[0]
  return jnp.concatenate(out_chunks, axis=1)


def _profile(sigma: jnp.ndarray, s: int) -> jnp.ndarray:
  """(1, 2S) truncated Gaussian: prof[j] = exp(-((j-S)/sigma)^2/2).

  Truncation radius floor(4*sigma + 0.5) matches scipy.ndimage (and the
  XLA splat's _splat_axis_kernels).
  """
  j = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * s), 1).astype(jnp.float32)
  d = j - float(s)
  radius = jnp.floor(4.0 * sigma + 0.5)
  kern = jnp.exp(-0.5 * jnp.square(d / sigma))
  return jnp.where(jnp.abs(d) <= radius, kern, 0.0)


def _kernel(
    sig_ref,  # (B, 2) f32, SMEM: sigma_x, sigma_y per image
    bx_ref,  # (IMG, 1, K) f32 integer-valued x bins
    byf_ref,  # (IMG, 1, K) f32 integer-valued FLIPPED y bins (S-1-by)
    w_ref,  # (IMG, 1, K) f32 atom weights (0 for masked atoms)
    out_ref,  # (IMG, S, S) f32
    profx_ref,  # scratch (K, 2S) f32
    profy_ref,  # scratch (K, 2S) f32
    *,
    s: int,
    k: int,
    img_per_program: int,
):
  base = pl.program_id(0) * img_per_program
  for i in range(img_per_program):
    sx = sig_ref[base + i, 0]
    sy = sig_ref[base + i, 1]
    # Stage the broadcast profiles through scratch refs: Mosaic's lane
    # gather wants a plainly-laid-out operand, not a fused broadcast.
    profx_ref[:, :] = jnp.broadcast_to(_profile(sx, s), (k, 2 * s))
    profy_ref[:, :] = jnp.broadcast_to(_profile(sy, s), (k, 2 * s))
    gx = _gather_shifted_profile(profx_ref[:, :], bx_ref[i, 0][:, None], s)
    gy = _gather_shifted_profile(profy_ref[:, :], byf_ref[i, 0][:, None], s)
    gy = gy * w_ref[i, 0][:, None]
    # image[y, x] = sum_k gy[k, y] * gx[k, x] — contract K on the MXU.
    # bf16 inputs + f32 accumulation: one MXU pass instead of the ~6-pass
    # f32 mode; the final max-normalization absorbs the scale and the
    # mantissa loss is ~1e-3 relative — the same trade XLA's default
    # matmul precision makes on the einsum path.
    image = jax.lax.dot_general(
        gy.astype(jnp.bfloat16), gx.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, S)
    peak = jnp.max(image)
    out_ref[i] = image / jnp.maximum(peak, 1e-20)


@functools.partial(jax.jit, static_argnames=('image_size', 'interpret'))
def splat_render(
    bx: jnp.ndarray,  # (B, K) f32 integer-valued x bins in [0, S)
    by: jnp.ndarray,  # (B, K) f32 integer-valued y bins in [0, S)
    weights: jnp.ndarray,  # (B, K) f32 (masked atoms: 0)
    sigma_x: jnp.ndarray,  # (B,) f32 pixels
    sigma_y: jnp.ndarray,  # (B,) f32 pixels
    *,
    image_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
  """Max-normalized clean frames (B, S, S) f32, row 0 at the image top."""
  b, k = bx.shape
  s = image_size
  # Flip y at the BIN level (row 0 = top of image): row = S-1 - y_bin.
  byf = (s - 1) - by
  sig = jnp.stack([sigma_x, sigma_y], axis=1)

  # Images per program: profiles (2 x K x 2S f32) dominate the per-image
  # VMEM working set and are reused across images, so the budget is
  # gx/gy/out: ~ (2*K*S + S*S) * 4 bytes per image.
  per_img = (2 * k * s + s * s) * 4
  img = 1
  for cand in (8, 4, 2):
    if b % cand == 0 and cand * per_img + 2 * k * 2 * s * 4 <= 8 * 2**20:
      img = cand
      break
  kernel = functools.partial(
      _kernel, s=s, k=k, img_per_program=img
  )
  # (B, 1, K) layout: the (1, K) trailing block equals the array dims, so
  # any img (even 1) satisfies Mosaic's block-shape divisibility rule.
  atom_spec = pl.BlockSpec(
      (img, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
  )
  return pl.pallas_call(
      kernel,
      grid=(b // img,),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.SMEM),
          atom_spec,
          atom_spec,
          atom_spec,
      ],
      out_specs=pl.BlockSpec(
          (img, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
      ),
      out_shape=jax.ShapeDtypeStruct((b, s, s), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((k, 2 * s), jnp.float32),
          pltpu.VMEM((k, 2 * s), jnp.float32),
      ],
      interpret=interpret,
  )(sig, bx[:, None, :], byf[:, None, :], weights[:, None, :])
