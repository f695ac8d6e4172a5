"""STEM image rendering as MXU matmuls.

TPU-first rewrite of the reference clean-image generator
(/root/reference/putting_dune/imaging.py:117-173) and the full noisy pipeline
(imaging.py:239-265).

The reference splats atoms into a 2D histogram and then runs a large
scipy.ndimage Gaussian blur. Because convolving a delta with a Gaussian IS
the Gaussian, and the 2D Gaussian is separable, the blurred histogram equals

    image[y, x] = sum_k w_k * K(y - bin_y(k)) * K(x - bin_x(k))

which factorizes into ONE matmul per image:

    image = (Gy * w)^T @ Gx,   Gy, Gx: (num_atoms, image_size)

This runs on the MXU at ~17 MFLOP per 128x128 frame instead of a
bandwidth-bound multi-pass blur. Kernel truncation (radius 4*sigma + 0.5,
matching scipy.ndimage defaults) and the final max-normalization (which
absorbs all kernel normalization constants) preserve reference semantics.

Divergences (documented):
  * The per-episode "blur_amount" post-blur (imaging.py:254, sigma <= 1 px,
    reflect boundary) is folded into the splat sigma as
    sqrt(sigma_clean^2 + blur^2); the boundary-mode difference affects a
    <=4-pixel border at most.
  * CLAHE is our own fixed-grid implementation (clahe.py); skimage is not a
    dependency of this framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from putting_dune_tpu import geometry
from putting_dune_tpu import structures
from putting_dune_tpu.imaging import clahe as clahe_lib
from putting_dune_tpu.imaging import noise as noise_lib


def _splat_axis_kernels(
    bin_centers: jnp.ndarray,  # (B, K) integer bin index per atom, as float
    sigma: jnp.ndarray,  # (B,) pixels
    image_size: int,
) -> jnp.ndarray:
  """Truncated 1D Gaussian kernels per atom: (B, K, image_size)."""
  coords = jax.lax.broadcasted_iota(
      jnp.float32, (1, 1, image_size), dimension=2
  )
  d = coords - bin_centers[..., None]
  s = sigma[:, None, None]
  radius = jnp.floor(4.0 * s + 0.5)
  kern = jnp.exp(-0.5 * jnp.square(d / s))
  return jnp.where(jnp.abs(d) <= radius, kern, 0.0)


def _splat_inputs(window, fov, intensity_exponent, s, blur_amount):
  """Shared splat prologue: bins, weights, per-image sigmas.

  Histogram binning parity: bin = floor(p * S), right edge in last bin;
  sigma = S / (2.15 * fov_extent) per axis (imaging.py:154-161), with the
  per-episode post-blur folded in quadrature.
  """
  positions = window.positions  # (B, K, 2) in [0, 1]
  bx = jnp.clip(jnp.floor(positions[..., 0] * s), 0, s - 1)
  by = jnp.clip(jnp.floor(positions[..., 1] * s), 0, s - 1)
  sigma_x = s / (2.15 * fov.width)
  sigma_y = s / (2.15 * fov.height)
  if blur_amount is not None:
    sigma_x = jnp.sqrt(jnp.square(sigma_x) + jnp.square(blur_amount))
    sigma_y = jnp.sqrt(jnp.square(sigma_y) + jnp.square(blur_amount))
  weights = jnp.where(
      window.mask,
      jnp.power(
          window.atomic_numbers.astype(jnp.float32),
          intensity_exponent[..., None],
      ),
      0.0,
  )
  return bx, by, weights, sigma_x, sigma_y


def render_clean_image(
    window: structures.AtomWindow,
    fov: structures.FieldOfView,
    intensity_exponent: jnp.ndarray,  # (B,)
    *,
    image_size: int = 512,
    blur_amount: jnp.ndarray | None = None,  # (B,) extra sigma, pixels
    backend: str = 'auto',
) -> jnp.ndarray:
  """Renders max-normalized clean STEM frames, (B, S, S) float32.

  Row 0 is the TOP of the image (the reference flips the histogram upside
  down, imaging.py:152); column = x, row = image_size-1 - y_bin.

  backend: 'pallas' runs the fused single-kernel splat
  (ops/splat_pallas.py — no (B, K, S) HBM factor tensors, exp() per
  profile entry instead of per (atom, pixel)); 'xla' is the einsum
  formulation below. 'auto' == 'xla': standalone, the two are at parity
  on TPU (the einsum is HBM-bound, the kernel gather-bound), and the
  separate pallas call pipelines worse next to the noise/CLAHE kernels
  (a combined splat+noise kernel was built, measured 110k vs 144k
  frames/s in the full pipeline, and deleted — see ROADMAP "Frames
  beyond 150k"), so the shipped composition is einsum splat + fused
  Pallas noise chain.
  """
  s = image_size
  bx, by, weights, sigma_x, sigma_y = _splat_inputs(
      window, fov, intensity_exponent, s, blur_amount
  )

  if backend == 'pallas':
    from putting_dune_tpu.ops import splat_pallas

    return splat_pallas.splat_render(
        bx, by, weights, sigma_x, sigma_y,
        image_size=s, interpret=jax.default_backend() == 'cpu',
    )

  gx = _splat_axis_kernels(bx, sigma_x, s)  # (B, K, S)
  gy = _splat_axis_kernels(by, sigma_y, s)
  gy = gy * weights[..., None]

  # image[y, x] = sum_k gy[k, y] * gx[k, x] — one MXU matmul per frame.
  # (On TPU the default matmul precision already feeds the MXU bf16
  # inputs with f32 accumulation — an explicit bf16 cast was measured
  # bit-identical and no faster.)
  image = jnp.einsum(
      'bky,bkx->byx', gy, gx, preferred_element_type=jnp.float32
  )
  image = jnp.flip(image, axis=-2)  # y up -> row 0 at top.

  peak = jnp.max(image, axis=(-2, -1), keepdims=True)
  return image / jnp.maximum(peak, 1e-20)


@functools.partial(
    jax.jit, static_argnames=('image_size', 'apply_clahe', 'noise_backend')
)
def render_stem_image(
    key: jax.Array,
    window: structures.AtomWindow,
    fov: structures.FieldOfView,
    params: structures.ImagingParams,
    *,
    image_size: int = 512,
    apply_clahe: bool = True,
    noise_backend: str = 'auto',
) -> jnp.ndarray:
  """Full noisy STEM frame pipeline (reference imaging.py:239-265).

  Order: clean splat (+blur folded in) -> Poisson shot noise -> row jitter ->
  salt & pepper -> gamma contrast -> uniform -> exponential -> Gaussian ->
  CLAHE.

  noise_backend: 'pallas_fused' runs the 7 noise stages as ONE Pallas
  kernel with the on-core TPU PRNG (ops/noise_fused_pallas.py — exact
  gather row roll instead of the FFT, frames stay VMEM-resident; same
  stage laws, different PRNG stream); 'xla' runs the imaging/noise.py op
  chain. 'auto' picks the fused kernel on TPU for lane-aligned widths.

  (A fully-fused splat+noise single kernel was built and measured SLOWER
  — 110k vs 144k frames/s at 256x128^2 — because the per-image
  (K, S)x(K, S) MXU dot serializes against the VPU noise chain, while
  the batched XLA einsum pipelines across the whole batch; the einsum +
  noise-kernel split below is the measured-fastest composition.)
  """
  image = render_clean_image(
      window,
      fov,
      params.intensity_exponent,
      image_size=image_size,
      blur_amount=params.blur_amount,
  )
  on_cpu = jax.default_backend() == 'cpu'
  lane_ok = image_size <= 128 or image_size % 128 == 0
  if noise_backend == 'pallas_fused' or (
      noise_backend == 'auto' and not on_cpu and lane_ok
  ):
    from putting_dune_tpu.ops import noise_fused_pallas

    packed = noise_fused_pallas.pack_params(params, image.shape[0])
    image = noise_fused_pallas.apply_chain_fused(key, image, packed)
  else:
    k_poisson, k_jitter, k_sp, k_uniform, k_exp, k_gauss = jax.random.split(
        key, 6
    )
    image = noise_lib.apply_poisson_noise(
        k_poisson, image, params.poisson_rate_multiplier
    )
    image = noise_lib.apply_jitter(k_jitter, image, params.jitter_rate)
    image = noise_lib.apply_salt_and_pepper(
        k_sp, image, params.salt_and_pepper_amount
    )
    image = noise_lib.apply_contrast(image, params.contrast_gamma)
    image = noise_lib.apply_uniform_noise(
        k_uniform, image, params.uniform_noise_scale
    )
    image = noise_lib.apply_exponential_noise(
        k_exp, image, params.exponential_lambda
    )
    image = noise_lib.apply_gaussian_noise(
        k_gauss, image, params.gaussian_variance
    )
  if apply_clahe:
    image = clahe_lib.equalize_adapthist(image, clip_limit=0.01)
  return image


def resize_bilinear(image: jnp.ndarray, size: int) -> jnp.ndarray:
  """Bilinear resize of (B, H, W) frames to (B, size, size).

  Replaces the cv2.resize in the reference image feature constructor
  (feature_constructors.py:254-258).

  Integer downsample factors (the reference's 512 -> 128 default) take a
  strided-slice fast path: bilinear sampling at factor f reads position
  f*i + (f-1)/2, which is an exact source pixel for odd f and the mean of
  two adjacent pixels for even f. Identical values to jax.image.resize
  (method='linear', antialias=False), ~20x cheaper on TPU (no gather).
  """
  batch, h, w = image.shape
  if h == w and h % size == 0:
    f = h // size
    if f == 1:
      return image
    if f % 2:
      off = (f - 1) // 2
      return image[:, off::f, off::f]
    lo = f // 2 - 1
    rows = 0.5 * (image[:, lo::f, :] + image[:, lo + 1::f, :])
    return 0.5 * (rows[:, :, lo::f] + rows[:, :, lo + 1::f])
  return jax.image.resize(
      image, (batch, size, size), method='linear', antialias=False
  )


def render_label_mask(
    window: structures.AtomWindow,
    fov: structures.FieldOfView,
    *,
    intensity_exponent: jnp.ndarray | float = 1.7,
    image_size: int = 512,
) -> jnp.ndarray:
  """Semantic label image: pixel = atomic number of the covering atom.

  Parity: reference imaging.py:75-114 (generate_grid_mask) — each atom
  stamps a disk of radius (Z/6)^exponent * 0.1 angstroms; later (higher-Z
  via max) atoms win. Returns (B, S, S) int32 with 0 = background.
  """
  s = image_size
  b = window.positions.shape[0]
  exponent = jnp.broadcast_to(jnp.asarray(intensity_exponent), (b,))

  # Pixel centers in the material frame.
  lin = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
  px = geometry_microscope_to_material_grid(lin, fov)  # (B, S, 2) per axis

  pos_material = geometry.microscope_to_material(
      window.positions,
      fov.lower_left[:, None, :],
      fov.upper_right[:, None, :],
  )  # (B, K, 2)

  z = window.atomic_numbers.astype(jnp.float32)
  radius = jnp.power(z / 6.0, exponent[:, None]) * 0.1  # (B, K)
  # Reference parity (imaging.py:110-111): the SQUARED pixel distance is
  # compared against the UNSQUARED radius value, so the effective disk
  # radius is sqrt(radius).
  radius2 = jnp.where(window.mask, radius, -1.0)

  xs = px[0]  # (B, S)
  ys = px[1]  # (B, S)
  dx2 = jnp.square(xs[:, None, :] - pos_material[..., 0][..., None])
  dy2 = jnp.square(ys[:, None, :] - pos_material[..., 1][..., None])
  # covered[b, k, y, x] without materializing: reduce over K via max of
  # masked atomic numbers where inside the disk.
  inside = (
      dx2[:, :, None, :] + dy2[:, :, :, None]
  ) < radius2[:, :, None, None]
  labels = jnp.max(
      jnp.where(inside, window.atomic_numbers[:, :, None, None], 0),
      axis=1,
  )
  return jnp.flip(labels, axis=-2).astype(jnp.int32)


def geometry_microscope_to_material_grid(lin, fov):
  """Maps a [0,1] linspace to material x and y coordinate rows, (2, B, S)."""
  xs = (
      lin[None, :] * (fov.upper_right[:, :1] - fov.lower_left[:, :1])
      + fov.lower_left[:, :1]
  )
  ys = (
      lin[None, :] * (fov.upper_right[:, 1:] - fov.lower_left[:, 1:])
      + fov.lower_left[:, 1:]
  )
  return jnp.stack([xs, ys])
