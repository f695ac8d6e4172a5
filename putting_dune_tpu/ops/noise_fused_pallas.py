"""Fused STEM noise chain as one Pallas TPU kernel.

The XLA formulation (imaging/noise.py) runs the 7 post-splat noise stages
(Poisson shot noise, row jitter, salt & pepper, gamma contrast, uniform,
exponential, Gaussian) as separate ops: every stage round-trips the
(B, H, W) frame batch through HBM and the row jitter needs an FFT
(per-row XLA gathers are slow). Measured 1.16 ms of the 2.37 ms
128x128-render round (reference chain: imaging.py:176-265).

This kernel keeps a frame group VMEM-resident end to end: uniforms come
from the on-core PRNG (pltpu.prng_random_bits), normals via Box-Muller,
the row roll is a native 128-lane gather (exact, no FFT), and the three
max-renormalizations are in-VMEM reductions. HBM traffic: frames in +
frames out.

The stage math lives in `chain_from_uniforms`, shared verbatim by the
kernel and by `apply_chain_reference` (jax.random-fed XLA twin) so the
CPU test suite locks the logic without the TPU PRNG (interpret mode
cannot emulate prng_seed).

Distributional parity, not bitstream parity, with imaging/noise.py: the
PRNG stream differs (threefry there, TPU on-core PRNG here), the jitter
roll is exact rather than FFT-roundoff, and each pixel's Poisson/normal
draws reuse one Box-Muller pair — all same laws.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_POISSON_SMALL_LAMBDA = 4.0
_POISSON_INVERSION_TERMS = 12
_LANE = 128
# Largest Poisson jitter rate for which clipping row shifts at _LANE-1
# is statistically exact (P(shift >= 128) < 1e-12); reference rates are
# in [0, 5] (imaging.py:42-72).
_MAX_JITTER_RATE = 40.0

# Row-major order of the per-image parameters in the packed (B, 8) array.
PARAM_FIELDS = (
    'poisson_rate_multiplier',
    'jitter_rate',
    'salt_and_pepper_amount',
    'contrast_gamma',
    'uniform_noise_scale',
    'exponential_lambda',
    'gaussian_variance',
)


def _poisson_from_draws(u, z, lam):
  """Poisson sampler given one uniform + one normal per element.

  Same hybrid as noise._poisson_fast: 12-term CDF inversion below
  lambda=4, continuity-corrected rounded normal above.
  """
  lam_safe = jnp.maximum(lam, 1e-20)
  pmf = jnp.exp(-lam_safe)
  cdf = pmf
  count = jnp.zeros_like(lam)
  for k in range(_POISSON_INVERSION_TERMS):
    count = count + (u > cdf).astype(lam.dtype)
    # x * (1/(k+1)) instead of x / (k+1): the compile-time reciprocal
    # turns a per-element divide into a multiply (float32 rounding
    # differs by <=1 ulp per term — far below the sampler's resolution).
    pmf = pmf * lam_safe * (1.0 / (k + 1))
    cdf = cdf + pmf
  small = count
  large = jnp.maximum(jnp.floor(lam + jnp.sqrt(lam_safe) * z + 0.5), 0.0)
  return jnp.where(lam < _POISSON_SMALL_LAMBDA, small, large)


def _box_muller(u1, u2):
  """Two independent N(0, 1) fields from two uniform fields."""
  r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
  theta = (2.0 * jnp.pi) * u2
  return r * jnp.cos(theta), r * jnp.sin(theta)


def _renorm(image):
  peak = jnp.max(image)
  return image / jnp.maximum(peak, 1e-20)


def _roll_rows(image, shifts, max_shift=None):
  """out[y, x] = image[y, (x - shifts[y]) mod W] — np.roll per row.

  W is processed in 128-lane segments so the take_along_axis gather
  dimension always fits one vreg (any lane-aligned W).

  max_shift: if set (< 128) the caller guarantees 0 <= shift <= max_shift
  (shifts are clipped to that range), which collapses the general
  W/128 x W/128 gather/select grid to exactly TWO gathers per output
  chunk at any width: a pixel's source lies in the same 128-lane segment
  or the one before, and both share the local index (x - shift) mod 128.
  The noise chain uses this — its jitter shifts are Poisson with rate
  <= 5 (reference imaging.py:42-72), so P(shift >= 128) < 1e-100 and
  clipping is the same law in any statistical sense.
  """
  h, w = image.shape
  lane = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
  # Double rem: shifts can exceed w (Poisson tail), and lax.rem keeps the
  # dividend's sign.
  idx = jax.lax.rem(jax.lax.rem(lane - shifts, w) + w, w)
  if w <= _LANE:
    return jnp.take_along_axis(image, idx, axis=1)
  if max_shift is not None and max_shift < _LANE and w % _LANE == 0:
    s = jnp.clip(shifts, 0, max_shift)  # (h, 1)
    local = jax.lax.bitwise_and(lane - s, _LANE - 1)  # (x - shift) mod 128
    in_chunk = jax.lax.bitwise_and(lane, _LANE - 1)  # x mod 128
    from_prev = in_chunk < s  # source wraps into the previous segment
    chunks = []
    for c0 in range(0, w, _LANE):
      c0p = c0 - _LANE if c0 else w - _LANE  # previous segment, circular
      loc = local[:, c0:c0 + _LANE]
      g_here = jnp.take_along_axis(image[:, c0:c0 + _LANE], loc, axis=1)
      g_prev = jnp.take_along_axis(image[:, c0p:c0p + _LANE], loc, axis=1)
      chunks.append(
          jnp.where(from_prev[:, c0:c0 + _LANE], g_prev, g_here)
      )
    return jnp.concatenate(chunks, axis=1)
  # Mosaic's lane gather needs idx.shape == operand.shape, so process
  # 128-lane OUTPUT chunks against each 128-lane INPUT segment and select
  # (same pattern as the CLAHE LUT remap).
  # Pad W up to a lane multiple so every output chunk and input segment
  # is a full (h, 128) vreg tile (Mosaic requires idx.shape ==
  # operand.shape for lane gathers); crop at the end.
  wp = ((w + _LANE - 1) // _LANE) * _LANE
  if wp != w:
    idx = jnp.concatenate(
        [idx, jnp.zeros((h, wp - w), jnp.int32)], axis=1
    )
    image = jnp.concatenate(
        [image, jnp.zeros((h, wp - w), image.dtype)], axis=1
    )
  chunks = []
  for c0 in range(0, wp, _LANE):
    idxc = idx[:, c0:c0 + _LANE]
    outc = jnp.zeros((h, _LANE), image.dtype)
    for s0 in range(0, wp, _LANE):
      seg = image[:, s0:s0 + _LANE]
      within = jnp.logical_and(idxc >= s0, idxc < s0 + _LANE)
      gathered = jnp.take_along_axis(
          seg, jnp.clip(idxc - s0, 0, _LANE - 1), axis=1
      )
      outc = jnp.where(within, gathered, outc)
    chunks.append(outc)
  return jnp.concatenate(chunks, axis=1)[:, :w]


def chain_from_uniforms(image, params, draws):
  """The 7-stage noise chain given all random draws explicitly.

  Args:
    image: (H, W) f32 clean frame in [0, 1].
    params: dict of scalars keyed by PARAM_FIELDS.
    draws: dict with (H, W) uniforms 'u_pois', 'u_sp', 'u_un', 'u_ex',
      normals 'z_pois', 'z_gauss', and per-row (H, 1) 'u_row', 'z_row'.

  Returns:
    (H, W) f32 noisy frame (pre-CLAHE).

  Stage order and formulas mirror imaging/noise.py (reference
  imaging.py:239-265) exactly.
  """
  # 1. Poisson shot noise, max-normalized.
  lam = image * params['poisson_rate_multiplier']
  image = _renorm(_poisson_from_draws(draws['u_pois'], draws['z_pois'], lam))

  # 2. Row-wise circular shifts, shift_y ~ Poisson(jitter_rate).
  # max_shift=_LANE-1 clips shifts at 127: exact-law for jitter_rate <=
  # _MAX_JITTER_RATE (P(shift >= 128) < 1e-12 at rate 40; the reference
  # samples rates in [0, 5]). pack_params enforces the bound host-side.
  shifts = _poisson_from_draws(
      draws['u_row'], draws['z_row'],
      jnp.full_like(draws['u_row'], 1.0) * params['jitter_rate'],
  ).astype(jnp.int32)
  image = _roll_rows(image, shifts, max_shift=_LANE - 1)

  # 3. Salt & pepper.
  u = draws['u_sp']
  a = params['salt_and_pepper_amount']
  image = jnp.where(u < a / 2.0, 1.0, image)
  image = jnp.where(jnp.logical_and(u >= a / 2.0, u < a), 0.0, image)

  # 4. Gamma contrast: x ** gamma (x ** 0 == 1 for x == 0 is never hit:
  # gamma > 0; define 0 ** gamma = 0 as jnp.power does).
  g = params['contrast_gamma']
  safe = jnp.maximum(image, 1e-30)
  image = jnp.where(image <= 0.0, 0.0, jnp.exp(g * jnp.log(safe)))

  # 5. Additive uniform, max-normalized.
  image = _renorm(image + draws['u_un'] * params['uniform_noise_scale'])

  # 6. Additive exponential, max-normalized.
  expo = -jnp.log(jnp.maximum(draws['u_ex'], 1e-12))
  image = _renorm(image + expo * params['exponential_lambda'])

  # 7. Additive Gaussian, clipped.
  sigma = jnp.sqrt(params['gaussian_variance'])
  return jnp.clip(image + draws['z_gauss'] * sigma, 0.0, 1.0)


def _uniform_from_bits(shape):
  bits = pltpu.prng_random_bits(shape)
  # Bits carry int32 semantics (mean 0): x * 2^-32 is in [-0.5, 0.5),
  # so +0.5 yields U[0, 1) (verified on hardware: mean 0.498).
  return bits.astype(jnp.float32) * (2.0 ** -32) + 0.5


def _kernel(
    seed_ref,  # (B, 1) int32, SMEM (full array; indexed by program id)
    params_ref,  # (B, 8) f32, SMEM (full array)
    image_ref,  # (IMG, H, W) f32
    out_ref,  # (IMG, H, W) f32
    *,
    img_per_program: int,
):
  h, w = image_ref.shape[1], image_ref.shape[2]
  base = pl.program_id(0) * img_per_program
  for i in range(img_per_program):
    pltpu.prng_seed(seed_ref[base + i, 0])
    params = {
        name: params_ref[base + i, j] for j, name in enumerate(PARAM_FIELDS)
    }
    u_bm1 = _uniform_from_bits((h, w))
    u_bm2 = _uniform_from_bits((h, w))
    z_pois, z_gauss = _box_muller(u_bm1, u_bm2)
    # One (h, 128) draw supplies all three per-row uniforms: lanes of a
    # counter-PRNG draw are iid, so distinct columns are independent
    # streams (saves two full-field PRNG invocations).
    ur = _uniform_from_bits((h, _LANE))
    z_row, _ = _box_muller(ur[:, 1:2], ur[:, 2:3])
    draws = {
        'u_pois': _uniform_from_bits((h, w)),
        'z_pois': z_pois,
        'u_sp': _uniform_from_bits((h, w)),
        'u_un': _uniform_from_bits((h, w)),
        'u_ex': _uniform_from_bits((h, w)),
        'z_gauss': z_gauss,
        'u_row': ur[:, :1],
        'z_row': z_row,
    }
    out_ref[i] = chain_from_uniforms(image_ref[i], params, draws)


def pack_params(params_struct, batch: int) -> jnp.ndarray:
  """Packs per-image noise parameters into the kernel's (B, 8) layout.

  Enforces the fused chain's jitter_rate contract when the value is
  concrete: the kernel's row-roll clips shifts at 127 (see
  chain_from_uniforms), which is the same law only for small Poisson
  rates. Traced values (under jit) skip the check — the samplers in
  imaging/params.py stay within [0, 5] by construction.
  """
  jitter = getattr(params_struct, 'jitter_rate', None)
  if jitter is not None and not isinstance(jitter, jax.core.Tracer):
    peak = float(jnp.max(jnp.asarray(jitter)))
    if peak > _MAX_JITTER_RATE:
      raise ValueError(
          f'jitter_rate {peak} exceeds {_MAX_JITTER_RATE}: the fused '
          'noise kernel clips row shifts at 127, which diverges from '
          'np.roll semantics at large Poisson rates. Use the unfused '
          'imaging/noise.py chain for such parameters.'
      )
  cols = [
      jnp.broadcast_to(
          jnp.asarray(getattr(params_struct, name), jnp.float32), (batch,)
      )
      for name in PARAM_FIELDS
  ]
  cols.append(jnp.zeros((batch,), jnp.float32))  # pad to 8 columns
  return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=())
def apply_chain_fused(
    key: jax.Array,
    image: jnp.ndarray,  # (B, H, W) f32
    packed_params: jnp.ndarray,  # (B, 8) f32, see pack_params
) -> jnp.ndarray:
  """Runs the full noise chain in one pallas_call. TPU only.

  Per-image seeds derive from `key`; images in a batch get independent
  streams. W must be a multiple of 128 (or <= 128).
  """
  b, h, w = image.shape
  seeds = jax.random.randint(
      key, (b, 1), minval=0, maxval=jnp.iinfo(jnp.int32).max,
      dtype=jnp.int32,
  )
  img = 1
  for cand in (8, 4, 2):
    if b % cand == 0 and cand * h * w * 4 * 2 <= 2 * 2**20:
      img = cand
      break
  kernel = functools.partial(_kernel, img_per_program=img)
  return pl.pallas_call(
      kernel,
      grid=(b // img,),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec((img, h, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((img, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
  )(seeds, packed_params, image)


def apply_chain_reference(
    key: jax.Array,
    image: jnp.ndarray,  # (B, H, W) f32
    packed_params: jnp.ndarray,  # (B, 8) f32
) -> jnp.ndarray:
  """XLA twin of apply_chain_fused: same math, jax.random draws.

  Used by the CPU test suite (pallas interpret mode cannot emulate the
  TPU PRNG) and as a drop-in check that chain_from_uniforms reproduces
  the composition of the individual imaging/noise.py stages.
  """
  b, h, w = image.shape
  keys = jax.random.split(key, 8)
  u = lambda k, shape: jax.random.uniform(
      k, shape, minval=jnp.finfo(jnp.float32).tiny, maxval=1.0
  )
  u_bm1 = u(keys[0], (b, h, w))
  u_bm2 = u(keys[1], (b, h, w))
  z_pois, z_gauss = _box_muller(u_bm1, u_bm2)
  ur1 = u(keys[2], (b, h, 1))
  ur2 = u(keys[3], (b, h, 1))
  ur3 = u(keys[4], (b, h, 1))
  z_row, _ = _box_muller(ur2, ur3)
  draws = {
      'u_pois': u(keys[5], (b, h, w)),
      'z_pois': z_pois,
      'u_sp': u(keys[6], (b, h, w)),
      'u_un': u(keys[7], (b, h, w)),
      'u_ex': u(jax.random.fold_in(key, 99), (b, h, w)),
      'z_gauss': z_gauss,
      'u_row': ur1,
      'z_row': z_row,
  }

  def one(img, prm, drw):
    params = {name: prm[j] for j, name in enumerate(PARAM_FIELDS)}
    return chain_from_uniforms(img, params, drw)

  return jax.vmap(one)(image, packed_params, draws)
