"""Imaging tests: MXU-splat parity vs a scipy histogram+blur oracle,
noise-op distribution checks, CLAHE properties.

Mirrors reference imaging_test.py (determinism, shapes) plus oracle parity
for the clean renderer (reference imaging.py:117-173).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.imaging import clahe as clahe_lib
from putting_dune_tpu.imaging import noise as noise_lib
from putting_dune_tpu.imaging import params as params_lib
from putting_dune_tpu.imaging import render as render_lib

LATTICE = lattice_lib.make_lattice(num_cols=20)
CONFIG = simulator_lib.SimulatorConfig(grid_columns=20)


def _window_and_fov(batch=2, key=0):
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(key), LATTICE, config=CONFIG, batch_size=batch,
      return_window=True,
  )
  return obs.window, state.fov, state


def _oracle_clean_image(window, fov, b, intensity_exponent, size):
  """Reference-math oracle: 2D histogram * Z^exp -> gaussian blur -> /max."""
  mask = np.asarray(window.mask)[b]
  pos = np.asarray(window.positions)[b][mask]
  nums = np.asarray(window.atomic_numbers)[b][mask]
  image = np.zeros((size, size))
  for z in np.unique(nums):
    sel = pos[nums == z]
    hist, _, _ = np.histogram2d(
        sel[:, 0], sel[:, 1], bins=size, range=((0, 1), (0, 1))
    )
    image += hist * float(z) ** intensity_exponent
  image = np.flipud(image.T)
  width = float(np.asarray(fov.width)[b])
  height = float(np.asarray(fov.height)[b])
  sigma = (size / (2.15 * width), size / (2.15 * height))
  image = scipy.ndimage.gaussian_filter(image, sigma, mode='constant')
  return image / image.max()


def test_clean_image_matches_scipy_oracle():
  window, fov, state = _window_and_fov()
  exponent = np.asarray([1.7, 1.5], np.float32)
  size = 128
  got = np.asarray(
      render_lib.render_clean_image(
          window, fov, jnp.asarray(exponent), image_size=size
      )
  )
  for b in range(2):
    expected = _oracle_clean_image(window, fov, b, exponent[b], size)
    # Tail truncation differs slightly (we cut at the same 4*sigma+0.5
    # radius, but scipy blurs y then x); demand close agreement.
    assert np.abs(got[b] - expected).max() < 5e-3, (
        b, np.abs(got[b] - expected).max()
    )


def test_clean_image_brightest_at_silicon():
  window, fov, state = _window_and_fov(batch=4, key=3)
  img = np.asarray(
      render_lib.render_clean_image(
          window, fov, jnp.full((4,), 1.7), image_size=128
      )
  )
  for b in range(4):
    # Silicon is at the FOV center; Z=14 vs 6 makes it the global peak.
    peak = np.unravel_index(np.argmax(img[b]), img[b].shape)
    assert abs(peak[0] - 64) < 8 and abs(peak[1] - 64) < 8, peak


def test_full_render_deterministic_and_in_range():
  window, fov, state = _window_and_fov()
  a = np.asarray(
      render_lib.render_stem_image(
          jax.random.PRNGKey(5), window, fov, state.imaging, image_size=128
      )
  )
  b = np.asarray(
      render_lib.render_stem_image(
          jax.random.PRNGKey(5), window, fov, state.imaging, image_size=128
      )
  )
  np.testing.assert_array_equal(a, b)
  c = np.asarray(
      render_lib.render_stem_image(
          jax.random.PRNGKey(6), window, fov, state.imaging, image_size=128
      )
  )
  assert not np.array_equal(a, c)
  assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6


def test_poisson_noise_statistics():
  key = jax.random.PRNGKey(7)
  image = jnp.full((1, 64, 64), 0.5)
  mult = jnp.asarray([40.0])
  out = np.asarray(noise_lib.apply_poisson_noise(key, image, mult))
  # Poisson(20) scaled by 1/max: relative std ~ 1/sqrt(20).
  rel_std = out.std() / out.mean()
  assert 0.5 / np.sqrt(20) < rel_std < 2.0 / np.sqrt(20)


def test_jitter_rolls_rows_circularly():
  key = jax.random.PRNGKey(8)
  image = jnp.tile(jnp.arange(16, dtype=jnp.float32)[None, None, :],
                   (1, 8, 1))
  out = np.asarray(noise_lib.apply_jitter(key, image, jnp.asarray([3.0])))
  # Every row is a circular permutation (FFT shift: float32 roundoff).
  for r in range(8):
    np.testing.assert_allclose(
        np.sort(out[0, r]), np.arange(16), atol=1e-3
    )
  # And rows match an exact np.roll for the recovered shift.
  for r in range(8):
    shift = int(np.argmin(np.abs(out[0, r] - 0.0)))
    np.testing.assert_allclose(
        out[0, r], np.roll(np.arange(16), shift), atol=1e-3
    )


def test_salt_and_pepper_fraction():
  key = jax.random.PRNGKey(9)
  image = jnp.full((1, 256, 256), 0.5)
  out = np.asarray(
      noise_lib.apply_salt_and_pepper(key, image, jnp.asarray([0.1]))
  )
  flipped = (out != 0.5).mean()
  assert abs(flipped - 0.1) < 0.01
  assert ((out == 1.0).mean() - 0.05) < 0.01


def test_contrast_gamma():
  image = jnp.asarray([[[0.25]]])
  out = np.asarray(noise_lib.apply_contrast(image, jnp.asarray([2.0])))
  assert abs(out[0, 0, 0] - 0.0625) < 1e-6


def test_clahe_improves_contrast_and_stays_in_range():
  # Low-contrast image: values in [0.4, 0.6].
  key = jax.random.PRNGKey(10)
  img = 0.4 + 0.2 * jax.random.uniform(key, (1, 128, 128))
  out = np.asarray(clahe_lib.equalize_adapthist(img))
  assert out.min() >= 0.0 and out.max() <= 1.0
  assert out.std() > np.asarray(img).std() * 1.5  # contrast stretched
  # Monotone-ish: pixel ranks mostly preserved within a tile.
  tile_in = np.asarray(img)[0, :16, :16].ravel()
  tile_out = out[0, :16, :16].ravel()
  corr = np.corrcoef(tile_in, tile_out)[0, 1]
  assert corr > 0.9


def test_clahe_padded_handles_arbitrary_real_frame_sizes():
  """Real microscope dumps come in sizes the core kernel rejects (not
  2*grid-divisible, e.g. 1000x1000 or 24x24); equalize_adapthist_padded
  must handle them (skimage pads the same way) and stay a no-op wrapper
  on already-compatible sizes."""
  key = jax.random.PRNGKey(11)
  # Compatible size: identical to the core kernel.
  img = 0.4 + 0.2 * jax.random.uniform(key, (1, 128, 128))
  np.testing.assert_allclose(
      np.asarray(clahe_lib.equalize_adapthist_padded(img)),
      np.asarray(clahe_lib.equalize_adapthist(img)),
  )
  # Incompatible sizes: run, preserve shape/range, stretch contrast.
  for h, w in ((24, 24), (100, 120), (250, 198)):
    frame = 0.4 + 0.2 * jax.random.uniform(key, (1, h, w))
    out = np.asarray(clahe_lib.equalize_adapthist_padded(frame))
    assert out.shape == (1, h, w)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.std() > np.asarray(frame).std() * 1.5


def test_clahe_backends_agree():
  """The fused pallas kernel (interpret mode on CPU) matches the XLA path."""
  key = jax.random.PRNGKey(21)
  img = jax.random.uniform(key, (2, 64, 64))
  ref = np.asarray(clahe_lib.equalize_adapthist(img, backend='xla'))
  fused = np.asarray(
      clahe_lib.equalize_adapthist(img, backend='pallas_fused')
  )
  # Tolerance = bf16 LUT-matmul quantization (both paths use bf16 on TPU;
  # the fused kernel uses bf16 everywhere).
  assert np.abs(fused - ref).max() < 4e-3


def test_resize_bilinear_shape():
  img = jnp.ones((3, 512, 512))
  out = render_lib.resize_bilinear(img, 128)
  assert out.shape == (3, 128, 128)


def test_resize_bilinear_matches_jax_image_resize():
  # The integer-factor strided fast path must be bit-identical to
  # jax.image.resize(method='linear', antialias=False) — odd factor
  # (384->128), even factor (512->128), identity, and the non-divisible
  # fallback (129->64).
  key = jax.random.PRNGKey(3)
  for h, size in [(512, 128), (384, 128), (128, 128), (129, 64)]:
    img = jax.random.uniform(key, (2, h, h))
    got = np.asarray(render_lib.resize_bilinear(img, size))
    want = np.asarray(
        jax.image.resize(img, (2, size, size), method='linear',
                         antialias=False)
    )
    np.testing.assert_array_equal(got, want)


def test_imaging_params_ranges():
  p = params_lib.sample_imaging_params(jax.random.PRNGKey(11), 64)
  assert (np.asarray(p.intensity_exponent) >= 1.4).all()
  assert (np.asarray(p.intensity_exponent) <= 2.0).all()
  assert (np.asarray(p.poisson_rate_multiplier) >= 1.0).all()
  assert (np.asarray(p.gaussian_variance) <= 5e-3).all()
  noisy = params_lib.sample_imaging_params(
      jax.random.PRNGKey(12), 64, noisy=True
  )
  assert np.asarray(noisy.gaussian_variance).max() > 5e-3


def test_simulator_returns_image():
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(13), LATTICE,
      config=simulator_lib.SimulatorConfig(grid_columns=20, image_size=128),
      batch_size=2, return_image=True,
  )
  assert obs.image.shape == (2, 128, 128)
  assert np.isfinite(np.asarray(obs.image)).all()


def test_fast_poisson_matches_exact_statistics():
  """The hybrid sampler matches Poisson mean/variance in both regimes."""
  key = jax.random.PRNGKey(20)
  for lam_value in [0.05, 0.5, 2.0, 3.9, 4.1, 15.0, 80.0]:
    lam = jnp.full((1, 256, 256), lam_value)
    counts = np.asarray(noise_lib._poisson_fast(key, lam))
    n = counts.size
    se_mean = np.sqrt(lam_value / n)
    assert abs(counts.mean() - lam_value) < 6 * se_mean + 0.02, (
        lam_value, counts.mean()
    )
    assert abs(counts.var() - lam_value) < 0.1 * lam_value + 0.02, (
        lam_value, counts.var()
    )
    assert counts.min() >= 0


def test_clahe_fused_nondefault_grid_and_bins():
  """Fused kernel handles non-default grid sizes and bin counts."""
  key = jax.random.PRNGKey(33)
  img = jax.random.uniform(key, (2, 64, 64))
  for grid_size, nbins in ((4, 256), (8, 128)):
    ref = np.asarray(
        clahe_lib.equalize_adapthist(
            img, backend='xla', grid_size=grid_size, nbins=nbins
        )
    )
    fused = np.asarray(
        clahe_lib.equalize_adapthist(
            img, backend='pallas_fused', grid_size=grid_size, nbins=nbins
        )
    )
    assert np.abs(fused - ref).max() < 4e-3, (grid_size, nbins)


def test_clahe_fused_large_tiles_agree_with_xla():
  """The VMEM-safe split kernel (large tiles) matches the XLA path.

  grid_size=2 on a 64^2 image gives 1024-px tiles, exercising the
  clahe_fused_large routing that serves the reference-default 512^2
  render (interpret mode on CPU; validated on TPU at 256^2/512^2)."""
  key = jax.random.PRNGKey(44)
  img = jax.random.uniform(key, (2, 64, 64))
  ref = np.asarray(
      clahe_lib.equalize_adapthist(img, backend='xla', grid_size=2)
  )
  fused = np.asarray(
      clahe_lib.equalize_adapthist(img, backend='pallas_fused', grid_size=2)
  )
  assert np.abs(fused - ref).max() < 4e-3


def test_clahe_natural_remap_agrees_with_xla():
  """The natural-layout large-tile kernel matches the XLA path.

  Driven directly (the 'auto'/'pallas_fused' routes send 32-px tiles to
  the transposing path, which measures faster there) at 256^2/grid 8:
  32-px tile widths make one 128-lane chunk span FOUR dual blocks and
  the 288-lane padded band end in an overlapping tail chunk — the two
  bookkeeping paths of _remap_natural_kernel. 512^2 (two blocks per
  chunk, the routed configuration) runs the same kernel on TPU."""
  from putting_dune_tpu.ops import clahe_fused_pallas as cfp

  key = jax.random.PRNGKey(45)
  img = jax.random.uniform(key, (2, 256, 256))
  b, h, w = img.shape
  g, nbins = 8, 256
  th, tw = h // g, w // g
  ref = np.asarray(clahe_lib.equalize_adapthist(img, backend='xla'))

  bins = jnp.clip((img * nbins).astype(jnp.int32), 0, nbins - 1).astype(
      jnp.uint8  # the production route feeds uint8 bins
  )
  pad_h, pad_w = th // 2, tw // 2
  bins_padded = jnp.pad(
      bins, ((0, 0), (pad_h, th - pad_h), (pad_w, tw - pad_w)), mode='edge'
  )
  tiles = (
      bins.reshape(b, g, th, g, tw)
      .transpose(0, 1, 3, 2, 4)
      .reshape(b, g * g, th * tw)
  )
  out_padded = cfp.clahe_fused_large_natural(
      bins_padded, tiles, g=g, th=th, tw=tw, nbins=nbins,
      clip_limit=0.01, interpret=True,
  )
  fused = np.asarray(out_padded[:, pad_h:pad_h + h, pad_w:pad_w + w])
  assert np.abs(fused - ref).max() < 4e-3


def test_fused_noise_chain_math_matches_stage_ops():
  """chain_from_uniforms == the imaging/noise.py stage composition.

  The fused Pallas noise kernel (ops/noise_fused_pallas.py) shares its
  math with apply_chain_reference; with the random stages disabled
  (amount/scale/var = 0, jitter_rate = 0) and the Poisson multiplier in
  the large-lambda regime, the chain must reduce to Poisson+renorm
  followed by the deterministic gamma contrast.
  """
  from putting_dune_tpu.ops import noise_fused_pallas as nf

  key = jax.random.PRNGKey(0)
  image = jax.random.uniform(key, (4, 32, 32), minval=0.05, maxval=1.0)
  gamma = 1.7
  packed = np.zeros((4, 8), np.float32)
  packed[:, 0] = 1e8  # poisson_rate_multiplier: relative noise ~1e-4
  packed[:, 3] = gamma
  out = np.asarray(
      nf.apply_chain_reference(jax.random.PRNGKey(1), image, jnp.asarray(packed))
  )
  want = np.asarray(noise_lib.apply_contrast(
      noise_lib._renorm(image), jnp.full((4,), gamma)
  ))
  assert np.abs(out - want).max() < 5e-3
  assert out.min() >= 0.0 and out.max() <= 1.0


def test_fused_noise_chain_statistics():
  """Salt&pepper flip fractions and Gaussian tail of the shared chain."""
  from putting_dune_tpu.ops import noise_fused_pallas as nf

  # A bright anchor pixel keeps the renormalized background near 0.5 so
  # salt (1.0) and pepper (0.0) flips are distinguishable from it.
  image = np.full((2, 64, 64), 0.5, np.float32)
  image[:, 0, 0] = 1.0
  image = jnp.asarray(image)
  packed = np.zeros((2, 8), np.float32)
  packed[:, 0] = 1e8
  packed[:, 2] = 0.2  # salt_and_pepper_amount
  packed[:, 3] = 1.0
  packed[:, 6] = 1e-4  # gaussian_variance
  out = np.asarray(
      nf.apply_chain_reference(
          jax.random.PRNGKey(2), image, jnp.asarray(packed)
      )
  )
  salt = (out > 0.9).mean()
  pepper = (out < 0.1).mean()
  assert abs(salt - 0.1) < 0.02, salt
  assert abs(pepper - 0.1) < 0.02, pepper


def test_fused_noise_roll_rows_matches_numpy():
  from putting_dune_tpu.ops import noise_fused_pallas as nf

  rng = np.random.default_rng(3)
  img = rng.random((8, 160), np.float32)  # W > 128: segment path
  shifts = rng.integers(0, 300, (8, 1)).astype(np.int32)
  got = np.asarray(nf._roll_rows(jnp.asarray(img), jnp.asarray(shifts)))
  want = np.stack(
      [np.roll(img[i], shifts[i, 0]) for i in range(8)]
  )
  np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_fused_noise_roll_rows_small_shift_fast_path():
  """max_shift < 128 at a lane-multiple width: the two-gather fast path
  (the noise chain's jitter configuration) equals np.roll exactly,
  including shifts of 0, 127, and wrap-around at the row start."""
  from putting_dune_tpu.ops import noise_fused_pallas as nf

  rng = np.random.default_rng(4)
  img = rng.random((8, 256), np.float32)
  shifts = np.asarray(
      [[0], [1], [17], [63], [64], [100], [126], [127]], np.int32
  )
  got = np.asarray(
      nf._roll_rows(jnp.asarray(img), jnp.asarray(shifts), max_shift=127)
  )
  want = np.stack([np.roll(img[i], shifts[i, 0]) for i in range(8)])
  np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_fused_noise_poisson_from_draws_moments():
  from putting_dune_tpu.ops import noise_fused_pallas as nf

  key = jax.random.PRNGKey(4)
  n = 200_000
  for lam in (0.5, 2.0, 20.0):
    u = jax.random.uniform(jax.random.fold_in(key, int(lam * 10)), (n,))
    z = jax.random.normal(jax.random.fold_in(key, 77), (n,))
    x = np.asarray(nf._poisson_from_draws(u, z, jnp.full((n,), lam)))
    assert abs(x.mean() - lam) < 0.05 * max(lam, 1.0), (lam, x.mean())
    assert abs(x.var() - lam) < 0.1 * max(lam, 1.0), (lam, x.var())


def test_render_noise_backends_share_distribution():
  """Full render via 'xla' noise vs the fused chain's XLA twin.

  Compares per-image means/stds of the pre-CLAHE pipeline output under
  both noise formulations (same params, independent streams)."""
  from putting_dune_tpu.ops import noise_fused_pallas as nf
  from putting_dune_tpu.imaging import render as render_lib

  lattice = lattice_lib.make_lattice(10)
  config = simulator_lib.SimulatorConfig(image_size=64, grid_columns=10)
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(5), lattice, config=config, batch_size=16,
      return_window=True,
  )
  clean = render_lib.render_clean_image(
      obs.window, state.fov, state.imaging.intensity_exponent,
      image_size=64, blur_amount=state.imaging.blur_amount,
  )
  xla = render_lib.render_stem_image(
      jax.random.PRNGKey(6), obs.window, state.fov, state.imaging,
      image_size=64, apply_clahe=False, noise_backend='xla',
  )
  packed = nf.pack_params(state.imaging, 16)
  twin = nf.apply_chain_reference(jax.random.PRNGKey(7), clean, packed)
  m1, m2 = float(jnp.mean(xla)), float(jnp.mean(twin))
  s1, s2 = float(jnp.std(xla)), float(jnp.std(twin))
  assert abs(m1 - m2) < 0.05, (m1, m2)
  assert abs(s1 - s2) < 0.05, (s1, s2)


def test_splat_pallas_matches_xla_backend():
  """The fused Pallas splat (interpret mode on CPU) matches the XLA einsum.

  On TPU 'auto' routes lane-aligned sizes to ops/splat_pallas.py; the
  only numeric divergence is the bf16 MXU contraction (~1e-3 relative),
  which interpret mode reproduces via the same cast.
  """
  window, fov, state = _window_and_fov()
  exponent = jnp.asarray([1.7, 1.5], jnp.float32)
  blur = jnp.asarray([0.4, 0.9], jnp.float32)
  size = 128
  ref = np.asarray(
      render_lib.render_clean_image(
          window, fov, exponent, image_size=size, blur_amount=blur,
          backend='xla',
      )
  )
  got = np.asarray(
      render_lib.render_clean_image(
          window, fov, exponent, image_size=size, blur_amount=blur,
          backend='pallas',
      )
  )
  assert got.shape == ref.shape
  assert np.abs(got - ref).max() < 5e-3, np.abs(got - ref).max()
