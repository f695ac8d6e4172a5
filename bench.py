"""Headline benchmark: batched environment steps/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline (BASELINE.md): the reference publishes no numbers; the north star
is >= 1,000,000 batched env steps/sec (1024 envs) and >= 50,000 rendered
128x128 STEM frames/sec on one v5e chip. vs_baseline is value / 1e6.

Measurement notes: every timed region ends with a scalar host fetch
(float(checksum)) — on the remote-TPU backend, block_until_ready can
acknowledge before execution finishes, so device-only timing overreports.
Work is batched into long lax.scan bodies so per-dispatch tunnel latency
is amortized.
"""

import json
import time

import jax
import jax.numpy as jnp

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu.env import action_adapters
from putting_dune_tpu.env import env as env_lib
from putting_dune_tpu.env import features as features_lib
from putting_dune_tpu.imaging import render as render_lib

BATCH = 1024
STEPS_PER_CALL = 512
ENV_STEP_BASELINE = 1_000_000.0
FRAMES_BASELINE = 50_000.0

# Peak numbers for one TPU v5e chip (the BASELINE target hardware):
# 197 TFLOP/s bf16 MXU, 819 GB/s HBM. Utilization fields are computed as
# XLA-cost-analysis totals (flops / bytes accessed of the whole compiled
# program) divided by measured wall time and these peaks — achieved
# fractions, methodology in PERFORMANCE.md §0. XLA's "bytes accessed" is
# an HLO-level estimate (fusion can make it overcount actual HBM
# traffic), so hbm_util is an upper-bound-ish indicator, not a
# profiler-grade number.
PEAK_BF16_FLOPS = 1.97e14
PEAK_HBM_BYTES = 8.19e11


def _program_cost(jitted, *args):
  """(flops, bytes) totals of a compiled program, or None."""
  try:
    analysis = jitted.lower(*args).compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
      analysis = analysis[0]
    return (
        float(analysis.get('flops', 0.0)),
        float(analysis.get('bytes accessed', 0.0)),
    )
  except Exception:
    return None


def _utilization(cost, seconds):
  if cost is None or seconds <= 0:
    return {}
  flops, nbytes = cost
  return {
      'flops_util': round(flops / seconds / PEAK_BF16_FLOPS, 4),
      'hbm_util': round(nbytes / seconds / PEAK_HBM_BYTES, 4),
      'achieved_gflops': round(flops / seconds / 1e9, 1),
      'achieved_gbs': round(nbytes / seconds / 1e9, 1),
  }


_VPU_CEILING_CACHE = [None]


def bench_vpu_transcendental_ceiling(
    n_elems=4_194_304, iters=16, exps_per_iter=32
):
  """MEASURED f32 transcendental issue ceiling of this chip's VPU.

  Times dense exp-chains x <- exp(-x) (32 chained per element per scan
  iteration so HBM round-trips and loop overhead amortize; values stay
  in (e^-1, 1); data-dependent through the carry so XLA can neither
  fold nor hoist them). Measured ~80 Gexp/s on the v5e, reproducible
  within the tunnel's scatter; sparser chains (1 exp/iteration) only
  reach ~21 Gexp/s — loop/HBM-bound, not a transcendental ceiling.
  The *_vpu_util_analytic fields divide each pipeline's analytic
  transcendental rate by this number, so "VPU-bound at the floor"
  claims are auditable from the bench JSON alone (PERFORMANCE.md §0).
  """
  if _VPU_CEILING_CACHE[0] is not None:
    return _VPU_CEILING_CACHE[0]

  @jax.jit
  def chain(x):
    def body(x, _):
      for _ in range(exps_per_iter):
        x = jnp.exp(-x)
      return x, ()

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return jnp.sum(x[0])

  x = jnp.linspace(0.1, 1.0, n_elems, dtype=jnp.float32).reshape(-1, 1024)
  float(chain(x))  # compile + warmup
  best = float('inf')
  for _ in range(5):
    t0 = time.perf_counter()
    float(chain(x))
    best = min(best, time.perf_counter() - t0)
  _VPU_CEILING_CACHE[0] = n_elems * iters * exps_per_iter / best
  return _VPU_CEILING_CACHE[0]


def _imaging_analytics(image_size, batch, rounds, k_atoms, seconds):
  """Analytic per-kernel work of the imaging pipeline vs measured wall.

  XLA cost analysis cannot see inside Pallas custom calls, so these
  fields carry the ANALYTIC operation counts of each kernel family
  (PERFORMANCE.md §0/§2/§3) next to the measured row:

    * splat: 2*B*K*S^2 MACs/round on the MXU (exact einsum count) plus
      2*K*S exps/frame for the Gaussian profile matrices;
    * noise chain: ~8 transcendentals/pixel (Poisson hybrid, gamma pow,
      exponential log, Box-Muller log/cos) and frames-in+out HBM bytes;
    * CLAHE: nibble histograms use 2*16 compares/pixel + a block-diag
      128x128 MXU contraction; the remap is ~2 gathers + 4 blend
      MACs/pixel; bytes = uint8 bins in + f32 image out.

  vpu_util_analytic = (all analytic transcendentals / wall) divided by
  the MEASURED exp ceiling from bench_vpu_transcendental_ceiling.
  """
  px_round = batch * image_size * image_size
  profile_transc = 2.0 * k_atoms * image_size * batch  # per round
  noise_transc = 8.0 * px_round
  ceiling = bench_vpu_transcendental_ceiling()
  transc_rate = (profile_transc + noise_transc) * rounds / seconds
  fields = {
      'vpu_transcendental_ceiling_gops': round(ceiling / 1e9, 1),
      'analytic_transcendentals_gops': round(transc_rate / 1e9, 2),
      'vpu_util_analytic': round(transc_rate / ceiling, 4),
      'noise_transcendentals_per_round': round(noise_transc),
      'noise_min_ms_per_round_at_ceiling': round(
          noise_transc / ceiling * 1e3, 3
      ),
      'noise_hbm_bytes_per_round': round(2 * 4 * px_round),
      'clahe_hist_compares_per_round': round(32 * px_round),
      'clahe_remap_gathers_per_round': round(2 * px_round),
      'clahe_io_bytes_per_round': round(5 * px_round),
      'splat_mxu_util_analytic': round(
          2.0 * batch * k_atoms * image_size**2 * rounds
          / seconds
          / PEAK_BF16_FLOPS,
          4,
      ),
  }
  return fields


def bench_env_steps(rate_fn=rates_lib.prior_rates, batch=None):
  batch = batch or BATCH
  lattice = lattice_lib.make_lattice(50)
  env = env_lib.PuttingDuneEnv(
      lattice=lattice,
      rate_fn=rate_fn,
      adapter=action_adapters.RelativeToSiliconActionAdapter(),
      features=features_lib.SingleSiliconPristineGrapheneFeatures(),
      config=env_lib.EnvConfig(),
      batch_size=batch,
  )

  @jax.jit
  def rollout(state, ts, key):
    def body(carry, _):
      state, ts, key = carry
      key, k_act, k_step = jax.random.split(key, 3)
      action = jax.random.uniform(
          k_act, (batch, 2), minval=-1.0, maxval=1.0
      )
      state, ts = env.step(state, action, k_step)
      return (state, ts, key), ()

    (state, ts, key), _ = jax.lax.scan(
        body, (state, ts, key), None, length=STEPS_PER_CALL
    )
    checksum = jnp.sum(ts.reward) + jnp.sum(ts.observation)
    return state, ts, key, checksum

  key = jax.random.PRNGKey(0)
  state, ts = env.reset(key)
  state, ts, key, chk = rollout(state, ts, key)  # compile + warmup
  float(chk)

  # Best-of-N: the remote-TPU tunnel has ~1.5-2x run-to-run dispatch
  # scatter; the fastest call is the honest device-throughput estimate
  # (each call still ends in a host fetch, so it can't under-measure).
  best = float('inf')
  for _ in range(4):
    t0 = time.perf_counter()
    state, ts, key, chk = rollout(state, ts, key)
    float(chk)  # host fetch: forces real completion
    best = min(best, time.perf_counter() - t0)
  cost = _program_cost(rollout, state, ts, key)
  return batch * STEPS_PER_CALL / best, _utilization(cost, best)


def bench_frames(
    image_size: int = 128, batch: int = 256, rounds: int = 64
) -> float:
  lattice = lattice_lib.make_lattice(50)
  config = simulator_lib.SimulatorConfig(image_size=image_size)

  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(1), lattice, config=config, batch_size=batch,
      return_window=True,
  )

  @jax.jit
  def render_many(key, window, fov, params):
    def body(key, _):
      key, k = jax.random.split(key)
      img = render_lib.render_stem_image(
          k, window, fov, params, image_size=image_size
      )
      return key, jnp.sum(img[:, 0, 0])

    key, sums = jax.lax.scan(body, key, None, length=rounds)
    return jnp.sum(sums)

  params = state.imaging
  float(render_many(jax.random.PRNGKey(2), obs.window, state.fov, params))

  key = jax.random.PRNGKey(3)
  best = float('inf')
  for _ in range(3):
    key, k = jax.random.split(key)
    t0 = time.perf_counter()
    float(render_many(k, obs.window, state.fov, params))
    best = min(best, time.perf_counter() - t0)
  cost = _program_cost(render_many, key, obs.window, state.fov, params)
  util = _utilization(cost, best)
  # XLA cost analysis sees custom calls (the fused Pallas noise/CLAHE
  # kernels) as zero flops/bytes, so the row also carries the ANALYTIC
  # per-kernel work of the pipeline (PERFORMANCE.md §0/§2).
  k_atoms = obs.window.positions.shape[-2]
  util.update(
      _imaging_analytics(image_size, batch, rounds, k_atoms, best)
  )
  return batch * rounds / best, util


def bench_env_steps_learned():
  """Env steps/sec with the shipped distilled NEURAL rate predictor
  inside the KMC loop.

  The reference's learned-rate simulators route through a TF SavedModel
  call per KMC iteration (learn_rates.py:925-972); here the ensemble-
  distilled student MLP runs natively inside the batched lax.while_loop.
  Returns 0.0 when the shipped predictor is absent.
  """
  import os

  from putting_dune_tpu.experiments import registry as registry_lib
  from putting_dune_tpu.rate_learning import config as rl_config
  from putting_dune_tpu.rate_learning import predictor as predictor_lib

  workdir = os.path.join(
      os.path.dirname(registry_lib.__file__), 'model_weights',
      'rate_predictor',
  )
  if not os.path.isdir(workdir):
    return 0.0, {}
  predictor = predictor_lib.LearnedRatePredictor(
      init_key=jax.random.PRNGKey(0),
      config=rl_config.RateLearningConfig(beam_units='angstroms'),
  )
  predictor.load(workdir)
  return bench_env_steps(rate_fn=predictor.as_rate_function())


def bench_image_env_steps(
    render_size: int = 128, obs_size: int = 128, batch: int = 256,
    steps: int = 32,
) -> float:
  """Env steps/sec with image observations (BASELINE config 3).

  Defaults render at the agent's 128 resolution. The REFERENCE default
  renders 512x512 then resizes to 128 for the agent (imaging.py:39,
  feature_constructors.py:254-256) — pass render_size=512, obs_size=128
  for that configuration (reported as the refcond row).
  """
  lattice = lattice_lib.make_lattice(50)
  env = env_lib.PuttingDuneEnv(
      lattice=lattice,
      rate_fn=rates_lib.simple_canonical_rates,
      adapter=action_adapters.RelativeToSiliconActionAdapter(),
      features=features_lib.ImageFeatures(image_size=obs_size),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(image_size=render_size)
      ),
      batch_size=batch,
  )

  @jax.jit
  def rollout(state, ts, key):
    def body(carry, _):
      state, ts, key = carry
      key, k_act, k_step = jax.random.split(key, 3)
      action = jax.random.uniform(
          k_act, (batch, 2), minval=-1.0, maxval=1.0
      )
      state, ts = env.step(state, action, k_step)
      return (state, ts, key), ()

    (state, ts, key), _ = jax.lax.scan(
        body, (state, ts, key), None, length=steps
    )
    return state, ts, key, jnp.sum(ts.observation['image'][:, 0, 0, 0])

  key = jax.random.PRNGKey(7)
  state, ts = env.reset(key)
  state, ts, key, chk = rollout(state, ts, key)
  float(chk)
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    state, ts, key, chk = rollout(state, ts, key)
    float(chk)
    best = min(best, time.perf_counter() - t0)
  cost = _program_cost(rollout, state, ts, key)
  util = _utilization(cost, best)
  # Analytic per-kernel imaging work for this row too (one rendered
  # frame per env step; the Pallas kernels are invisible to XLA cost
  # analysis — see _imaging_analytics).
  util.update(
      _imaging_analytics(
          render_size,
          batch,
          steps,
          simulator_lib.SimulatorConfig(
              image_size=render_size
          ).window_capacity,
          best,
      )
  )
  return batch * steps / best, util


def bench_stress_env_steps() -> float:
  """BASELINE stress config 5: multi-dopant lattice + instrument drift +
  full image observation pipeline, batched env steps/sec."""
  from putting_dune_tpu.env import multi_dopant

  batch = 256
  steps = 32
  env = multi_dopant.MultiDopantEnv(
      lattice=lattice_lib.make_lattice(50),
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=batch,
      num_dopants=2,
      observation_mode='image',
      image_size=128,
      drift_per_frame_angstroms=0.5,
  )

  @jax.jit
  def rollout(state, key):
    def body(carry, _):
      state, key = carry
      key, k_act, k_step = jax.random.split(key, 3)
      action = jax.random.uniform(
          k_act, (batch, 2), minval=-1.0, maxval=1.0
      )
      state, ts = env.step(state, action, k_step)
      return (state, key), jnp.sum(ts.observation['image'][:, 0, 0, 0])

    (state, key), sums = jax.lax.scan(
        body, (state, key), None, length=steps
    )
    return state, key, jnp.sum(sums)

  state, _ = env.reset(jax.random.PRNGKey(11))
  key = jax.random.PRNGKey(12)
  state, key, chk = rollout(state, key)
  float(chk)
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    state, key, chk = rollout(state, key)
    float(chk)
    best = min(best, time.perf_counter() - t0)
  return batch * steps / best


def main():
  result = {}

  def put(name, value, util):
    result[name] = round(value, 1)
    for k, v in (util or {}).items():
      result[f'{name}_{k}'] = v

  # Frames are measured FIRST: the big env-rollout program leaves the
  # remote-TPU runtime in a state that degrades subsequent dispatch
  # throughput (observed 8.2k vs 23k f/s depending on order).
  frames_ps, frames_util = bench_frames()
  put('stem_frames_128_per_sec', frames_ps, frames_util)
  f512, u512 = bench_frames(image_size=512, batch=64, rounds=16)
  put('stem_frames_512_per_sec', f512, u512)
  img_sps, img_util = bench_image_env_steps()
  put('image_env_steps_per_sec_256envs', img_sps, img_util)
  # Reference default imaging conditions (render 512^2, agent sees 128;
  # imaging.py:39, feature_constructors.py:254-256) at increasing batch —
  # the batch-scaling curve for the refcond configuration.
  for refcond_batch, refcond_steps in ((64, 16), (128, 16), (256, 8),
                                       (512, 8)):
    try:
      sps, util = bench_image_env_steps(
          render_size=512, obs_size=128, batch=refcond_batch,
          steps=refcond_steps,
      )
    except Exception:
      sps, util = 0.0, {}
    put(
        f'image_env_steps_per_sec_refcond_512render_{refcond_batch}envs',
        sps, util,
    )
  env_sps, env_util = bench_env_steps()
  put('env_steps_per_sec_1024envs', env_sps, env_util)
  try:
    learned_sps, learned_util = bench_env_steps_learned()
  except Exception:  # the headline bench must never die on an extra
    learned_sps, learned_util = 0.0, {}
  put('learned_rate_env_steps_per_sec_1024envs', learned_sps, learned_util)
  try:
    stress_sps = bench_stress_env_steps()
  except Exception:
    stress_sps = 0.0
  result['stress_multidopant_drift_image_env_steps_per_sec_256envs'] = (
      round(stress_sps, 1)
  )
  for big_batch in (4096, 8192):
    # BASELINE config 4 names 1024-4096 envs; scaling is sublinear-free
    # (independent envs, no collectives) so bigger batches amortize more.
    # 16384 reaches 7.11M but its remote compile is too slow for this
    # bench.
    try:
      sps, _ = bench_env_steps(batch=big_batch)
    except Exception:
      sps = 0.0
    result[f'env_steps_per_sec_{big_batch}envs'] = round(sps, 1)

  result = {
      'metric': 'env_steps_per_sec_1024envs',
      'value': result['env_steps_per_sec_1024envs'],
      'unit': 'steps/s',
      'vs_baseline': round(env_sps / ENV_STEP_BASELINE, 4),
      'stem_frames_vs_baseline': round(frames_ps / FRAMES_BASELINE, 4),
      # Peaks used for the *_flops_util / *_hbm_util fields (v5e chip).
      'peak_bf16_flops': PEAK_BF16_FLOPS,
      'peak_hbm_bytes_per_sec': PEAK_HBM_BYTES,
      **result,
      'device': str(jax.devices()[0]),
  }
  print(json.dumps(result))


if __name__ == '__main__':
  main()
