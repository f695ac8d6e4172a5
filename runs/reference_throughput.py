"""Measure the REFERENCE's own CPU throughput on this machine.

The reference (/root/reference/putting_dune) publishes no performance
numbers (SURVEY.md §6), so the rebuild's "matches or beats" claim has so
far been argued against the BASELINE.json north stars only. This script
grounds it: it imports the reference via tests/refcompat and times, on
the same container the rebuild's CPU paths run on,

  * env steps/sec of the reference's dm_env loop (its Python KMC,
    sklearn-kNN features, per-episode reset — the stack in SURVEY §3.1),
    with and without image observations;
  * STEM frames/sec of the reference's imaging.generate_stem_image at
    512² (its default render, imaging.py:39) and 128².

Writes REFERENCE_THROUGHPUT.json at the repo root and prints the rows.
Compare with BENCH_r*.json (one TPU v5e chip): the TPU rebuild's
1024-env row is measured in the millions of steps/s, the reference loop
below in the hundreds — that ratio, not an assumed baseline, is the
head-to-head performance claim. Run serially (no other CPU jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 'tests'),
)

from refcompat import loader as _loader  # noqa: E402

_REF = _loader.load_reference()


def _env_steps_per_sec(with_image: bool, budget_s: float = 30.0):
  """Random-walk the reference env; count env.step calls per wall second."""
  registry = _ref('experiments.registry')
  run_helpers = _ref('run_helpers')

  if with_image:
    # The reference's pixels configuration: RelativeToSilicon adapter +
    # ImageFeatureConstructor (512² render resized to 128,
    # feature_constructors.py:254-256) + goal reaching — the same
    # composition as its ppo_simple_images_tf eval experiment.
    experiments_ref = _ref('experiments.experiments')
    action_adapters_ref = _ref('action_adapters')
    feature_constructors_ref = _ref('feature_constructors')
    goals_ref = _ref('goals')

    def get_adapters():
      return experiments_ref.AdaptersAndGoal(
          action_adapter=action_adapters_ref.RelativeToSiliconActionAdapter(),
          feature_constructor=(
              feature_constructors_ref.ImageFeatureConstructor()
          ),
          goal=goals_ref.SingleSiliconGoalReaching(),
      )

    experiment = registry.create_eval_experiment('relative_random_simple')
    env = run_helpers.create_putting_dune_env(
        seed=0,
        get_adapters_and_goal=get_adapters,
        get_simulator_config=experiment.get_simulator_config,
    )
  else:
    experiment = registry.create_eval_experiment('relative_random_simple')
    env = run_helpers.create_putting_dune_env(
        seed=0,
        get_adapters_and_goal=experiment.get_adapters_and_goal,
        get_simulator_config=experiment.get_simulator_config,
    )
  rng = np.random.default_rng(0)
  ts = env.reset()
  # Warmup (first step pays sklearn/np setup).
  for _ in range(3):
    ts = env.step(rng.uniform(-1, 1, size=2).astype(np.float32))
  steps = 0
  t0 = time.perf_counter()
  while time.perf_counter() - t0 < budget_s:
    if ts.last():
      ts = env.reset()
    ts = env.step(rng.uniform(-1, 1, size=2).astype(np.float32))
    steps += 1
  return steps / (time.perf_counter() - t0)


def _ref(name):
  return _REF.module(name)


def _frames_per_sec(image_size: int, budget_s: float = 20.0):
  g = _ref('graphene')
  imaging = _ref('imaging')
  mu = _ref('microscope_utils')
  geo = _ref('geometry')

  rng = np.random.default_rng(0)
  material = g.PristineSingleDopedGraphene(grid_columns=50)
  material.reset(rng)
  si = material.get_silicon_position()
  fov = mu.MicroscopeFieldOfView(
      lower_left=geo.PointMaterialFrame(geo.Point(si - 10.0)),
      upper_right=geo.PointMaterialFrame(geo.Point(si + 10.0)),
  )
  grid = material.get_atoms_in_bounds(fov.lower_left, fov.upper_right)
  params = imaging.sample_image_parameters(rng, image_size=image_size)

  imaging.generate_stem_image(grid, fov, params, rng)  # warmup
  frames = 0
  t0 = time.perf_counter()
  while time.perf_counter() - t0 < budget_s:
    imaging.generate_stem_image(grid, fov, params, rng)
    frames += 1
  return frames / (time.perf_counter() - t0)


def main():
  out = {}
  out['ref_env_steps_per_sec_vector'] = round(_env_steps_per_sec(False), 1)
  try:
    out['ref_env_steps_per_sec_image'] = round(_env_steps_per_sec(True), 1)
  except Exception as e:  # registry name may differ; record why
    out['ref_env_steps_per_sec_image_error'] = repr(e)
  for size in (512, 128):
    try:
      out[f'ref_stem_frames_{size}_per_sec'] = round(_frames_per_sec(size), 1)
    except Exception as e:
      out[f'ref_stem_frames_{size}_per_sec_error'] = repr(e)

  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  path = os.path.join(root, 'REFERENCE_THROUGHPUT.json')
  with open(path, 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out, indent=2))


if __name__ == '__main__':
  main()
