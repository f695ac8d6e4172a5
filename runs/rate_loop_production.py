"""Reference-scale rate-learning run (round 2).

Drives the full loop at the reference's published scale
(learn_rates.py:40-64: 50-model bootstrap ensemble, 500 epochs, batch 256,
distillation): simulate trajectories on the TPU with the equivariant prior
(prior_rates_aligned), write tfrecords, run the train_rate_learner
pipeline, then score the distilled predictor against the analytic law.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python runs/rate_loop_production.py
"""

import datetime as dt
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.io import records as records_lib
from putting_dune_tpu.pipeline import train_rate_learner as trl

WORKDIR = 'runs/rate_production'
BATCH = 512
STEPS = 80
DWELL = 1.5


def simulate_trajectories(path: str) -> None:
  lattice = lattice_lib.make_lattice(30)
  config = simulator_lib.SimulatorConfig(grid_columns=30)
  key = jax.random.PRNGKey(42)
  state, obs = simulator_lib.reset(
      key, lattice, config=config, batch_size=BATCH, return_window=True
  )
  per_step = [
      [
          md.observation_from_device(
              obs.window, obs.fov, obs.elapsed_seconds, batch_index=b
          )
          for b in range(BATCH)
      ]
  ]
  t0 = time.monotonic()
  for step in range(STEPS):
    key, k1, k2 = jax.random.split(key, 3)
    si = obs.si_position_microscope
    extent = state.fov.upper_right - state.fov.lower_left
    delta = jax.random.uniform(k1, (BATCH, 2), minval=-1.8, maxval=1.8)
    pos = jnp.clip(si + delta / extent, 0, 1)
    control = structures.BeamControl(
        position=pos,
        dwell_seconds=jnp.full((BATCH,), DWELL),
        voltage_kv=jnp.full((BATCH,), 60.0),
        current_na=jnp.full((BATCH,), 0.1),
    )
    state, obs, _ = simulator_lib.step(
        state, k2, control, lattice, rates_lib.prior_rates_aligned,
        config=config, return_window=True,
    )
    pos_np = np.asarray(pos)
    per_step.append(
        [
            md.observation_from_device(
                obs.window, obs.fov, obs.elapsed_seconds, batch_index=b,
                controls=(
                    md.BeamControl(
                        pos_np[b], dt.timedelta(seconds=DWELL), 60.0, 0.1
                    ),
                ),
            )
            for b in range(BATCH)
        ]
    )
    if (step + 1) % 10 == 0:
      print(
          f'simulated {step + 1}/{STEPS} steps '
          f'({time.monotonic() - t0:.0f}s)',
          flush=True,
      )
  trajectories = [
      md.Trajectory(tuple(per_step[t][b] for t in range(STEPS + 1)))
      for b in range(BATCH)
  ]
  records_lib.write_records(path, trajectories)
  print(f'wrote {len(trajectories)} trajectories to {path}', flush=True)


def score_predictor(workdir: str) -> float:
  """Pearson r between learned and analytic per-neighbor rates."""
  from putting_dune_tpu.rate_learning import config as config_lib
  from putting_dune_tpu.rate_learning import predictor as predictor_lib

  predictor = predictor_lib.LearnedRatePredictor(
      init_key=jax.random.PRNGKey(0),
      config=config_lib.RateLearningConfig(beam_units='angstroms'),
  )
  predictor.load(workdir)
  rate_fn = predictor.as_rate_function()

  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  nbr = bond * jnp.stack(
      [
          jnp.cos(jnp.deg2rad(jnp.array([0.0, 120.0, 240.0]))),
          jnp.sin(jnp.deg2rad(jnp.array([0.0, 120.0, 240.0]))),
      ],
      axis=-1,
  )
  n = 512
  beam = jax.random.uniform(
      jax.random.PRNGKey(7), (n, 2), minval=-1.8, maxval=1.8
  )
  si = jnp.zeros((n, 2))
  nbrs = jnp.tile(nbr[None], (n, 1, 1))
  learned = np.asarray(rate_fn(si, nbrs, beam)).ravel()
  analytic = np.asarray(
      rates_lib.prior_rates_aligned(si, nbrs, beam)
  ).ravel()
  r = float(np.corrcoef(learned, analytic)[0, 1])
  print(f'rate correlation (distilled vs analytic): {r:.4f}', flush=True)
  return r


if __name__ == '__main__':
  os.makedirs(WORKDIR, exist_ok=True)
  path = os.path.join(WORKDIR, 'trajectories.tfrecords')
  if not os.path.exists(path):
    simulate_trajectories(path)
  args = trl.Args(
      source_path=path,
      workdir=WORKDIR,
      # Controls are attached to the post-exposure observation (as the
      # real microscope logger does); without this flag the pipeline
      # pairs each transition with the PREVIOUS step's beam position.
      previous_controls_at_current_timestep=True,
      num_models=50,  # reference learn_rates.py:40-64
      epochs=500,
      epoch_chunk=25,  # bounded device programs through the TPU relay
      batch_size=256,
      distill=True,
      visualize_rates=True,
  )
  t0 = time.monotonic()
  trl.main(args)
  print(f'pipeline done in {time.monotonic() - t0:.0f}s', flush=True)
  score_predictor(WORKDIR)
