"""End-to-end rate learning from simulated trajectories (BASELINE config 2)
and the canonicalization-equivariance property it depends on.

Key finding (documented in rates.prior_rates): the reference's prior rate
law is NOT rotation-equivariant (its peak sits at the REFLECTED neighbor
angle), while the rate-learning canonicalization (standardize to the
beam-nearest neighbor on +x) and the 6-fold augmentation assume
equivariance. Data simulated with the reference prior therefore carries
near-uniform canonical labels and cannot be learned beyond the radial
profile; the physically-intended prior_rates_aligned is equivariant and
the full loop recovers the law (0.996 rate correlation in the TPU run).
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import microscope_data as md
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures
from putting_dune_tpu.pipeline import trajectories_to_transitions as t2t
from putting_dune_tpu.pipeline import train_rate_learner as trl

LATTICE = lattice_lib.make_lattice(num_cols=20)
CONFIG = simulator_lib.SimulatorConfig(grid_columns=20)
BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


def _collect_datapoints(rate_fn, batch=96, steps=10, dwell=1.5, seed=0):
  key = jax.random.PRNGKey(seed)
  state, obs = simulator_lib.reset(
      key, LATTICE, config=CONFIG, batch_size=batch, return_window=True
  )
  per_step = [
      [
          md.observation_from_device(
              obs.window, obs.fov, obs.elapsed_seconds, batch_index=b
          )
          for b in range(batch)
      ]
  ]
  for _ in range(steps):
    key, k1, k2 = jax.random.split(key, 3)
    si = obs.si_position_microscope
    extent = state.fov.upper_right - state.fov.lower_left
    delta = jax.random.uniform(k1, (batch, 2), minval=-1.8, maxval=1.8)
    pos = jnp.clip(si + delta / extent, 0, 1)
    control = structures.BeamControl(
        position=pos,
        dwell_seconds=jnp.full((batch,), dwell),
        voltage_kv=jnp.full((batch,), 60.0),
        current_na=jnp.full((batch,), 0.1),
    )
    state, obs, _ = simulator_lib.step(
        state, k2, control, LATTICE, rate_fn, config=CONFIG,
        return_window=True,
    )
    pos_np = np.asarray(pos)
    per_step.append(
        [
            md.observation_from_device(
                obs.window, obs.fov, obs.elapsed_seconds, batch_index=b,
                controls=(
                    md.BeamControl(
                        pos_np[b], dt.timedelta(seconds=dwell), 60.0, 0.1
                    ),
                ),
            )
            for b in range(batch)
        ]
    )
  trajectories = [
      md.Trajectory(tuple(per_step[t][b] for t in range(steps + 1)))
      for b in range(batch)
  ]
  transitions = t2t.trajectories_to_transitions(
      trajectories, previous_controls_at_current_timestep=True
  )
  datapoints, _ = trl.transitions_to_datapoints(transitions)
  return datapoints


def _label_vs_analytic_agreement(datapoints, rate_fn):
  nbr = BOND * np.stack(
      [
          np.cos(np.deg2rad([0.0, 120.0, 240.0])),
          np.sin(np.deg2rad([0.0, 120.0, 240.0])),
      ],
      axis=-1,
  )
  agree = []
  for d in datapoints:
    if d.next_state == 0:
      continue
    true = np.asarray(
        rate_fn(
            jnp.zeros((1, 2)),
            jnp.asarray(nbr, jnp.float32)[None],
            jnp.asarray(d.beam_pos, jnp.float32)[None],
        )
    )[0]
    agree.append(int(true.argmax()) == d.next_state - 1)
  return np.asarray(agree)


def test_canonical_labels_follow_equivariant_prior():
  datapoints = _collect_datapoints(rates_lib.prior_rates_aligned)
  agree = _label_vs_analytic_agreement(
      datapoints, rates_lib.prior_rates_aligned
  )
  assert len(agree) > 30
  assert agree.mean() > 0.8, agree.mean()


def test_reflected_prior_breaks_canonicalization():
  """The reference prior's reflection quirk destroys canonical labels."""
  datapoints = _collect_datapoints(rates_lib.prior_rates, seed=1)
  agree = _label_vs_analytic_agreement(datapoints, rates_lib.prior_rates)
  assert len(agree) > 30
  # The canonical-frame analytic argmax is always rank 0 for the reflected
  # law, but actual transitions spread ~uniformly: near-chance agreement.
  assert agree.mean() < 0.6, agree.mean()


def test_shipped_rate_predictor_matches_analytic_law():
  """The production-run distilled rate predictor recovers prior_rates_aligned.

  The shipped artifact comes from the reference-scale loop (512 simulated
  trajectories -> 40.9k transitions -> 50-model bootstrap ensemble x 500
  epochs -> distillation; runs/rate_loop_production.py). Regression: its
  rates must correlate >0.95 with the analytic law it was trained from.
  """
  import os

  import numpy as np

  from putting_dune_tpu import constants
  from putting_dune_tpu import rates as rates_lib
  from putting_dune_tpu.experiments import registry
  from putting_dune_tpu.rate_learning import config as config_lib
  from putting_dune_tpu.rate_learning import predictor as predictor_lib

  workdir = os.path.join(
      os.path.dirname(registry.__file__), 'model_weights', 'rate_predictor'
  )
  if not os.path.isdir(workdir):
    pytest.skip('rate_predictor weights not shipped')

  predictor = predictor_lib.LearnedRatePredictor(
      init_key=jax.random.PRNGKey(0),
      config=config_lib.RateLearningConfig(beam_units='angstroms'),
  )
  predictor.load(workdir)
  rate_fn = predictor.as_rate_function()

  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  angles = jnp.deg2rad(jnp.array([0.0, 120.0, 240.0]))
  nbr = bond * jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
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
  assert r > 0.95, r
