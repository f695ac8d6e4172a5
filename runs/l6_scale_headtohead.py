"""Production-scale rate-learner training head-to-head vs the reference.

The CI-scale comparison (tests/test_reference_headtohead_models.py) trains
3-model ensembles for 80 epochs on 1.5k shared transitions. This script
runs the same protocol at production scale — a 10-model bootstrap
ensemble x 200 epochs on 12k transitions generated ONCE by the
reference's own synthetic generator — through BOTH stacks
(reference: learn_rates.py:603-653 via LearnedTransitionRatePredictor;
rebuild: rate_learning/predictor.py), then compares the trained
ensembles' rate surfaces on the training distribution and against the
analytic prior total rate.

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu python runs/l6_scale_headtohead.py
Appends a summary block to PARITY_HEADTOHEAD.md (below the §3b list) and
prints the measured numbers.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import test_reference_headtohead_models as h2hm  # noqa: E402

assert h2hm._REF is not None, f'reference unavailable: {h2hm._REF_ERROR}'

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from ml_collections import config_dict  # noqa: E402

from putting_dune_tpu.rate_learning import config as config_lib  # noqa: E402
from putting_dune_tpu.rate_learning import data_utils  # noqa: E402
from putting_dune_tpu.rate_learning import predictor as predictor_lib  # noqa: E402

NUM_DATA = 12_000
SCALE_KW = dict(h2hm._TRAIN_KW)
SCALE_KW.update(num_models=10, epochs=200, hidden_dimensions=(64, 64))


def main():
  ref_du = h2hm._ref('rate_learning.data_utils')
  ref_lr = h2hm._ref('rate_learning.learn_rates')

  t0 = time.time()
  train_ref, _ = ref_du.generate_synthetic_data(
      num_data=NUM_DATA,
      data_seed=21,
      num_states=3,
      context_dim=2,
      actual_time_range=(0.0, 5.0),
      mode=ref_du.SyntheticDataType.PRIOR,
  )
  shared = {k: np.asarray(v) for k, v in train_ref.items()}
  shared['dt'] = shared['dt'].reshape(-1)
  shared['next_state'] = shared['next_state'].reshape(-1).astype(np.int32)
  print(f'dataset: {NUM_DATA} transitions in {time.time() - t0:.0f} s')

  t0 = time.time()
  ref_pred = ref_lr.LearnedTransitionRatePredictor(
      init_key=jax.random.PRNGKey(31),
      config=config_dict.FrozenConfigDict(SCALE_KW),
  )
  ref_pred.train(
      {k: jnp.asarray(v) for k, v in shared.items()}, jax.random.PRNGKey(41)
  )
  t_ref = time.time() - t0
  print(f'reference ensemble trained in {t_ref:.0f} s')

  t0 = time.time()
  our_pred = predictor_lib.LearnedRatePredictor(
      init_key=jax.random.PRNGKey(33),
      config=config_lib.RateLearningConfig(**SCALE_KW),
  )
  our_pred.train(shared, jax.random.PRNGKey(43))
  t_our = time.time() - t0
  print(f'rebuild ensemble trained in {t_our:.0f} s')

  positions = shared['position'][:8000].astype(np.float32)
  ctx = np.concatenate(
      [np.zeros_like(positions), positions], axis=-1
  ).astype(np.float32)
  ref_rates = np.asarray(
      ref_pred.apply_model(jnp.asarray(ctx), jax.random.PRNGKey(0))
  )
  our_rates = np.asarray(
      our_pred.apply_model(jnp.asarray(ctx), jax.random.PRNGKey(0))
  )
  true_tot = np.asarray(
      data_utils.prior_rates_canonical(jnp.asarray(positions))
  ).sum(-1)

  def corr(a, b):
    return float(np.corrcoef(np.ravel(a), np.ravel(b))[0, 1])

  tot_ref, tot_our = ref_rates.sum(-1), our_rates.sum(-1)
  hi = true_tot > 0.5 * true_tot.max()
  rel = np.abs(tot_our[hi] - tot_ref[hi]) / np.maximum(tot_ref[hi], 1e-9)
  argmax_agree = float(
      (np.argmax(our_rates[hi], -1) == np.argmax(ref_rates[hi], -1)).mean()
  )
  summary = dict(
      n_data=NUM_DATA,
      num_models=SCALE_KW['num_models'],
      epochs=SCALE_KW['epochs'],
      corr_per_neighbor=corr(our_rates, ref_rates),
      corr_totals=corr(tot_our, tot_ref),
      corr_our_vs_analytic=corr(tot_our, true_tot),
      corr_ref_vs_analytic=corr(tot_ref, true_tot),
      high_rate_mean_rel_diff=float(rel.mean()),
      argmax_agreement=argmax_agree,
      train_seconds_ref=round(t_ref),
      train_seconds_ours=round(t_our),
  )
  print(summary)

  block = (
      '- Production-scale training outcome (runs/l6_scale_headtohead.py: '
      f"{SCALE_KW['num_models']}-model bootstrap ensembles x "
      f"{SCALE_KW['epochs']} epochs on {NUM_DATA} shared transitions): "
      f"per-neighbor surface corr {summary['corr_per_neighbor']:.3f}, "
      f"totals corr {summary['corr_totals']:.3f}, argmax agreement "
      f"{summary['argmax_agreement']:.2f} on the high-rate region, mean "
      f"high-rate rel diff {summary['high_rate_mean_rel_diff']:.3f}; "
      f"totals vs the analytic prior {summary['corr_our_vs_analytic']:.3f} "
      f"(ours) / {summary['corr_ref_vs_analytic']:.3f} (ref)."
  )
  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  path = os.path.join(root, 'PARITY_HEADTOHEAD.md')
  marker = '- Documented quirk: the reference synthetic generator rotates'
  text = open(path).read()
  if 'Production-scale training outcome' not in text and marker in text:
    text = text.replace(marker, block + '\n' + marker)
    open(path, 'w').write(text)
    print(f'appended summary to {path}')
  else:
    print('PARITY_HEADTOHEAD.md not updated (marker missing or already '
          'present) — paste the block manually if needed:')
    print(block)


if __name__ == '__main__':
  main()
