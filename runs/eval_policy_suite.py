"""Evaluates the shipped policy zoo on a large seed suite (batched, TPU).

Runs the batched evaluator (whole suite = one device batch) for each
registry experiment and prints one summary line per experiment. At
medium_eval (1000 seeds) each run is a single big on-device rollout —
minutes on the v5e where the reference's host loop would take hours.

Usage: python runs/eval_policy_suite.py [suite] [name ...]
"""

import sys
import time

EXPERIMENTS = (
    'greedy_simple_rates',
    'relative_random_simple',
    'eval_ppo_learned_tf_2s',
    'eval_ppo_learned_tf_3s',
    'eval_ppo_learned_tf_4s',
    'eval_ppo_v3_2s',
    'eval_ppo_v3_3s',
    'eval_ppo_v3_4s',
    # Multi-dopant extension (beyond-parity): routed through the same
    # eval CLI; checkpoints load lazily so an unshipped policy just
    # reports FAILED without stopping the sweep.
    'multi_dopant_2_ppo',
    'multi_dopant_3_ppo',
    'multi_dopant_2_planner',
    'multi_dopant_3_planner',
    # Rate-aware planner + greedy baselines under each rate law.
    'planner_simple_rates',
    'planner_prior_rates',
    'greedy_prior_rates',
    'planner_learned_rates',
    'greedy_aligned_prior_rates',
)


def main() -> None:
  from putting_dune_tpu import eval as eval_cli

  suite = sys.argv[1] if len(sys.argv) > 1 else 'medium_eval'
  names = sys.argv[2:] or EXPERIMENTS
  for name in names:
    t0 = time.monotonic()
    try:
      results = eval_cli.main(
          eval_cli.Args(experiment_name=name, eval_suite=suite)
      )
    except Exception as e:  # keep the sweep going; report at the end
      print(f'{name}: FAILED {type(e).__name__}: {e}', flush=True)
      continue
    print(
        f'{name} [{suite}]: goals={results.average_num_times_reached_goal:.3f} '
        f'actions={results.average_num_actions_taken:.1f} '
        f'reward={results.average_total_reward:.3f} '
        f'({time.monotonic() - t0:.0f}s)',
        flush=True,
    )


if __name__ == '__main__':
  main()
