"""Distill the rate-aware planner into an MLP policy (gated ship).

Trains agents/distill.py (DAgger) against the registry's
planner_prior_rates conditions (material-frame adapter, dwell 5 s, human
prior rate law — where the reference's GreedyAgent reaches only ~2% of
goals), then evaluates the student head-to-head on a fixed 100-seed
suite and ships to experiments/model_weights/planner_distilled_prior
only if it clears the gate:

  goal rate >= 0.95 AND actions-to-goal <= 1.5x the live planner's.

Usage: python runs/distill_planner.py [num_iterations] [batch] [seed]
"""

import os
import shutil
import sys

import jax

from putting_dune_tpu import eval_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu import run_helpers
from putting_dune_tpu.agents import distill
from putting_dune_tpu.agents import eval_agent as eval_agent_lib
from putting_dune_tpu.experiments import registry

SHIPPED = 'putting_dune_tpu/experiments/model_weights/planner_distilled_prior'
WORKDIR = 'runs/planner_distilled_prior_cand'
EVAL_SEEDS = list(range(100))


def eval_experiment_with_agent(name: str, agent) -> tuple[float, float]:
  """(goal_rate, actions_per_goal) on the fixed suite, registry-identical."""
  exp = registry.create_eval_experiment(name)
  env = run_helpers.create_batched_env(
      exp.get_adapters_and_goal,
      exp.get_simulator_config,
      batch_size=len(EVAL_SEEDS),
  )
  results = eval_lib.evaluate_batched(env, agent.policy(), EVAL_SEEDS)
  agg = eval_lib.aggregate_results(results)
  return (
      float(agg.average_num_times_reached_goal),
      float(agg.average_num_actions_taken),
  )


def main() -> None:
  num_iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 12
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
  seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

  exp = registry.create_eval_experiment('planner_prior_rates')
  env = run_helpers.create_batched_env(
      exp.get_adapters_and_goal,
      exp.get_simulator_config,
      batch_size=batch,
  )
  config = distill.DistillConfig(
      num_iterations=num_iterations,
      rollout_length=64,
      sgd_steps_per_iteration=384,
      minibatch_size=4096,
  )

  def progress(i, metrics):
    print(
        f"distill iter {i + 1}/{num_iterations}: loss={metrics['loss']:.4f} "
        f"beta={metrics['beta']:.3f}",
        flush=True,
    )

  distill.train_and_save(
      env,
      WORKDIR,
      rates_lib.prior_rates,
      config=config,
      seed=seed,
      progress=progress,
  )

  student = eval_agent_lib.EvalAgent.load(WORKDIR)
  s_rate, s_actions = eval_experiment_with_agent(
      'planner_prior_rates', student
  )
  # Teacher baseline on the same seeds for the gate and the record.
  teacher_exp = registry.create_eval_experiment('planner_prior_rates')
  teacher = teacher_exp.get_agent(None, teacher_exp.get_adapters_and_goal())
  t_rate, t_actions = eval_experiment_with_agent(
      'planner_prior_rates', teacher
  )
  print(
      f'head-to-head (100 seeds): teacher(planner) {t_rate:.2f} @ '
      f'{t_actions:.1f} vs student(MLP) {s_rate:.2f} @ {s_actions:.1f}',
      flush=True,
  )

  if s_rate >= 0.95 and s_actions <= 1.5 * t_actions:
    if os.path.isdir(SHIPPED):
      shutil.rmtree(SHIPPED)
    shutil.copytree(WORKDIR, SHIPPED)
    print(f'SHIPPED: student -> {SHIPPED}', flush=True)
  else:
    print('NOT shipped (gate failed)', flush=True)

  jax.clear_caches()


if __name__ == '__main__':
  main()
