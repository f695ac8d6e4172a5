"""Distill the rate-aware planner into an MLP policy (gated ship).

Trains agents/distill.py (DAgger) against a registry planner experiment
(the human-prior rate law, where the reference's GreedyAgent reaches only
~2% of goals), then evaluates the student head-to-head on a fixed
100-seed suite and ships only if it clears the gate:

  goal rate >= 0.95 AND actions-to-goal <= 1.5x the live planner's.

Modes:
  fixed    -> planner_prior_rates conditions (dwell 5 s, 2-dim actions);
              ships experiments/model_weights/planner_distilled_prior.
  variable -> planner_prior_rates_variable_time conditions (dwell in
              [1.5, 20] s, 3-dim actions: the student also emits the
              dwell fraction); ships ..._variable_time.

Usage: python runs/distill_planner.py [mode] [num_iterations] [batch] [seed]
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

WEIGHTS = 'putting_dune_tpu/experiments/model_weights'
EVAL_SEEDS = list(range(100))

MODES = {
    'fixed': {
        'experiment': 'planner_prior_rates',
        'shipped': f'{WEIGHTS}/planner_distilled_prior',
        'workdir': 'runs/planner_distilled_prior_cand',
        'config': dict(),
    },
    'variable': {
        'experiment': 'planner_prior_rates_variable_time',
        'shipped': f'{WEIGHTS}/planner_distilled_prior_variable_time',
        'workdir': 'runs/planner_distilled_prior_vt_cand',
        'config': dict(dwell_range_seconds=(1.5, 20.0)),
    },
}


def eval_agent_on(name: str, agent) -> tuple[float, float, float]:
  """(goal_rate, actions_per_goal, env_seconds) on the fixed suite."""
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
      float(agg.average_environment_seconds_to_goal),
  )


def main() -> None:
  mode = sys.argv[1] if len(sys.argv) > 1 else 'fixed'
  num_iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 12
  batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
  seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
  spec = MODES[mode]

  exp = registry.create_eval_experiment(spec['experiment'])
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
      **spec['config'],
  )

  def progress(i, metrics):
    print(
        f"distill[{mode}] iter {i + 1}/{num_iterations}: "
        f"loss={metrics['loss']:.4f} beta={metrics['beta']:.3f}",
        flush=True,
    )

  distill.train_and_save(
      env,
      spec['workdir'],
      rates_lib.prior_rates,
      config=config,
      seed=seed,
      progress=progress,
  )

  student = eval_agent_lib.EvalAgent.load(spec['workdir'])
  s_rate, s_actions, s_secs = eval_agent_on(spec['experiment'], student)
  teacher = exp.get_agent(None, exp.get_adapters_and_goal())
  t_rate, t_actions, t_secs = eval_agent_on(spec['experiment'], teacher)
  print(
      f'head-to-head [{mode}] (100 seeds): teacher(planner) {t_rate:.2f} @ '
      f'{t_actions:.1f} actions / {t_secs:.1f} env-s vs student(MLP) '
      f'{s_rate:.2f} @ {s_actions:.1f} / {s_secs:.1f}',
      flush=True,
  )

  ship = s_rate >= 0.95 and s_actions <= 1.5 * t_actions
  if ship and os.path.isdir(spec['shipped']):
    incumbent = eval_agent_lib.EvalAgent.load(spec['shipped'])
    i_rate, i_actions, i_secs = eval_agent_on(spec['experiment'], incumbent)
    print(
        f'vs incumbent: {i_rate:.2f} @ {i_actions:.1f} / {i_secs:.1f}',
        flush=True,
    )
    ship = s_rate > i_rate + 0.02 or (
        s_rate > i_rate - 0.02 and s_actions < i_actions
    )
  if ship:
    if os.path.isdir(spec['shipped']):
      shutil.rmtree(spec['shipped'])
    shutil.copytree(spec['workdir'], spec['shipped'])
    print(f"SHIPPED: student -> {spec['shipped']}", flush=True)
  else:
    print('NOT shipped (gate failed or incumbent better)', flush=True)

  jax.clear_caches()


if __name__ == '__main__':
  main()
