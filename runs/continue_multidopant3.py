"""Gated retrain of the 3-dopant PPO policy (ship only on a win).

The shipped multi_dopant_3 checkpoint (60% goals @ 73 actions on
tiny_eval; random 0%) was the weakest artifact in the zoo — the planner
solves the same task at 100%, so the policy is budget-limited, not
task-limited. The shipped checkpoint is 'mlp'-kind (the critic was
dropped at save time), so a lossless warm start is impossible; this
retrains from scratch with a larger update budget + a fresh seed and
ships only if the candidate beats the incumbent head-to-head on a fixed
100-seed suite (same env settings as the registry's multi_dopant_3_ppo).

Win gate (evaluated on identical seeds, step_limit 300):
  - goal rate improves by > 0.02, or
  - goal rate ties (within 0.02) and actions-to-goal improves by > 5%.

Usage: python runs/continue_multidopant3.py [num_updates] [budget_s] [seed]
"""

import os
import shutil
import sys

import numpy as np

from putting_dune_tpu import eval_lib
from putting_dune_tpu.agents import ppo
from putting_dune_tpu.experiments import registry

SHIPPED = 'putting_dune_tpu/experiments/model_weights/multi_dopant_3'
WORKDIR = 'runs/multi_dopant_3_cont'
EVAL_SEEDS = list(range(100))
STEP_LIMIT = 300


def eval_checkpoint(load_dir: str) -> tuple[float, float]:
  """(goal_rate, actions_per_goal) on the fixed suite via the registry env."""
  from putting_dune_tpu.agents import eval_agent as eval_agent_lib

  exp = registry.create_multi_dopant_experiment('multi_dopant_3_ppo')
  env = exp.make_env(len(EVAL_SEEDS), step_limit=STEP_LIMIT)
  agent = eval_agent_lib.EvalAgent.load(load_dir)
  results = eval_lib.evaluate_batched(
      env, agent.policy(), EVAL_SEEDS, max_steps=STEP_LIMIT
  )
  agg = eval_lib.aggregate_results(results)
  return (
      float(agg.average_num_times_reached_goal),
      float(agg.average_num_actions_taken),
  )


def main() -> None:
  num_updates = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
  budget_s = float(sys.argv[2]) if len(sys.argv) > 2 else 4500.0
  seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7

  exp = registry.create_multi_dopant_experiment('multi_dopant_3_ppo')
  env = exp.make_env(1024)  # registry-identical training env
  config = ppo.PPOConfig(
      num_updates=num_updates,
      rollout_length=64,
      reward_shaping_coef=0.05,
  )
  agent, metrics = ppo.train_and_save(
      env,
      WORKDIR,
      config=config,
      seed=seed,
      updates_per_chunk=100,
      max_wall_seconds=budget_s,
      log_every_chunk=True,
  )
  print(
      'terminal rate last 50:',
      float(np.mean(metrics['terminal_rate'][-50:])),
      flush=True,
  )

  inc_rate, inc_actions = eval_checkpoint(SHIPPED)
  cand_rate, cand_actions = eval_checkpoint(WORKDIR)
  print(
      f'head-to-head (100 seeds, step_limit {STEP_LIMIT}): '
      f'incumbent {inc_rate:.2f} @ {inc_actions:.1f} vs '
      f'candidate {cand_rate:.2f} @ {cand_actions:.1f}',
      flush=True,
  )

  win = cand_rate > inc_rate + 0.02 or (
      cand_rate > inc_rate - 0.02 and cand_actions < 0.95 * inc_actions
  )
  if win:
    shutil.rmtree(SHIPPED)
    shutil.copytree(WORKDIR, SHIPPED)
    print(f'SHIPPED: candidate -> {SHIPPED}', flush=True)
  else:
    print('kept incumbent (no win)', flush=True)


if __name__ == '__main__':
  main()
