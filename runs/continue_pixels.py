"""Pixels-policy continuation (warm start + gated re-ship).

The shipped image-observation policy (ppo_simple_images_tf: 100% goals
@ 36.8 actions under reference 512-render eval) was budget-limited, not
capacity-limited. This warm-starts PPO from the shipped actor-critic,
continues with potential shaping at render 128 (the training speed
trick; eval below is at the reference-default 512 render), and re-ships
only if goal-reaching stays >= 0.99 while actions-to-goal improves.

Usage: python runs/continue_pixels.py [budget_seconds] [lr]
"""

import json
import os
import shutil
import sys
import time

import jax

from putting_dune_tpu import eval_lib, run_helpers
from putting_dune_tpu.agents import eval_agent, ppo
from putting_dune_tpu.experiments import registry

SHIPPED = 'putting_dune_tpu/experiments/model_weights/ppo_simple_images_tf'
WORKDIR = 'runs/ppo_images_cont'
EXPERIMENT = 'relative_simple_rates_from_images'
EVAL_SEEDS = list(range(100))  # small_eval-sized, fixed head-to-head set


def eval_agent_at_512(agent) -> tuple:
  experiment = registry.create_train_experiment(EXPERIMENT)
  env = run_helpers.create_batched_env(
      experiment.get_adapters_and_goal,
      experiment.get_simulator_config,
      batch_size=len(EVAL_SEEDS),
  )
  results = eval_lib.evaluate_batched(env, agent.policy(), EVAL_SEEDS)
  agg = eval_lib.aggregate_results(results)
  return (
      agg.average_num_times_reached_goal, agg.average_num_actions_taken
  )


def main() -> None:
  budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 9000.0
  lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4

  inc_goals, inc_actions = eval_agent_at_512(eval_agent.EvalAgent.load(SHIPPED))
  print(
      f'incumbent: goals={inc_goals:.3f} actions={inc_actions:.1f}',
      flush=True,
  )

  experiment = registry.create_train_experiment(EXPERIMENT)
  env = run_helpers.create_batched_env(
      experiment.get_adapters_and_goal,
      experiment.get_simulator_config,
      batch_size=256,
      image_size=128,
  )
  config = ppo.PPOConfig(
      num_updates=100000,  # wall budget is the real stop
      rollout_length=16,
      learning_rate=lr,
      reward_shaping_coef=0.05,
  )
  os.makedirs(WORKDIR, exist_ok=True)
  agent, _ = ppo.train_and_save(
      env,
      os.path.join(WORKDIR, 'policy'),
      config=config,
      seed=17,
      updates_per_chunk=200,
      max_wall_seconds=budget_s,
      log_every_chunk=True,
      init_params_from=SHIPPED,
  )

  cand_goals, cand_actions = eval_agent_at_512(agent)
  print(
      f'candidate: goals={cand_goals:.3f} actions={cand_actions:.1f}',
      flush=True,
  )

  if cand_goals < min(0.99, inc_goals) or cand_actions >= inc_actions:
    print('gate failed; keeping the shipped policy', flush=True)
    return

  for name in os.listdir(os.path.join(WORKDIR, 'policy')):
    shutil.copy2(
        os.path.join(WORKDIR, 'policy', name), os.path.join(SHIPPED, name)
    )
  with open(os.path.join(SHIPPED, 'eval.json'), 'w') as f:
    json.dump(
        {
            'success_rate': cand_goals,
            'avg_actions': cand_actions,
            'eval': '512-render, 100 fixed seeds, batched evaluator',
        },
        f,
    )
  print(
      f'shipped {SHIPPED} (goals {cand_goals:.3f} vs {inc_goals:.3f}, '
      f'actions {cand_actions:.1f} vs {inc_actions:.1f})',
      flush=True,
  )


if __name__ == '__main__':
  main()
