"""PPO training CLI.

Trains a policy on a named train experiment (experiments/registry.py) with
the fully-jitted on-device PPO trainer and saves an EvalAgent checkpoint
loadable by the registry's PolicyCheckpointAgent.

  python -m putting_dune_tpu.agents.train_ppo \
      --train_experiment=relative_simple_rates --workdir=/tmp/ppo \
      --num_updates=300 --batch_size=1024
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--train_experiment', default='relative_simple_rates')
  parser.add_argument('--workdir', required=True)
  parser.add_argument('--batch_size', type=int, default=1024)
  parser.add_argument('--num_updates', type=int, default=300)
  parser.add_argument('--rollout_length', type=int, default=64)
  parser.add_argument('--learning_rate', type=float, default=3e-4)
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--eval_suite', default='small_eval')
  parser.add_argument(
      '--updates_per_chunk', type=int, default=None,
      help='Chunked training: save a rolling checkpoint every N updates.',
  )
  parser.add_argument(
      '--max_wall_seconds', type=float, default=None,
      help='Stop after this much wall time (chunked mode only).',
  )
  parser.add_argument(
      '--reward_shaping', type=float, default=0.0,
      help='Potential-based shaping coefficient (0 = off). Training-time '
      'only; eval uses the true sparse reward.',
  )
  parser.add_argument(
      '--render_size', type=int, default=None,
      help='Rendered STEM frame resolution for image envs (default 512; '
      'training pixel policies at 256 or 128 is much faster).',
  )
  parser.add_argument(
      '--init_params_from', default=None,
      help='Warm-start from a saved actor_critic EvalAgent checkpoint '
      'dir (continuation runs for image policies).',
  )
  parser.add_argument(
      '--mesh', default='',
      help="Data-parallel device mesh: 'data' (all devices) or 'data:N'. "
      'Shards the env batch (and eval seeds) over the mesh; params stay '
      'replicated. Empty = single-device program.',
  )
  args = parser.parse_args()

  import jax

  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import run_helpers
  from putting_dune_tpu.agents import ppo
  from putting_dune_tpu.experiments import registry
  from putting_dune_tpu.parallel import mesh as mesh_lib

  mesh = mesh_lib.parse_mesh_spec(args.mesh)

  experiment = registry.create_train_experiment(args.train_experiment)
  env = run_helpers.create_batched_env(
      experiment.get_adapters_and_goal,
      experiment.get_simulator_config,
      batch_size=args.batch_size,
      image_size=args.render_size,
  )
  config = ppo.PPOConfig(
      num_updates=args.num_updates,
      rollout_length=args.rollout_length,
      learning_rate=args.learning_rate,
      reward_shaping_coef=args.reward_shaping,
  )
  os.makedirs(args.workdir, exist_ok=True)
  agent, metrics = ppo.train_and_save(
      env, os.path.join(args.workdir, 'policy'), config=config,
      seed=args.seed,
      updates_per_chunk=args.updates_per_chunk,
      max_wall_seconds=args.max_wall_seconds,
      log_every_chunk=args.updates_per_chunk is not None,
      init_params_from=args.init_params_from,
      mesh=mesh,
  )
  np.savez_compressed(
      os.path.join(args.workdir, 'train_metrics.npz'), **metrics
  )
  print(
      'terminal rate first/last 10 updates:',
      float(metrics['terminal_rate'][:10].mean()),
      float(metrics['terminal_rate'][-10:].mean()),
  )

  if args.eval_suite:
    seeds = eval_lib.EVAL_SUITES[args.eval_suite]
    eval_env = run_helpers.create_batched_env(
        experiment.get_adapters_and_goal,
        experiment.get_simulator_config,
        batch_size=len(seeds),
    )
    results = eval_lib.evaluate_batched(
        eval_env, agent.policy(), seeds, mesh=mesh
    )
    aggregate = eval_lib.aggregate_results(results)
    summary = {
        'success_rate': aggregate.average_num_times_reached_goal,
        'avg_actions': aggregate.average_num_actions_taken,
        'avg_total_reward': aggregate.average_total_reward,
    }
    print('eval:', json.dumps(summary))
    with open(os.path.join(args.workdir, 'eval.json'), 'w') as f:
      json.dump(summary, f)


if __name__ == '__main__':
  main()
