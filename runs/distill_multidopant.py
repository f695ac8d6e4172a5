"""Distill the multi-dopant planner into an MLP policy (gated ship).

The D-dopant planner (agents/planner.py multi_dopant_planner_policy)
solves the task with zero training (100% goals where the 3-dopant PPO
checkpoint reaches 60%); this DAgger-distills it into the same MLP head
the PPO checkpoints use, over the planner's 'vector_neighbors'
observations, and ships to
experiments/model_weights/multi_dopant_{D}_distilled on the gate:

  goal rate >= 0.95 AND actions-to-goal <= 1.5x the live planner's
  and strictly better than any existing incumbent.

Usage: python runs/distill_multidopant.py [D] [num_iterations] [batch]
       [seed] [hidden_width]
"""

import os
import shutil
import sys

import jax

from putting_dune_tpu import eval_lib
from putting_dune_tpu.agents import distill
from putting_dune_tpu.agents import eval_agent as eval_agent_lib
from putting_dune_tpu.experiments import registry

WEIGHTS = 'putting_dune_tpu/experiments/model_weights'
EVAL_SEEDS = list(range(100))
STEP_LIMIT = 300


def eval_on(num_dopants: int, policy) -> tuple[float, float]:
  exp = registry.create_multi_dopant_experiment(
      f'multi_dopant_{num_dopants}_distilled'
  )
  env = exp.make_env(len(EVAL_SEEDS), step_limit=STEP_LIMIT)
  results = eval_lib.evaluate_batched(
      env, policy, EVAL_SEEDS, max_steps=STEP_LIMIT
  )
  agg = eval_lib.aggregate_results(results)
  return (
      float(agg.average_num_times_reached_goal),
      float(agg.average_num_actions_taken),
  )


def main() -> None:
  num_dopants = int(sys.argv[1]) if len(sys.argv) > 1 else 3
  num_iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 12
  batch = int(sys.argv[3]) if len(sys.argv) > 3 else 512
  seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
  hidden = int(sys.argv[5]) if len(sys.argv) > 5 else 256
  shipped = f'{WEIGHTS}/multi_dopant_{num_dopants}_distilled'
  workdir = f'runs/multi_dopant_{num_dopants}_distilled_cand'

  planner_exp = registry.create_multi_dopant_experiment(
      f'multi_dopant_{num_dopants}_planner'
  )
  teacher_agent = planner_exp.get_agent(None, None)
  teacher = teacher_agent.policy()

  env = registry.create_multi_dopant_experiment(
      f'multi_dopant_{num_dopants}_distilled'
  ).make_env(batch)
  config = distill.DistillConfig(
      num_iterations=num_iterations,
      rollout_length=64,
      sgd_steps_per_iteration=384,
      minibatch_size=4096,
      hidden=(hidden, hidden),
      output_scale=1.0,  # 'relative' actions are [-1, 1] fractions
  )

  def progress(i, metrics):
    print(
        f'distill[md{num_dopants}] iter {i + 1}/{num_iterations}: '
        f"loss={metrics['loss']:.4f} beta={metrics['beta']:.3f}",
        flush=True,
    )

  distill.train_and_save(
      env,
      workdir,
      None,
      config=config,
      seed=seed,
      progress=progress,
      teacher=lambda obs: teacher(None, obs),
  )

  student = eval_agent_lib.EvalAgent.load(workdir)
  s_rate, s_actions = eval_on(num_dopants, student.policy())
  t_rate, t_actions = eval_on(num_dopants, teacher)
  print(
      f'head-to-head md{num_dopants} (100 seeds, step_limit {STEP_LIMIT}): '
      f'teacher(planner) {t_rate:.2f} @ {t_actions:.1f} vs student(MLP) '
      f'{s_rate:.2f} @ {s_actions:.1f}',
      flush=True,
  )

  ship = s_rate >= 0.95 and s_actions <= 1.5 * t_actions
  if ship and os.path.isdir(shipped):
    incumbent = eval_agent_lib.EvalAgent.load(shipped)
    i_rate, i_actions = eval_on(num_dopants, incumbent.policy())
    print(f'vs incumbent: {i_rate:.2f} @ {i_actions:.1f}', flush=True)
    ship = s_rate > i_rate + 0.02 or (
        s_rate > i_rate - 0.02 and s_actions < i_actions
    )
  if ship:
    if os.path.isdir(shipped):
      shutil.rmtree(shipped)
    shutil.copytree(workdir, shipped)
    print(f'SHIPPED: student -> {shipped}', flush=True)
  else:
    print('NOT shipped (gate failed or incumbent better)', flush=True)

  jax.clear_caches()


if __name__ == '__main__':
  main()
