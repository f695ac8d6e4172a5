"""Standalone evaluation CLI.

Parity: /root/reference/putting_dune/eval.py:31-91. Usage:

  python -m putting_dune_tpu.eval \
      --experiment_name=relative_random_simple --eval_suite=tiny_eval

Adds a --batched flag (default on): run the whole suite as one on-device
batch (orders of magnitude faster); --nobatched reproduces the reference's
per-seed host loop with exact wall-clock timeout semantics.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Args:
  experiment_name: str
  eval_suite: str = 'tiny_eval'
  batched: bool = True
  video_save_dir: Optional[str] = None
  output_json: Optional[str] = None
  step_limit: int = 600
  seed: int = 0
  # Data-parallel mesh spec for batched eval: '' (single-device), 'data'
  # (all devices) or 'data:N' — shards the suite's env batch over chips.
  mesh: str = ''


def main(args: Args) -> 'object':
  import jax

  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import run_helpers
  from putting_dune_tpu.experiments import registry

  seeds = eval_lib.EVAL_SUITES[args.eval_suite]

  if args.mesh and not args.batched:
    # The per-seed host loop is inherently single-device; silently
    # dropping --mesh would let the user believe the suite was sharded.
    raise ValueError('--mesh requires batched evaluation (drop --nobatched).')

  if args.experiment_name in registry.multi_dopant_experiment_names():
    return _eval_multi_dopant(args, seeds)

  experiment = registry.create_eval_experiment(args.experiment_name)

  rng = np.random.default_rng(args.seed)
  adapters_and_goal = experiment.get_adapters_and_goal()
  agent = experiment.get_agent(rng, adapters_and_goal)

  if args.batched:
    env = run_helpers.create_batched_env(
        experiment.get_adapters_and_goal,
        experiment.get_simulator_config,
        batch_size=len(seeds),
        step_limit=args.step_limit,
    )
    policy = _policy_for_agent(agent, env)
    results = eval_lib.evaluate_batched(
        env, policy, seeds, video_save_dir=args.video_save_dir,
        mesh=_mesh_for(args),
    )
  else:
    env = run_helpers.create_putting_dune_env(
        args.seed,
        experiment.get_adapters_and_goal,
        experiment.get_simulator_config,
        simulator_step_limit=args.step_limit,
    )
    results = eval_lib.evaluate(
        agent, env, seeds, video_save_dir=args.video_save_dir
    )

  return _report(args, results)


def _mesh_for(args: Args):
  from putting_dune_tpu.parallel import mesh as mesh_lib

  return mesh_lib.parse_mesh_spec(args.mesh)


def _display(value):
  """NaN timing fields (e.g. batched agent wall-clock) render as 'n/a'."""
  if isinstance(value, float) and np.isnan(value):
    return 'n/a'
  return value


def _json_safe(obj):
  """Replaces NaN floats with None so the payload is strict JSON."""
  if isinstance(obj, dict):
    return {k: _json_safe(v) for k, v in obj.items()}
  if isinstance(obj, (list, tuple)):
    return [_json_safe(v) for v in obj]
  if isinstance(obj, float) and np.isnan(obj):
    return None
  return obj


def _report(args: Args, results):
  """Aggregates, logs, and optionally serializes eval results."""
  from putting_dune_tpu import eval_lib

  aggregate = eval_lib.aggregate_results(results)
  logging.info('Aggregate results:')
  for field in dataclasses.fields(aggregate):
    logging.info('  %s: %s', field.name,
                 _display(getattr(aggregate, field.name)))

  if args.output_json:
    payload = _json_safe({
        'experiment': args.experiment_name,
        'suite': args.eval_suite,
        'aggregate': dataclasses.asdict(aggregate),
        'results': [dataclasses.asdict(r) for r in results],
    })
    os.makedirs(os.path.dirname(args.output_json) or '.', exist_ok=True)
    with open(args.output_json, 'w') as f:
      json.dump(payload, f, allow_nan=False)
  return aggregate


def _eval_multi_dopant(args: Args, seeds):
  """Evaluates a D-dopant experiment (beyond-parity extension) batched."""
  import jax
  import jax.numpy as jnp

  from putting_dune_tpu import eval_lib
  from putting_dune_tpu.experiments import registry

  experiment = registry.create_multi_dopant_experiment(args.experiment_name)
  env = experiment.make_env(len(seeds), step_limit=args.step_limit)

  if experiment.get_agent is not None:
    agent = experiment.get_agent(None, None)
    policy = agent.policy()
  else:
    spec = env.action_spec()

    def policy(key, obs):
      batch = jax.tree_util.tree_leaves(obs)[0].shape[0]
      return jax.random.uniform(
          key,
          (batch,) + tuple(spec.shape),
          minval=jnp.asarray(spec.minimum),
          maxval=jnp.asarray(spec.maximum),
      )

  results = eval_lib.evaluate_batched(
      env, policy, seeds, video_save_dir=args.video_save_dir,
      mesh=_mesh_for(args),
  )
  return _report(args, results)


def _policy_for_agent(agent, env):
  """Extracts/builds a batched pure policy from a host agent."""
  import functools
  import jax.numpy as jnp
  import jax

  from putting_dune_tpu.agents import agent_lib
  from putting_dune_tpu.agents import drift_correction as drift_lib
  from putting_dune_tpu.agents import eval_agent as eval_agent_lib
  from putting_dune_tpu.agents import planner as planner_lib
  from putting_dune_tpu.agents import vision_planner as vision_planner_lib

  if isinstance(agent, eval_agent_lib.EvalAgent):
    return agent.policy()
  if isinstance(
      agent,
      (
          planner_lib.PlannerAgent,
          vision_planner_lib.VisionPlannerAgent,
          drift_lib.DriftCorrectedVisionPlannerAgent,
      ),
  ):
    return agent.policy()
  if isinstance(agent, agent_lib.GreedyAgent):
    return functools.partial(
        _greedy_batched,
        argmax=tuple(np.asarray(agent._argmax).tolist()),  # pylint: disable=protected-access
        sigma=agent._position_noise_sigma,  # pylint: disable=protected-access
    )
  # Uniform random fallback matching the action spec.
  spec = env.action_spec()

  def random_policy(key, obs):
    batch = jax.tree_util.tree_leaves(obs)[0].shape[0]
    return jax.random.uniform(
        key,
        (batch,) + tuple(spec.shape),
        minval=jnp.asarray(spec.minimum),
        maxval=jnp.asarray(spec.maximum),
    )

  return random_policy


def _greedy_batched(key, obs, argmax, sigma):
  from putting_dune_tpu.agents import agent_lib

  return agent_lib.greedy_policy(
      key, obs, argmax=argmax, position_noise_sigma=sigma
  )


def _parse_args() -> Args:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--experiment_name', required=True)
  parser.add_argument('--eval_suite', default='tiny_eval')
  parser.add_argument(
      '--batched', action=argparse.BooleanOptionalAction, default=True
  )
  parser.add_argument('--video_save_dir', default=None)
  parser.add_argument('--output_json', default=None)
  parser.add_argument('--step_limit', type=int, default=600)
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument(
      '--mesh', default='',
      help="Shard the batched suite over a device mesh: 'data' or 'data:N'.",
  )
  return Args(**vars(parser.parse_args()))


def cli() -> None:
  """Console entry point (`putting-dune-tpu-eval`)."""
  logging.basicConfig(level=logging.INFO)
  main(_parse_args())


if __name__ == '__main__':
  cli()
