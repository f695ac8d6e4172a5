"""Trains a PPO policy on the 2-dopant environment and ships it."""
import jax
import numpy as np

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import ppo
from putting_dune_tpu.env import multi_dopant

env = multi_dopant.MultiDopantEnv(
    lattice=lattice_lib.make_lattice(50),
    rate_fn=rates_lib.simple_canonical_rates,
    batch_size=1024,
    num_dopants=2,
    # 5 s dwell (the reference's greedy experiments' setting): at 1.5 s a
    # hop needs ~4 beam placements, which is too weak a signal for PPO to
    # bootstrap on the joint 2-goal task.
    dwell_seconds=5.0,
)
config = ppo.PPOConfig(
    num_updates=600, rollout_length=64, reward_shaping_coef=0.05
)
agent, metrics = ppo.train_and_save(
    env,
    'putting_dune_tpu/experiments/model_weights/multi_dopant_2',
    config=config,
    updates_per_chunk=100,
    log_every_chunk=True,
)
print('terminal rate last 50:',
      float(np.mean(metrics['terminal_rate'][-50:])), flush=True)
