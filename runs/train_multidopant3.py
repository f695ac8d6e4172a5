"""Trains and ships a PPO policy on the 3-dopant environment.

Extends the shipped 2-dopant policy (runs/train_multidopant.py) to three
silicon dopants — a harder joint-goal task (the relative action mode
steers the first unlatched dopant; the other two drift under beam
spillover until it latches). Registers nothing: the registry entry
`multi_dopant_3_ppo` is added separately once the policy clears the
random baseline by a wide margin.

Usage: python runs/train_multidopant3.py [num_updates] [budget_seconds]
"""

import sys

import numpy as np

from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import ppo
from putting_dune_tpu.env import multi_dopant

num_updates = int(sys.argv[1]) if len(sys.argv) > 1 else 900
budget_s = float(sys.argv[2]) if len(sys.argv) > 2 else 3000.0

env = multi_dopant.MultiDopantEnv(
    lattice=lattice_lib.make_lattice(50),
    rate_fn=rates_lib.simple_canonical_rates,
    batch_size=1024,
    num_dopants=3,
    dwell_seconds=5.0,
)
config = ppo.PPOConfig(
    num_updates=num_updates,
    rollout_length=64,
    reward_shaping_coef=0.05,
)
agent, metrics = ppo.train_and_save(
    env,
    'putting_dune_tpu/experiments/model_weights/multi_dopant_3',
    config=config,
    updates_per_chunk=100,
    max_wall_seconds=budget_s,
    log_every_chunk=True,
)
print('terminal rate last 50:',
      float(np.mean(metrics['terminal_rate'][-50:])), flush=True)
