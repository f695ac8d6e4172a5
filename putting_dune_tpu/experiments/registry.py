"""Named-experiment registry.

Parity: /root/reference/putting_dune/experiments/registry.py:262-496 — same
experiment names, same adapter/dwell/goal compositions, same simulator rate
configurations. Divergence (documented): the reference's `ppo_*` agents are
TF SavedModels downloaded from GCS (registry.py:71-164); this framework is
native JAX and zero-egress, so those names resolve through
PolicyCheckpointAgent, which loads a locally saved policy checkpoint
(putting_dune_tpu format) from `model_weights/<name>` and raises a clear
error if the weights are not present.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import rates as rates_lib
from putting_dune_tpu.agents import agent_lib
from putting_dune_tpu.env import action_adapters
from putting_dune_tpu.env import features as features_lib
from putting_dune_tpu.experiments import experiments

BOND = constants.CARBON_BOND_DISTANCE_ANGSTROMS


# -------------------- agents --------------------


def _get_relative_random_agent(rng, adapters_and_goal):
  spec = adapters_and_goal.action_adapter.spec()
  return agent_lib.UniformRandomAgent(
      rng, spec.minimum, spec.maximum, spec.shape
  )


def _get_greedy_agent(
    rng,
    adapters_and_goal,
    argmax=np.asarray([1.42, 0.0]),
    transition_function=None,
    fixed_offset=np.zeros(2),
):
  spec = adapters_and_goal.action_adapter.spec()
  low = spec.minimum if np.isscalar(spec.minimum) else spec.minimum[0]
  high = spec.maximum if np.isscalar(spec.maximum) else spec.maximum[0]
  return agent_lib.GreedyAgent(
      rng=rng,
      argmax=argmax,
      transition_function=transition_function,
      fixed_offset=fixed_offset,
      low=low,
      high=high,
  )


def _get_planner_agent(
    rng,
    adapters_and_goal,
    rate_fn=None,
    lookahead_discount: float = 0.0,
    dwell_objective: str = 'per_second',
):
  """Rate-aware planning controller (beyond-parity; agents/planner.py).

  The dwell passed to the planner must match the adapter's so the
  first-transition probabilities it optimizes are the ones the simulator
  will realize.
  """
  del rng
  from putting_dune_tpu.agents import planner as planner_lib

  adapter = adapters_and_goal.action_adapter
  dwell_range = None
  if adapter.max_dwell_seconds > adapter.min_dwell_seconds:
    # Variable-dwell adapter: the planner optimizes the dwell too, over
    # the adapter's exact range (so the emitted fraction maps back).
    dwell_range = (
        float(adapter.min_dwell_seconds),
        float(adapter.max_dwell_seconds),
    )
  return planner_lib.PlannerAgent(
      rate_fn=rate_fn if rate_fn is not None else rates_lib.prior_rates,
      dwell_seconds=float(adapter.min_dwell_seconds),
      lookahead_discount=lookahead_discount,
      dwell_range_seconds=dwell_range,
      dwell_objective=dwell_objective,
  )


def _get_vision_planner_agent(rng, adapters_and_goal, rate_fn=None):
  """Vision planner: shipped detector -> lattice geometry -> planner
  (agents/vision_planner.py) — the full pixels-to-control loop with zero
  policy learning. rate_fn='learned' plans with the SHIPPED distilled
  neural rate model, composing both shipped learned artifacts."""
  del rng
  from putting_dune_tpu.agents import vision_planner as vp

  if rate_fn == 'learned':
    rate_fn = _load_shipped_rate_fn()
  adapter = adapters_and_goal.action_adapter
  return vp.VisionPlannerAgent(
      rate_fn=(
          rate_fn if rate_fn is not None else rates_lib.simple_canonical_rates
      ),
      dwell_seconds=float(adapter.min_dwell_seconds),
      max_distance_angstroms=float(adapter.max_distance_angstroms),
  )


def _get_drift_corrected_vision_planner_agent(rng, adapters_and_goal):
  """Vision planner wrapped with in-loop phase-correlation drift
  correction (agents/drift_correction.py) — the BASELINE stress-config
  loop: drifting microscope -> pixels -> shipped UNet -> geometry ->
  drift estimate -> rate-aware planner."""
  del rng
  from putting_dune_tpu.agents import drift_correction as dc

  adapter = adapters_and_goal.action_adapter
  return dc.DriftCorrectedVisionPlannerAgent(
      rate_fn=rates_lib.simple_canonical_rates,
      dwell_seconds=float(adapter.min_dwell_seconds),
      max_distance_angstroms=float(adapter.max_distance_angstroms),
  )


def _load_shipped_rate_fn():
  """Loads the SHIPPED distilled neural rate model as a RateFunction.

  Raises if the rate_predictor artifact is absent.
  """
  import jax

  from putting_dune_tpu.rate_learning import config as rl_config
  from putting_dune_tpu.rate_learning import predictor as predictor_lib

  workdir = os.path.join(
      os.path.dirname(__file__), 'model_weights', 'rate_predictor'
  )
  if not os.path.isdir(workdir):
    raise FileNotFoundError(
        f'No shipped rate predictor at {workdir}; train one with '
        'pipeline/train_rate_learner or runs/rate_loop_production.py.'
    )
  predictor = predictor_lib.LearnedRatePredictor(
      init_key=jax.random.PRNGKey(0),
      config=rl_config.RateLearningConfig(beam_units='angstroms'),
  )
  predictor.load(workdir)
  return predictor.as_rate_function()


def _get_learned_planner_agent(rng, adapters_and_goal):
  """Planner over the SHIPPED distilled neural rate model: the full
  model-based loop (simulate -> learn rates -> plan with the learned
  model)."""
  del rng
  from putting_dune_tpu.agents import planner as planner_lib

  adapter = adapters_and_goal.action_adapter
  return planner_lib.PlannerAgent(
      rate_fn=_load_shipped_rate_fn(),
      dwell_seconds=float(adapter.min_dwell_seconds),
  )


@dataclasses.dataclass(frozen=True)
class PolicyCheckpointAgent:
  """Loads a locally saved eval policy (native replacement for TF agents)."""

  model_name: str
  weights_dir: Optional[str] = None

  def __call__(self, rng, adapters_and_goal):
    del rng, adapters_and_goal
    base = self.weights_dir or os.path.join(
        os.path.dirname(__file__), 'model_weights'
    )
    path = os.path.join(base, self.model_name)
    if not os.path.isdir(path):
      raise FileNotFoundError(
          f'No local policy checkpoint at {path}. The reference downloads '
          'TF SavedModels from GCS; this framework is zero-egress and '
          'native JAX — train a policy and save it there, or use a '
          'greedy/random experiment.'
      )
    from putting_dune_tpu.agents import eval_agent

    return eval_agent.EvalAgent.load(path)


# -------------------- adapters & goals --------------------


@dataclasses.dataclass(frozen=True)
class _SingleSiliconGoalReaching:
  """Microscope-frame relative adapter + 10-dim features (ref :172-188)."""

  min_dwell_seconds: float = 1.5
  max_dwell_seconds: float = 1.5
  max_distance_angstroms: float = BOND

  def __call__(self) -> experiments.AdaptersAndGoal:
    return experiments.AdaptersAndGoal(
        action_adapter=action_adapters.RelativeToSiliconActionAdapter(
            min_dwell_seconds=self.min_dwell_seconds,
            max_dwell_seconds=self.max_dwell_seconds,
            max_distance_angstroms=self.max_distance_angstroms,
        ),
        feature_constructor=(
            features_lib.SingleSiliconPristineGrapheneFeatures()
        ),
    )


@dataclasses.dataclass(frozen=True)
class _SingleSiliconGoalReachingMaterialFrame:
  """Material-frame adapter + material-frame features (ref :191-208)."""

  min_dwell_seconds: float = 1.5
  max_dwell_seconds: float = 1.5
  max_distance_angstroms: float = BOND * 2.0

  def __call__(self) -> experiments.AdaptersAndGoal:
    return experiments.AdaptersAndGoal(
        action_adapter=(
            action_adapters.RelativeToSiliconMaterialFrameActionAdapter(
                min_dwell_seconds=self.min_dwell_seconds,
                max_dwell_seconds=self.max_dwell_seconds,
                max_distance_angstroms=self.max_distance_angstroms,
            )
        ),
        feature_constructor=(
            features_lib.SingleSiliconMaterialFrameFeatures()
        ),
    )


@dataclasses.dataclass(frozen=True)
class _SingleSiliconGoalReachingFromPixels:
  """Relative adapter + image features (reference :211-226)."""

  min_dwell_seconds: float = 1.5
  max_dwell_seconds: float = 1.5
  max_distance_angstroms: float = BOND
  image_size: int = 128
  include_fov: bool = False

  def __call__(self) -> experiments.AdaptersAndGoal:
    return experiments.AdaptersAndGoal(
        action_adapter=action_adapters.RelativeToSiliconActionAdapter(
            min_dwell_seconds=self.min_dwell_seconds,
            max_dwell_seconds=self.max_dwell_seconds,
            max_distance_angstroms=self.max_distance_angstroms,
        ),
        feature_constructor=features_lib.ImageFeatures(
            image_size=self.image_size, include_fov=self.include_fov
        ),
    )


def _get_direct_goal_reaching_from_pixels() -> experiments.AdaptersAndGoal:
  return experiments.AdaptersAndGoal(
      action_adapter=action_adapters.DirectActionAdapter(),
      feature_constructor=features_lib.ImageFeatures(),
  )


# -------------------- simulator specs --------------------


def _get_simple_rates_config() -> experiments.SimulatorSpec:
  return experiments.SimulatorSpec(
      rate_fn=rates_lib.simple_canonical_rates, image_duration_seconds=2.0
  )


def _get_human_prior_rates_config() -> experiments.SimulatorSpec:
  return experiments.SimulatorSpec(
      rate_fn=rates_lib.prior_rates, image_duration_seconds=2.0
  )


def _get_simple_rates_drift_config() -> experiments.SimulatorSpec:
  """Stress config: simple rates + cumulative instrument drift.

  0.5 A per frame per axis keeps the worst-case per-step increment
  (0.71 A diagonal) below half the graphene Bravais constant, so the
  in-loop phase-correlation corrector's search window can exclude
  lattice-alias peaks (agents/drift_correction.py)."""
  return experiments.SimulatorSpec(
      rate_fn=rates_lib.simple_canonical_rates,
      image_duration_seconds=2.0,
      drift_per_frame_angstroms=0.5,
  )


def _get_aligned_prior_rates_config() -> experiments.SimulatorSpec:
  return experiments.SimulatorSpec(
      rate_fn=rates_lib.prior_rates_aligned, image_duration_seconds=2.0
  )


def _get_prior_rates_config_with_duration(
    image_duration_seconds: float,
) -> experiments.SimulatorSpec:
  return experiments.SimulatorSpec(
      rate_fn=rates_lib.prior_rates,
      image_duration_seconds=image_duration_seconds,
  )


_GREEDY_MATERIAL_FRAME_5S = functools.partial(
    _SingleSiliconGoalReachingMaterialFrame,
    min_dwell_seconds=5.0,
    max_dwell_seconds=5.0,
    max_distance_angstroms=2 * BOND,
)


# -------------------- registries --------------------

_MICROSCOPE_EXPERIMENTS = {
    'relative_random': experiments.MicroscopeExperiment(
        get_agent=_get_relative_random_agent,
        get_adapters_and_goal=_SingleSiliconGoalReaching(),
    ),
    'relative_random_long': experiments.MicroscopeExperiment(
        get_agent=_get_relative_random_agent,
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.0,
            max_dwell_seconds=5.0,
            max_distance_angstroms=2 * BOND,
        ),
    ),
    'relative_random_extra_long': experiments.MicroscopeExperiment(
        get_agent=_get_relative_random_agent,
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.0,
            max_dwell_seconds=5.0,
            max_distance_angstroms=3 * BOND,
        ),
    ),
    'greedy_on_neighbor': experiments.MicroscopeExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([1.42, 0.0])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
    ),
    'greedy_short_of_neighbor': experiments.MicroscopeExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([0.58, 0.0])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
    ),
    'greedy_on_neighbor_offset_horizontally': experiments.MicroscopeExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([1.42, 0.42])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
    ),
    'greedy_from_learned_rates_v3': experiments.MicroscopeExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([1.8686869, 0.0])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
    ),
    'greedy_from_learned_rates_v5': experiments.MicroscopeExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([2.1717172, -0.15151516])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
    ),
    # Native addition: the rate-aware planner as a microscope experiment —
    # on real hardware the planning model is the LEARNED rate predictor
    # (the reference's analogue is a greedy agent with an offline
    # grid-searched argmax of the learned transition function).
    'planner_learned_rates': experiments.MicroscopeExperiment(
        get_agent=_get_learned_planner_agent,
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
    ),
    'ppo_simple_images_tf': experiments.MicroscopeExperiment(
        get_agent=PolicyCheckpointAgent('ppo_simple_images_tf'),
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(),
    ),
    'ppo_learned_tf_2s': experiments.MicroscopeExperiment(
        get_agent=PolicyCheckpointAgent('230127_from_state_2s'),
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.0, max_dwell_seconds=10.0
        ),
    ),
    'ppo_learned_tf_3s': experiments.MicroscopeExperiment(
        get_agent=PolicyCheckpointAgent('230127_from_state_3s'),
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.0, max_dwell_seconds=10.0
        ),
    ),
    'ppo_learned_tf_4s': experiments.MicroscopeExperiment(
        get_agent=PolicyCheckpointAgent('230127_from_state_4s'),
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.0, max_dwell_seconds=10.0
        ),
    ),
    'ppo_v3_2s': experiments.MicroscopeExperiment(
        get_agent=PolicyCheckpointAgent('230422_ppo_v3_2s'),
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=3 * BOND,
        ),
    ),
    'ppo_v3_3s': experiments.MicroscopeExperiment(
        get_agent=PolicyCheckpointAgent('230422_ppo_v3_3s'),
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=3 * BOND,
        ),
    ),
    'ppo_v3_4s': experiments.MicroscopeExperiment(
        get_agent=PolicyCheckpointAgent('230422_ppo_v3_4s'),
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=3 * BOND,
        ),
    ),
}

_TRAIN_EXPERIMENTS = {
    'relative_simple_rates': experiments.TrainExperiment(
        get_adapters_and_goal=_SingleSiliconGoalReaching(),
        get_simulator_config=_get_simple_rates_config,
    ),
    'relative_prior_rates': experiments.TrainExperiment(
        get_adapters_and_goal=_SingleSiliconGoalReaching(),
        get_simulator_config=_get_human_prior_rates_config,
    ),
    # Stress-config training: the same vector task on a drifting
    # microscope (0.5 A/frame cumulative) — the goal vector goes stale
    # over the episode, so the policy must learn drift-robust behavior
    # (finish fast / re-acquire) without ever observing the drift.
    'relative_simple_rates_drift': experiments.TrainExperiment(
        get_adapters_and_goal=_SingleSiliconGoalReaching(),
        get_simulator_config=_get_simple_rates_drift_config,
    ),
    'relative_simple_rates_from_images': experiments.TrainExperiment(
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(),
        get_simulator_config=_get_simple_rates_config,
    ),
    'relative_simple_rates_from_images_variable_time': (
        experiments.TrainExperiment(
            get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(
                min_dwell_seconds=1.0, max_dwell_seconds=10.0
            ),
            get_simulator_config=_get_simple_rates_config,
        )
    ),
    'direct_simple_rates_from_images': experiments.TrainExperiment(
        get_adapters_and_goal=_get_direct_goal_reaching_from_pixels,
        get_simulator_config=_get_simple_rates_config,
    ),
}

# Native additions: train counterparts for the reference's externally
# trained checkpoint agents (reference registry.py:352-416 only SHIPS the
# TF SavedModels; the training configs were never released). Adapters,
# goals, and image durations (the Ns suffix) mirror the corresponding
# microscope experiments; the human-prior rate function stands in for the
# unreleased learned-rate simulators.
_TRAIN_EXPERIMENTS.update({
    f'ppo_learned_{n}s': experiments.TrainExperiment(
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.0, max_dwell_seconds=10.0
        ),
        get_simulator_config=functools.partial(
            _get_prior_rates_config_with_duration, float(n)
        ),
    )
    for n in (2, 3, 4)
})
_TRAIN_EXPERIMENTS.update({
    f'ppo_v3_{n}s': experiments.TrainExperiment(
        get_adapters_and_goal=_SingleSiliconGoalReaching(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=3 * BOND,
        ),
        get_simulator_config=functools.partial(
            _get_prior_rates_config_with_duration, float(n)
        ),
    )
    for n in (2, 3, 4)
})

_EVAL_EXPERIMENTS = {
    'relative_random_simple': experiments.EvalExperiment(
        get_agent=_get_relative_random_agent,
        get_adapters_and_goal=_SingleSiliconGoalReaching(),
        get_simulator_config=_get_simple_rates_config,
    ),
    'relative_random_prior_rates': experiments.EvalExperiment(
        get_agent=_get_relative_random_agent,
        get_adapters_and_goal=_SingleSiliconGoalReaching(),
        get_simulator_config=_get_human_prior_rates_config,
    ),
    'ppo_simple_images_tf': experiments.EvalExperiment(
        get_agent=PolicyCheckpointAgent('ppo_simple_images_tf'),
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(),
        get_simulator_config=_get_simple_rates_config,
    ),
    # Native addition: the reference 'greedy_on_neighbor' combination as an
    # eval experiment (its canonical working controller).
    'greedy_simple_rates': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([1.42, 0.0])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_simple_rates_config,
    ),
    # Native additions: the rate-aware planning controller
    # (agents/planner.py) under each rate law, plus greedy baselines on
    # the same adapters for head-to-head comparison.
    'planner_simple_rates': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_planner_agent, rate_fn=rates_lib.simple_canonical_rates
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_simple_rates_config,
    ),
    # Vector-feature baselines under instrument drift: neighbor deltas are
    # translation-invariant so only the recorded goal vector goes stale —
    # the drop vs planner_simple_rates measures exactly that. ppo_simple
    # _drift (below, when shipped) is the TRAINED-under-drift comparison.
    'planner_simple_drift': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_planner_agent, rate_fn=rates_lib.simple_canonical_rates
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_simple_rates_drift_config,
    ),
    # Same adapters/features as its TRAIN experiment
    # (relative_simple_rates_drift); compare against eval_ppo_simple's
    # no-drift numbers, not planner_simple_drift (different dwell).
    'ppo_simple_drift': experiments.EvalExperiment(
        get_agent=PolicyCheckpointAgent('ppo_simple_drift'),
        get_adapters_and_goal=_SingleSiliconGoalReaching(),
        get_simulator_config=_get_simple_rates_drift_config,
    ),
    'planner_prior_rates': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_planner_agent, rate_fn=rates_lib.prior_rates
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_human_prior_rates_config,
    ),
    'greedy_prior_rates': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([1.42, 0.0])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_human_prior_rates_config,
    ),
    # Model-based control with the LEARNED dynamics model: the simulator
    # runs the physically-intended aligned prior, the planner plans with
    # the shipped distilled neural predictor trained on data simulated
    # from that law (runs/rate_loop_production.py).
    'planner_learned_rates': experiments.EvalExperiment(
        get_agent=_get_learned_planner_agent,
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_aligned_prior_rates_config,
    ),
    # Variable-dwell planning: the planner also picks the dwell time each
    # step, maximizing expected progress PER SIMULATED SECOND (the clock
    # the terminal reward discounts), emitting the 3rd action dim.
    'planner_prior_rates_variable_time': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_planner_agent, rate_fn=rates_lib.prior_rates
        ),
        get_adapters_and_goal=_SingleSiliconGoalReachingMaterialFrame(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=2 * BOND,
        ),
        get_simulator_config=_get_human_prior_rates_config,
    ),
    # Variable dwell UNDER DRIFT: drift accumulates per FRAME, so longer
    # dwells buy more KMC progress per unit of accumulated drift — a
    # physics-level mitigation that needs no vision (compare against
    # planner_simple_drift's fixed 5 s dwell).
    'planner_simple_drift_variable_time': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_planner_agent, rate_fn=rates_lib.simple_canonical_rates
        ),
        get_adapters_and_goal=_SingleSiliconGoalReachingMaterialFrame(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=2 * BOND,
        ),
        get_simulator_config=_get_simple_rates_drift_config,
    ),
    # The drift-aware dwell objective: progress per FRAME (each frame
    # costs one drift increment regardless of dwell), with an explicit
    # Poisson overshoot penalty for post-first transitions — fixes the
    # per-second objective's preference for short dwells under drift.
    'planner_simple_drift_frame_dwell': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_planner_agent,
            rate_fn=rates_lib.simple_canonical_rates,
            dwell_objective='per_frame',
        ),
        get_adapters_and_goal=_SingleSiliconGoalReachingMaterialFrame(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=2 * BOND,
        ),
        get_simulator_config=_get_simple_rates_drift_config,
    ),
    # The planner DISTILLED into a feed-forward MLP (agents/distill.py,
    # DAgger): planner-level control at the reference's TF-eval-agent
    # inference cost (one MLP apply per step, agents/tf_eval_agent.py:23-32).
    # Checkpoint shipped by runs/distill_planner.py on a head-to-head win.
    'planner_distilled_prior': experiments.EvalExperiment(
        get_agent=PolicyCheckpointAgent('planner_distilled_prior'),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_human_prior_rates_config,
    ),
    # Variable-dwell variant: the dwell-optimizing planner (best
    # time-efficiency controller) distilled into the same MLP; 3rd
    # action dim is the dwell fraction.
    'planner_distilled_prior_variable_time': experiments.EvalExperiment(
        get_agent=PolicyCheckpointAgent(
            'planner_distilled_prior_variable_time'
        ),
        get_adapters_and_goal=_SingleSiliconGoalReachingMaterialFrame(
            min_dwell_seconds=1.5,
            max_dwell_seconds=20.0,
            max_distance_angstroms=2 * BOND,
        ),
        get_simulator_config=_get_human_prior_rates_config,
    ),
    'greedy_aligned_prior_rates': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_greedy_agent, argmax=np.array([1.42, 0.0])
        ),
        get_adapters_and_goal=_GREEDY_MATERIAL_FRAME_5S(),
        get_simulator_config=_get_aligned_prior_rates_config,
    ),
    # Full pixels-to-control loop with zero policy learning: shipped
    # UNet detector -> jittable lattice-geometry recovery -> rate-aware
    # planner. Image features at 256^2, the detector's training size
    # (dwell 5 s like the other planner experiments: fewer, more
    # decisive actions).
    'vision_planner_simple_rates': experiments.EvalExperiment(
        get_agent=_get_vision_planner_agent,
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(
            min_dwell_seconds=5.0,
            max_dwell_seconds=5.0,
            max_distance_angstroms=2 * BOND,
            image_size=256,
        ),
        get_simulator_config=_get_simple_rates_config,
    ),
    # Vision planner under the sharp aligned-prior law with the ANALYTIC
    # model: isolates perception error from learned-model error in the
    # vision_planner_learned_rates composition below.
    'vision_planner_prior_rates': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_vision_planner_agent, rate_fn=rates_lib.prior_rates_aligned
        ),
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(
            min_dwell_seconds=5.0,
            max_dwell_seconds=5.0,
            max_distance_angstroms=2 * BOND,
            image_size=256,
        ),
        get_simulator_config=_get_aligned_prior_rates_config,
    ),
    # Both shipped LEARNED artifacts composed into one zero-training
    # controller: UNet perception + distilled neural rate model as the
    # planning model, against the aligned-prior simulator the rate model
    # was trained on (the full perceive -> model -> plan loop).
    'vision_planner_learned_rates': experiments.EvalExperiment(
        get_agent=functools.partial(
            _get_vision_planner_agent, rate_fn='learned'
        ),
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(
            min_dwell_seconds=5.0,
            max_dwell_seconds=5.0,
            max_distance_angstroms=2 * BOND,
            image_size=256,
        ),
        get_simulator_config=_get_aligned_prior_rates_config,
    ),
    # BASELINE stress config: the same pixels-to-control loop on a
    # DRIFTING microscope (0.5 A per frame per axis, cumulative —
    # _get_simple_rates_drift_config). Uncorrected, the
    # recorded goal vector goes stale by the cumulative drift; the
    # *_corrected variant estimates the drift in the loop (batched
    # phase correlation vs the believed FOV motion) and repairs it.
    'vision_planner_drift': experiments.EvalExperiment(
        get_agent=_get_vision_planner_agent,
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(
            min_dwell_seconds=5.0,
            max_dwell_seconds=5.0,
            max_distance_angstroms=2 * BOND,
            image_size=256,
            include_fov=True,
        ),
        get_simulator_config=_get_simple_rates_drift_config,
    ),
    'vision_planner_drift_corrected': experiments.EvalExperiment(
        get_agent=_get_drift_corrected_vision_planner_agent,
        get_adapters_and_goal=_SingleSiliconGoalReachingFromPixels(
            min_dwell_seconds=5.0,
            max_dwell_seconds=5.0,
            max_distance_angstroms=2 * BOND,
            image_size=256,
            include_fov=True,
        ),
        get_simulator_config=_get_simple_rates_drift_config,
    ),
}

# Native addition: every shipped vector-policy checkpoint as an eval
# experiment (agent + adapters mirror its _MICROSCOPE_EXPERIMENTS entry;
# sim = prior rates, the configuration the zoo regression test locks), so
# the whole zoo is drivable through `python -m putting_dune_tpu.eval`.
_EVAL_EXPERIMENTS.update({
    f'eval_{name}': experiments.EvalExperiment(
        get_agent=_MICROSCOPE_EXPERIMENTS[name].get_agent,
        get_adapters_and_goal=(
            _MICROSCOPE_EXPERIMENTS[name].get_adapters_and_goal
        ),
        get_simulator_config=_get_human_prior_rates_config,
    )
    for name in (
        'ppo_learned_tf_2s', 'ppo_learned_tf_3s', 'ppo_learned_tf_4s',
        'ppo_v3_2s', 'ppo_v3_3s', 'ppo_v3_4s',
    )
})


def register_eval_experiment(name, eval_experiment) -> None:
  """Adds an eval experiment if not present (reference :471-478)."""
  if name not in _EVAL_EXPERIMENTS:
    _EVAL_EXPERIMENTS[name] = eval_experiment


# -------------------- multi-dopant experiments (beyond-parity) ---------------
#
# The reference is strictly single-dopant; these drive the D-dopant
# extension (env/multi_dopant.py) end-to-end through the eval CLI.


@dataclasses.dataclass(frozen=True)
class MultiDopantExperiment:
  """Eval experiment over the D-dopant env.

  make_env(batch_size) builds the environment (settings must match what
  the checkpoint, if any, was trained on); get_agent is None for a
  uniform-random policy or a PolicyCheckpointAgent.
  """

  make_env: object
  get_agent: Optional[PolicyCheckpointAgent] = None
  num_dopants: int = 2


def _make_multi_dopant_env(
    batch_size: int,
    *,
    num_dopants: int,
    dwell_seconds: float = 5.0,
    grid_columns: int = 50,
    step_limit: int = 600,
    observation_mode: str = 'vector',
    anchor_order: str = 'index',
    image_size: int = 128,
    drift_per_frame_angstroms: float = 0.0,
    include_fov: bool = False,
):
  """Env factory matching the shipped multi_dopant_2 training settings
  (runs/train_multidopant.py: lattice 50, simple rates, 5 s dwell,
  relative action mode, sticky goals)."""
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu.env import multi_dopant

  return multi_dopant.MultiDopantEnv(
      lattice=lattice_lib.make_lattice(grid_columns),
      rate_fn=rates_lib.simple_canonical_rates,
      batch_size=batch_size,
      num_dopants=num_dopants,
      dwell_seconds=dwell_seconds,
      step_limit=step_limit,
      observation_mode=observation_mode,
      anchor_order=anchor_order,
      image_size=image_size,
      drift_per_frame_angstroms=drift_per_frame_angstroms,
      include_fov=include_fov,
  )


@dataclasses.dataclass(frozen=True)
class _MultiDopantPlannerFactory:
  """get_agent for planner-driven multi-dopant experiments (needs the
  'vector_neighbors' observation mode so the anchor geometry is visible)."""

  num_dopants: int
  dwell_seconds: float = 5.0

  def __call__(self, rng, adapters_and_goal):
    del rng, adapters_and_goal
    from putting_dune_tpu.agents import planner as planner_lib

    return planner_lib.MultiDopantPlannerAgent(
        rate_fn=rates_lib.simple_canonical_rates,
        num_dopants=self.num_dopants,
        dwell_seconds=self.dwell_seconds,
        max_distance_angstroms=2.0 * BOND,
    )


@dataclasses.dataclass(frozen=True)
class _MultiDopantVisionPlannerFactory:
  """get_agent for the D-dopant vision planner ('image' observations +
  anchor_order='position')."""

  num_dopants: int
  dwell_seconds: float = 5.0

  def __call__(self, rng, adapters_and_goal):
    del rng, adapters_and_goal
    from putting_dune_tpu.agents import vision_planner as vp

    return vp.MultiDopantVisionPlannerAgent(
        rate_fn=rates_lib.simple_canonical_rates,
        num_dopants=self.num_dopants,
        dwell_seconds=self.dwell_seconds,
        max_distance_angstroms=2.0 * BOND,
    )


@dataclasses.dataclass(frozen=True)
class _MultiDopantDriftCorrectedVisionPlannerFactory:
  """get_agent for the drift-corrected D-dopant vision planner (needs
  'image' observations + anchor_order='position' + include_fov=True)."""

  num_dopants: int
  dwell_seconds: float = 5.0

  def __call__(self, rng, adapters_and_goal):
    del rng, adapters_and_goal
    from putting_dune_tpu.agents import drift_correction as dc

    return dc.DriftCorrectedMultiDopantVisionPlannerAgent(
        rate_fn=rates_lib.simple_canonical_rates,
        num_dopants=self.num_dopants,
        dwell_seconds=self.dwell_seconds,
        max_distance_angstroms=2.0 * BOND,
    )


_MULTI_DOPANT_EXPERIMENTS = {
    'multi_dopant_2_ppo': MultiDopantExperiment(
        make_env=functools.partial(_make_multi_dopant_env, num_dopants=2),
        get_agent=PolicyCheckpointAgent('multi_dopant_2'),
        num_dopants=2,
    ),
    'multi_dopant_2_random': MultiDopantExperiment(
        make_env=functools.partial(_make_multi_dopant_env, num_dopants=2),
        num_dopants=2,
    ),
    'multi_dopant_3_random': MultiDopantExperiment(
        make_env=functools.partial(_make_multi_dopant_env, num_dopants=3),
        num_dopants=3,
    ),
    'multi_dopant_3_ppo': MultiDopantExperiment(
        make_env=functools.partial(_make_multi_dopant_env, num_dopants=3),
        get_agent=PolicyCheckpointAgent('multi_dopant_3'),
        num_dopants=3,
    ),
    # Rate-aware planner on the D-dopant env — zero training required
    # (agents/planner.py multi_dopant_planner_policy).
    'multi_dopant_2_planner': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=2,
            observation_mode='vector_neighbors',
        ),
        get_agent=_MultiDopantPlannerFactory(num_dopants=2),
        num_dopants=2,
    ),
    'multi_dopant_3_planner': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=3,
            observation_mode='vector_neighbors',
        ),
        get_agent=_MultiDopantPlannerFactory(num_dopants=3),
        num_dopants=3,
    ),
    # D-scaling: the same zero-training planner at FOUR dopants (the
    # initial-site ring and per-dopant distinct-goal sampling scale with
    # D; nothing else changes).
    'multi_dopant_4_planner': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=4,
            observation_mode='vector_neighbors',
        ),
        get_agent=_MultiDopantPlannerFactory(num_dopants=4),
        num_dopants=4,
    ),
    'multi_dopant_4_random': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=4,
            observation_mode='vector_neighbors',
        ),
        num_dopants=4,
    ),
    # The multi-dopant planner DAgger-distilled into MLPs
    # (runs/distill_multidopant.py): planner-grade control at the PPO
    # checkpoints' inference cost, over the same 'vector_neighbors'
    # observations the planner consumes.
    'multi_dopant_2_distilled': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=2,
            observation_mode='vector_neighbors',
        ),
        get_agent=PolicyCheckpointAgent('multi_dopant_2_distilled'),
        num_dopants=2,
    ),
    'multi_dopant_3_distilled': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=3,
            observation_mode='vector_neighbors',
        ),
        get_agent=PolicyCheckpointAgent('multi_dopant_3_distilled'),
        num_dopants=3,
    ),
    # Pixels-to-control for D dopants with zero training: shipped UNet ->
    # per-dopant peak extraction -> anchor geometry -> planner
    # (agents/vision_planner.py multi_dopant_vision_planner_policy). The
    # env's anchor_order='position' makes the peak <-> goal association
    # observable from the image alone; image 256^2 (the detector's
    # training size).
    'multi_dopant_2_vision_planner': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=2,
            observation_mode='image',
            anchor_order='position',
            image_size=256,
        ),
        get_agent=_MultiDopantVisionPlannerFactory(num_dopants=2),
        num_dopants=2,
    ),
    'multi_dopant_3_vision_planner': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=3,
            observation_mode='image',
            anchor_order='position',
            image_size=256,
        ),
        get_agent=_MultiDopantVisionPlannerFactory(num_dopants=3),
        num_dopants=3,
    ),
    # The FULL BASELINE stress config 5: multi-dopant lattice, long-
    # horizon KMC, instrument drift, full image observation pipeline —
    # uncorrected vs in-loop drift-corrected (phase correlation of
    # detector maps + honeycomb goal snapping).
    'multi_dopant_2_vision_planner_drift': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=2,
            observation_mode='image',
            anchor_order='position',
            image_size=256,
            drift_per_frame_angstroms=0.5,
            include_fov=True,
        ),
        get_agent=_MultiDopantVisionPlannerFactory(num_dopants=2),
        num_dopants=2,
    ),
    'multi_dopant_2_vision_planner_drift_corrected': MultiDopantExperiment(
        make_env=functools.partial(
            _make_multi_dopant_env,
            num_dopants=2,
            observation_mode='image',
            anchor_order='position',
            image_size=256,
            drift_per_frame_angstroms=0.5,
            include_fov=True,
        ),
        get_agent=_MultiDopantDriftCorrectedVisionPlannerFactory(
            num_dopants=2
        ),
        num_dopants=2,
    ),
}


def create_multi_dopant_experiment(name: str) -> MultiDopantExperiment:
  if name not in _MULTI_DOPANT_EXPERIMENTS:
    raise ValueError(f'Unknown multi-dopant experiment {name}.')
  return _MULTI_DOPANT_EXPERIMENTS[name]


def multi_dopant_experiment_names():
  return tuple(_MULTI_DOPANT_EXPERIMENTS)


def create_microscope_experiment(name: str):
  if name not in _MICROSCOPE_EXPERIMENTS:
    raise ValueError(f'Unknown microscope experiment {name}.')
  return _MICROSCOPE_EXPERIMENTS[name]


def create_train_experiment(name: str):
  if name not in _TRAIN_EXPERIMENTS:
    raise ValueError(f'Unknown train experiment {name}.')
  return _TRAIN_EXPERIMENTS[name]


def create_eval_experiment(name: str):
  if name not in _EVAL_EXPERIMENTS:
    raise ValueError(f'Unknown eval experiment {name}.')
  return _EVAL_EXPERIMENTS[name]


def microscope_experiment_names():
  return tuple(_MICROSCOPE_EXPERIMENTS)


def train_experiment_names():
  return tuple(_TRAIN_EXPERIMENTS)


def eval_experiment_names():
  return tuple(_EVAL_EXPERIMENTS)
