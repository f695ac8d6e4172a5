"""Single-environment dm_env.Environment adapter.

Reference-compatible boundary (dm_env semantics identical to
/root/reference/putting_dune/putting_dune_environment.py:36-195): a thin
host wrapper around the batched device core with batch_size=1. Use the
batched PuttingDuneEnv directly for throughput; use this wrapper for
dm_env-based agents, contract tests and the real-microscope loop.
"""

from __future__ import annotations

from typing import Optional

import dm_env
from dm_env import specs
import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu.env import env as env_lib


def _to_dm_timestep(ts: env_lib.TimeStep) -> dm_env.TimeStep:
  step_type_map = {
      env_lib.FIRST: dm_env.StepType.FIRST,
      env_lib.MID: dm_env.StepType.MID,
      env_lib.LAST: dm_env.StepType.LAST,
  }
  obs = jax.tree_util.tree_map(
      lambda x: np.asarray(x)[0], ts.observation
  )
  step_type = step_type_map[int(np.asarray(ts.step_type)[0])]
  if step_type is dm_env.StepType.FIRST:
    # dm_env contract (and dm_env.restart): FIRST timesteps carry no
    # reward/discount — locked by the official EnvironmentTestMixin.
    return dm_env.restart(obs)
  return dm_env.TimeStep(
      step_type=step_type,
      reward=float(np.asarray(ts.reward)[0]),
      discount=float(np.asarray(ts.discount)[0]),
      observation=obs,
  )


class DmEnvWrapper(dm_env.Environment):
  """dm_env.Environment over a batch_size=1 PuttingDuneEnv."""

  def __init__(self, env: env_lib.PuttingDuneEnv, seed: Optional[int] = None):
    if env.batch_size != 1:
      raise ValueError('DmEnvWrapper requires batch_size=1.')
    self._env = env
    self._key = jax.random.PRNGKey(0 if seed is None else seed)
    self._state: Optional[env_lib.EnvState] = None
    self._requires_reset = True
    self.last_elapsed_seconds = 0.0

  def seed(self, seed: Optional[int]) -> None:
    self._key = jax.random.PRNGKey(0 if seed is None else seed)
    self._requires_reset = True

  def _next_key(self) -> jax.Array:
    self._key, key = jax.random.split(self._key)
    return key

  def reset(self) -> dm_env.TimeStep:
    self._state, ts = self._env.reset(self._next_key())
    self._requires_reset = False
    self.last_elapsed_seconds = float(np.asarray(ts.elapsed_seconds)[0])
    return _to_dm_timestep(ts)

  def step(self, action: np.ndarray) -> dm_env.TimeStep:
    if self._requires_reset or self._state is None:
      return self.reset()
    action_arr = jnp.asarray(
        np.asarray(action, np.float32).reshape(1, -1)
    )
    self._state, ts = self._env.step(
        self._state, action_arr, self._next_key()
    )
    if int(np.asarray(ts.step_type)[0]) == env_lib.LAST:
      self._requires_reset = True
    self.last_elapsed_seconds = float(np.asarray(ts.elapsed_seconds)[0])
    return _to_dm_timestep(ts)

  def action_spec(self) -> specs.BoundedArray:
    spec = self._env.action_spec()
    return specs.BoundedArray(
        shape=spec.shape,
        dtype=spec.dtype,
        minimum=np.asarray(spec.minimum),
        maximum=np.asarray(spec.maximum),
    )

  def observation_spec(self):
    spec = self._env.observation_spec()
    if isinstance(spec, dict):
      return {
          k: specs.Array(v.shape, v.dtype) for k, v in spec.items()
      }
    return specs.Array(spec.shape, spec.dtype)

  def render(self):
    """Renders the current state via matplotlib (host-side)."""
    from putting_dune_tpu import plotting_utils  # lazy: matplotlib

    return plotting_utils.render_env_frame(self._env, self._state)
