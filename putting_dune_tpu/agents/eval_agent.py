"""Frozen-policy evaluation agent (native JAX).

Replaces the reference TfEvalAgent (/root/reference/putting_dune/agents/
tf_eval_agent.py:23-32), which wraps a TF SavedModel. Here a policy is a
flax module + msgpack'd params saved by EvalAgent.save(); step() runs the
jitted policy on the observation. Three checkpoint kinds:

  * 'mlp': vector-observation tanh tower (matches the PPO actor layout);
  * 'conv': dict-observation conv policy;
  * 'actor_critic': full PPO ActorCritic params, mean head at inference
    (used for image policies trained by agents/ppo.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional

import flax.linen as nn
import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu.agents import agent_lib


class MLPPolicy(nn.Module):
  """Vector-observation policy head (tanh tower, matching the PPO actor).

  output_scale widens the tanh range for adapters that consume raw
  angstrom deltas (RelativeToSiliconMaterialFrameActionAdapter) instead
  of [-1, 1] fractions; 1.0 (the default) is the microscope-frame
  convention every pre-existing checkpoint was saved with. A per-dim
  tuple supports mixed action semantics (e.g. angstrom deltas + a [0, 1]
  dwell fraction for the variable-dwell adapters).
  """

  hidden: tuple[int, ...] = (256, 256)
  action_dim: int = 2
  output_scale: float | tuple[float, ...] = 1.0

  @nn.compact
  def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
    x = obs
    for width in self.hidden:
      x = nn.tanh(nn.Dense(width)(x))
    scale = jnp.asarray(self.output_scale, jnp.float32)
    return scale * nn.tanh(nn.Dense(self.action_dim)(x))


class ConvPolicy(nn.Module):
  """{image, goal_delta_angstroms} dict-observation policy head."""

  hidden: tuple[int, ...] = (256,)
  action_dim: int = 2
  features: tuple[int, ...] = (16, 32, 64)

  @nn.compact
  def __call__(self, obs: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
    x = obs['image']
    for f in self.features:
      x = nn.Conv(f, (3, 3), strides=(2, 2))(x)
      x = nn.swish(x)
    x = x.reshape((x.shape[0], -1))
    x = jnp.concatenate([x, obs['goal_delta_angstroms']], axis=-1)
    for width in self.hidden:
      x = nn.swish(nn.Dense(width)(x))
    return nn.tanh(nn.Dense(self.action_dim)(x))


class _ActorCriticPolicy:
  """Adapter exposing only the deterministic mean of a PPO ActorCritic."""

  def __init__(self, hidden, conv_features, action_dim, image_size=128):
    from putting_dune_tpu.agents import ppo  # lazy: avoid import cycle

    self.hidden = tuple(hidden)
    self.conv_features = tuple(conv_features)
    self.action_dim = action_dim
    self.image_size = image_size
    self._module = ppo.ActorCritic(
        action_dim=action_dim,
        hidden=self.hidden,
        conv_features=self.conv_features,
    )

  def apply(self, variables, obs):
    mean, _, _ = self._module.apply(variables, obs)
    return mean

  def init_template(self):
    dummy = {
        'image': jnp.zeros((1, self.image_size, self.image_size, 1)),
        'goal_delta_angstroms': jnp.zeros((1, 2)),
    }
    return self._module.init(jax.random.PRNGKey(0), dummy)['params']


class TfSavedModelAgent(agent_lib.Agent):
  """Frozen-policy agent backed by a TF SavedModel.

  Exact semantics of the reference TfEvalAgent
  (/root/reference/putting_dune/agents/tf_eval_agent.py:23-32): the
  SavedModel's __call__ maps the raw observation to the action. This is
  the interop path for policies exported by the reference's jax2tf
  pipeline (experiments/registry.py:71-164 downloads such models); the
  native path is EvalAgent. TensorFlow is imported lazily — the
  framework works without it.
  """

  def __init__(self, path: str):
    import tensorflow as tf  # deferred: optional dependency

    self._model = tf.saved_model.load(path)

  def step(self, time_step) -> np.ndarray:
    return np.asarray(self._model(time_step.observation))

  def set_mode(self, mode: agent_lib.AgentMode) -> None:
    pass


class EvalAgent(agent_lib.Agent):
  """Applies a frozen policy to observations."""

  def __init__(self, module, params: Any):
    self._module = module
    self._params = params
    self._apply = jax.jit(
        lambda params, obs: module.apply({'params': params}, obs)
    )

  @property
  def params(self):
    """The frozen policy params (e.g. to warm-start a continuation run)."""
    return self._params

  def step(self, time_step) -> np.ndarray:
    obs = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x))[None], time_step.observation
    )
    return np.asarray(self._apply(self._params, obs))[0]

  def set_mode(self, mode: agent_lib.AgentMode) -> None:
    pass

  def policy(self):
    """Returns a batched pure policy fn (key, obs) -> action for rollouts."""
    apply = self._apply
    params = self._params

    def policy_fn(key, obs):
      del key
      return apply(params, obs)

    return policy_fn

  @classmethod
  def from_actor_critic(
      cls, params, *, hidden, conv_features, action_dim, image_size=128
  ) -> 'EvalAgent':
    """Wraps full PPO actor-critic params (image policies)."""
    return cls(
        _ActorCriticPolicy(hidden, conv_features, action_dim, image_size),
        params,
    )

  # -- persistence ------------------------------------------------------------

  def save(self, save_dir: str) -> None:
    os.makedirs(save_dir, exist_ok=True)
    if isinstance(self._module, MLPPolicy):
      meta = {
          'kind': 'mlp',
          'arch': {
              'hidden': list(self._module.hidden),
              'action_dim': self._module.action_dim,
              'output_scale': (
                  list(self._module.output_scale)
                  if isinstance(self._module.output_scale, (tuple, list))
                  else self._module.output_scale
              ),
          },
      }
    elif isinstance(self._module, ConvPolicy):
      meta = {
          'kind': 'conv',
          'arch': {
              'hidden': list(self._module.hidden),
              'action_dim': self._module.action_dim,
              'features': list(self._module.features),
          },
      }
    elif isinstance(self._module, _ActorCriticPolicy):
      meta = {
          'kind': 'actor_critic',
          'arch': {
              'hidden': list(self._module.hidden),
              'conv_features': list(self._module.conv_features),
              'action_dim': self._module.action_dim,
              'image_size': self._module.image_size,
          },
      }
    else:
      raise ValueError(f'Unsupported module {type(self._module)}')
    with open(os.path.join(save_dir, 'policy.json'), 'w') as f:
      json.dump(meta, f)
    with open(os.path.join(save_dir, 'policy.ckpt'), 'wb') as f:
      f.write(flax.serialization.to_bytes(self._params))

  @classmethod
  def load(cls, load_dir: str) -> 'EvalAgent':
    with open(os.path.join(load_dir, 'policy.json')) as f:
      meta = json.load(f)
    arch = meta['arch']
    if meta['kind'] == 'mlp':
      raw_scale = arch.get('output_scale', 1.0)
      module = MLPPolicy(
          hidden=tuple(arch['hidden']),
          action_dim=arch['action_dim'],
          output_scale=(
              tuple(float(s) for s in raw_scale)
              if isinstance(raw_scale, list)
              else float(raw_scale)
          ),
      )
      template = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))[
          'params'
      ]
    elif meta['kind'] == 'conv':
      module = ConvPolicy(
          hidden=tuple(arch['hidden']),
          action_dim=arch['action_dim'],
          features=tuple(arch['features']),
      )
      dummy = {
          'image': jnp.zeros((1, 128, 128, 1)),
          'goal_delta_angstroms': jnp.zeros((1, 2)),
      }
      template = module.init(jax.random.PRNGKey(0), dummy)['params']
    elif meta['kind'] == 'actor_critic':
      module = _ActorCriticPolicy(
          arch['hidden'],
          arch['conv_features'],
          arch['action_dim'],
          arch.get('image_size', 128),
      )
      template = module.init_template()
    else:
      raise ValueError(f"Unknown policy kind {meta['kind']}")
    with open(os.path.join(load_dir, 'policy.ckpt'), 'rb') as f:
      params = flax.serialization.from_bytes(template, f.read())
    return cls(module, params)
