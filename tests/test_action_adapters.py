"""Direct unit tests of the four action adapters.

Mirrors the reference's action_adapters_test.py taxonomy (exact-value
checks of the action -> beam-control math); previously these were only
exercised indirectly through env/eval tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import structures
from putting_dune_tpu.env import action_adapters


def _ctx(si=(0.5, 0.5), lower=(0.0, 0.0), upper=(20.0, 20.0), batch=2):
  fov = structures.FieldOfView(
      lower_left=jnp.tile(jnp.asarray([lower], jnp.float32), (batch, 1)),
      upper_right=jnp.tile(jnp.asarray([upper], jnp.float32), (batch, 1)),
  )
  return action_adapters.AdapterContext(
      si_position_microscope=jnp.tile(
          jnp.asarray([si], jnp.float32), (batch, 1)
      ),
      fov=fov,
  )


def test_direct_adapter_clips_and_fixes_dwell():
  adapter = action_adapters.DirectActionAdapter()
  action = jnp.asarray([[0.25, 1.7], [-0.5, 0.5]], jnp.float32)
  _, control = adapter.to_controls(None, _ctx(), action)
  np.testing.assert_allclose(
      np.asarray(control.position), [[0.25, 1.0], [0.0, 0.5]]
  )
  np.testing.assert_allclose(np.asarray(control.dwell_seconds), [1.5, 1.5])


def test_delta_adapter_is_stateful_and_clipped():
  adapter = action_adapters.DeltaPositionActionAdapter()
  state = adapter.init_state(jax.random.PRNGKey(0), 2)
  assert state.shape == (2, 2)
  # Two consecutive steps accumulate; the walk clips to [0, 1].
  a1 = jnp.asarray([[0.1, 0.1], [-2.0, 0.0]], jnp.float32)
  state1, c1 = adapter.to_controls(state, _ctx(), a1)
  np.testing.assert_allclose(
      np.asarray(c1.position),
      np.clip(np.asarray(state) + np.asarray(a1), 0.0, 1.0),
      rtol=1e-6,
  )
  np.testing.assert_allclose(np.asarray(state1), np.asarray(c1.position))
  a2 = jnp.asarray([[0.05, -0.05], [0.1, 0.1]], jnp.float32)
  state2, c2 = adapter.to_controls(state1, _ctx(), a2)
  np.testing.assert_allclose(
      np.asarray(c2.position),
      np.clip(np.asarray(state1) + np.asarray(a2), 0.0, 1.0),
      rtol=1e-6,
  )


def test_relative_adapter_scales_by_fov_extent():
  """action * max_distance/extent offsets the silicon (reference :152-216):
  with a 20 A FOV and the 1.42 A bond as max_distance, action (1, 0)
  lands the beam 1.42/20 right of the silicon."""
  adapter = action_adapters.RelativeToSiliconActionAdapter()
  ctx = _ctx()
  action = jnp.asarray([[1.0, 0.0], [0.0, -1.0]], jnp.float32)
  _, control = adapter.to_controls(None, ctx, action)
  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  np.testing.assert_allclose(
      np.asarray(control.position),
      [[0.5 + bond / 20.0, 0.5], [0.5, 0.5 - bond / 20.0]],
      rtol=1e-5,
  )
  np.testing.assert_allclose(np.asarray(control.dwell_seconds), [1.5, 1.5])
  assert adapter.spec().shape == (2,)


def test_relative_adapter_dwell_dim():
  adapter = action_adapters.RelativeToSiliconActionAdapter(
      min_dwell_seconds=1.0, max_dwell_seconds=20.0
  )
  assert adapter.spec().shape == (3,)
  action = jnp.asarray(
      [[0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 0.0, 0.5]], jnp.float32
  )
  _, control = adapter.to_controls(None, _ctx(batch=3), action)
  np.testing.assert_allclose(
      np.asarray(control.dwell_seconds), [1.0, 20.0, 10.5], rtol=1e-6
  )


def test_material_frame_adapter_offsets_in_angstroms():
  """action is an angstrom offset: with a 20 A FOV, (2.0, 0) A is 0.1 in
  microscope coordinates regardless of max_distance (reference :219-274)."""
  adapter = action_adapters.RelativeToSiliconMaterialFrameActionAdapter()
  action = jnp.asarray([[2.0, 0.0], [0.0, -40.0]], jnp.float32)
  _, control = adapter.to_controls(None, _ctx(), action)
  np.testing.assert_allclose(
      np.asarray(control.position), [[0.6, 0.5], [0.5, 0.0]], rtol=1e-5
  )


def test_adapters_are_jittable():
  for adapter in (
      action_adapters.DirectActionAdapter(),
      action_adapters.RelativeToSiliconActionAdapter(),
      action_adapters.RelativeToSiliconMaterialFrameActionAdapter(),
  ):
    dim = adapter.spec().shape[0]

    @jax.jit
    def controls(action, adapter=adapter):
      return adapter.to_controls(None, _ctx(), action)[1]

    out = controls(jnp.zeros((2, dim), jnp.float32))
    assert out.position.shape == (2, 2)
