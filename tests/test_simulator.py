"""Simulator behavior tests (reference simulator_test.py styles)."""

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import simulator as simulator_lib
from putting_dune_tpu import structures

LATTICE = lattice_lib.make_lattice(num_cols=20)
CONFIG = simulator_lib.SimulatorConfig(grid_columns=20)


def zero_rates(si_pos, neighbor_pos, beam_pos):
  del neighbor_pos, beam_pos
  return jnp.full(si_pos.shape[:-1] + (3,), 1e-12)


def test_reset_centers_fov_on_silicon():
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(0), LATTICE, config=CONFIG, batch_size=8
  )
  si_micro = np.asarray(obs.si_position_microscope)
  np.testing.assert_allclose(si_micro, 0.5, atol=1e-5)
  width = np.asarray(state.fov.width)
  assert (width >= 15.0).all() and (width <= 30.0).all()
  np.testing.assert_allclose(
      np.asarray(state.fov.width), np.asarray(state.fov.height), rtol=1e-6
  )
  # Initial observation costs one image duration.
  np.testing.assert_allclose(np.asarray(obs.elapsed_seconds), 2.0)


def test_reset_is_deterministic_per_key():
  s1, o1 = simulator_lib.reset(
      jax.random.PRNGKey(7), LATTICE, config=CONFIG, batch_size=4
  )
  s2, o2 = simulator_lib.reset(
      jax.random.PRNGKey(7), LATTICE, config=CONFIG, batch_size=4
  )
  np.testing.assert_array_equal(
      np.asarray(s1.material.si_index), np.asarray(s2.material.si_index)
  )
  np.testing.assert_allclose(
      np.asarray(s1.material.theta), np.asarray(s2.material.theta)
  )
  # And different keys give different poses.
  s3, _ = simulator_lib.reset(
      jax.random.PRNGKey(8), LATTICE, config=CONFIG, batch_size=4
  )
  assert not np.allclose(
      np.asarray(s1.material.theta), np.asarray(s3.material.theta)
  )


def test_step_elapsed_time_includes_dwell_and_image():
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(1), LATTICE, config=CONFIG, batch_size=4
  )
  control = structures.BeamControl(
      position=jnp.full((4, 2), 0.5), dwell_seconds=jnp.full((4,), 1.5)
  )
  _, obs, _ = simulator_lib.step(
      state, jax.random.PRNGKey(2), control, LATTICE, zero_rates,
      config=CONFIG,
  )
  # No transitions (zero rates) => silicon stays centered, no recenter:
  # elapsed = dwell 1.5 + image 2.0.
  np.testing.assert_allclose(np.asarray(obs.elapsed_seconds), 3.5)


def test_fov_recenters_when_silicon_leaves_safe_area():
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(3), LATTICE, config=CONFIG, batch_size=2
  )
  # Manually shift the FOV so the silicon sits outside [0.25, 0.75]^2.
  shifted_fov = state.fov.shift(jnp.asarray([[10.0, 0.0], [0.0, 0.0]]))
  state = state.replace(fov=shifted_fov)
  control = structures.BeamControl(
      position=jnp.full((2, 2), 0.5), dwell_seconds=jnp.full((2,), 1.0)
  )
  new_state, obs, _ = simulator_lib.step(
      state, jax.random.PRNGKey(4), control, LATTICE, zero_rates,
      config=CONFIG,
  )
  si_micro = np.asarray(obs.si_position_microscope)
  # Env 0 was recentered (si back to 0.5) and paid an extra image.
  np.testing.assert_allclose(si_micro[0], 0.5, atol=1e-5)
  elapsed = np.asarray(obs.elapsed_seconds)
  assert abs(elapsed[0] - (1.0 + 2.0 + 2.0)) < 1e-5
  # Env 1 was centered all along: no recenter, single image.
  assert abs(elapsed[1] - (1.0 + 2.0)) < 1e-5
  del new_state


def test_control_positions_convert_microscope_to_material():
  # With the FOV centered on the silicon, a control at (0.5, 0.5) must land
  # exactly on the silicon in material coordinates.
  state, _ = simulator_lib.reset(
      jax.random.PRNGKey(5), LATTICE, config=CONFIG, batch_size=3
  )
  beam_material = state.fov.microscope_to_material(jnp.full((3, 2), 0.5))
  si_pos = lattice_lib.site_position(
      LATTICE,
      state.material.si_index,
      state.material.offset,
      state.material.theta,
  )
  np.testing.assert_allclose(
      np.asarray(beam_material), np.asarray(si_pos), atol=1e-4
  )


def test_atom_window_contents():
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(6), LATTICE, config=CONFIG, batch_size=4,
      return_window=True,
  )
  window = obs.window
  mask = np.asarray(window.mask)
  pos = np.asarray(window.positions)
  nums = np.asarray(window.atomic_numbers)
  # All valid atoms inside [0, 1]^2.
  assert ((pos[mask] >= 0.0) & (pos[mask] <= 1.0)).all()
  # Exactly one silicon per env, at the recorded slot, near the center.
  for b in range(4):
    si_slots = np.nonzero(nums[b] == constants.SILICON)[0]
    assert len(si_slots) == 1
    assert si_slots[0] == np.asarray(window.si_slot)[b]
    np.testing.assert_allclose(pos[b, si_slots[0]], 0.5, atol=1e-5)
  # Plausible atom count for a 15-30 A FOV (graphene ~0.385 atoms/A^2).
  counts = mask.sum(axis=1)
  widths = np.asarray(state.fov.width)
  expected = 0.385 * widths**2
  assert (counts > 0.5 * expected).all() and (counts < 1.5 * expected).all()


def test_window_matches_bruteforce_crop():
  state, obs = simulator_lib.reset(
      jax.random.PRNGKey(9), LATTICE, config=CONFIG, batch_size=2,
      return_window=True,
  )
  world = np.asarray(
      lattice_lib.world_positions(
          LATTICE, state.material.offset, state.material.theta
      )
  )
  for b in range(2):
    ll = np.asarray(state.fov.lower_left)[b]
    ur = np.asarray(state.fov.upper_right)[b]
    inside = ((world[b] >= ll) & (world[b] <= ur)).all(axis=1)
    assert inside.sum() == np.asarray(obs.window.mask)[b].sum()
