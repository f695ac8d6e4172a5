"""Plotting smoke + semantics tests.

The reference covers plotting with a single smoke test
(plotting_utils_test.py:58); these go slightly further: every public
plotting surface produces a non-trivial artifact, and the rate plots are
checked against the known shape of the simple-rates law (peak near the
neighbor, symmetry across the three neighbor angles).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import plotting_utils
from putting_dune_tpu import rates as rates_lib


def _png_ok(path):
  return os.path.exists(path) and os.path.getsize(path) > 1000


def test_plot_frames_smoke(tmp_path):
  import matplotlib

  matplotlib.use('Agg')
  import matplotlib.pyplot as plt

  positions = np.random.default_rng(0).uniform(0, 1, (30, 2))
  numbers = np.full(30, constants.CARBON)
  numbers[3] = constants.SILICON

  fig, (ax1, ax2) = plt.subplots(1, 2)
  plotting_utils.plot_microscope_frame(
      ax1, positions, numbers,
      goal_position=np.asarray([0.5, 0.5]),
      beam_position=np.asarray([0.4, 0.6]),
  )

  class Fov:
    lower_left = np.asarray([0.0, 0.0])
    width = 20.0
    height = 20.0

  plotting_utils.plot_material_frame(
      ax2, positions * 20.0, numbers, fov=Fov(),
      goal_position=np.asarray([10.0, 10.0]),
  )
  path = str(tmp_path / 'frames.png')
  fig.savefig(path)
  plt.close(fig)
  assert _png_ok(path)


def test_rate_plots_save_artifacts(tmp_path):
  for name, fn in (
      ('map3', plotting_utils.plot_rate_function3),
      ('ray3', plotting_utils.plot_rate_along_neighbor_vector3),
      ('arc3', plotting_utils.plot_rate_along_arc3),
  ):
    path = str(tmp_path / f'{name}.png')
    out = fn(rates_lib.simple_canonical_rates, save_path=path)
    assert out is None
    assert _png_ok(path), name


def test_arc_rates_peak_at_neighbor_angles():
  """The quantity plot_rate_along_arc3 draws: on the 0.85-bond circle the
  simple-rates law must peak (per neighbor) at that neighbor's angle."""
  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  angles3 = np.deg2rad([0.0, 120.0, 240.0])
  neighbors = bond * np.stack(
      [np.cos(angles3), np.sin(angles3)], axis=-1
  )
  thetas = np.linspace(0, 2 * np.pi, 360, endpoint=False)
  beams = 0.85 * bond * np.stack(
      [np.cos(thetas), np.sin(thetas)], axis=-1
  ).astype(np.float32)
  n = thetas.shape[0]
  rates = np.asarray(
      rates_lib.simple_canonical_rates(
          jnp.zeros((n, 2)),
          jnp.tile(jnp.asarray(neighbors, jnp.float32)[None], (n, 1, 1)),
          jnp.asarray(beams),
      )
  )
  for k, ang in enumerate(angles3):
    peak_theta = thetas[np.argmax(rates[:, k])]
    delta = np.angle(np.exp(1j * (peak_theta - ang)))
    assert abs(delta) < np.deg2rad(5), (k, np.rad2deg(peak_theta))


def test_visualize_rates_saves(tmp_path):
  path = str(tmp_path / 'vis.png')
  plotting_utils.visualize_rates(
      path,
      lambda pts: np.stack(
          [np.exp(-np.sum((pts - c) ** 2, -1)) for c in ((1, 0), (0, 1),
                                                         (-1, -1))],
          axis=-1,
      ),
      num_points=400,
  )
  assert _png_ok(path)


def test_render_env_frame_and_video(tmp_path):
  from putting_dune_tpu.env import env as env_lib

  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(10), batch_size=2
  )
  state, ts = env.reset(jax.random.PRNGKey(0))
  frame = plotting_utils.render_env_frame(env, state)
  assert frame.ndim == 3 and frame.shape[-1] == 3
  assert frame.std() > 0  # not a blank canvas

  positions = [np.random.default_rng(i).uniform(0, 20, (12, 2))
               for i in range(3)]
  numbers = [np.full(12, constants.CARBON)] * 3
  anim = plotting_utils.generate_video_from_trajectory(
      positions, numbers, goal_position=np.asarray([10.0, 10.0])
  )
  path = str(tmp_path / 'ep.gif')
  anim.save(path, writer='pillow')
  assert os.path.getsize(path) > 1000
