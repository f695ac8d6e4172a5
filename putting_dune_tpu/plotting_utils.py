"""Plotting and video utilities (host-side, matplotlib).

Parity: /root/reference/putting_dune/plotting_utils.py (frame plots, rate
visualizations, episode videos) and learn_rates.visualize_rates
(learn_rates.py:975-1047). Everything here is presentation-layer: inputs
are host numpy arrays or the framework's host/observation structures.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from putting_dune_tpu import constants


def _plt():
  import matplotlib

  matplotlib.use('Agg')
  import matplotlib.pyplot as plt

  return plt


_ATOM_COLORS = {constants.CARBON: 'tab:gray', constants.SILICON: 'tab:red'}


def plot_atoms(ax, positions: np.ndarray, atomic_numbers: np.ndarray,
               scale: float = 1.0) -> None:
  """Scatter atoms colored by species, sized by atomic number."""
  positions = np.asarray(positions)
  atomic_numbers = np.asarray(atomic_numbers)
  for z in np.unique(atomic_numbers):
    if z == 0:
      continue  # padding
    sel = atomic_numbers == z
    ax.scatter(
        positions[sel, 0],
        positions[sel, 1],
        s=30.0 * (z / constants.CARBON) * scale,
        c=_ATOM_COLORS.get(int(z), 'tab:blue'),
        label=f'Z={int(z)}',
    )


def plot_microscope_frame(
    ax,
    positions: np.ndarray,
    atomic_numbers: np.ndarray,
    goal_position: Optional[np.ndarray] = None,
    beam_position: Optional[np.ndarray] = None,
) -> None:
  """Plots a [0,1]^2 microscope-frame scene (reference :94-118)."""
  plot_atoms(ax, positions, atomic_numbers)
  if goal_position is not None:
    goals = np.asarray(goal_position).reshape(-1, 2)  # one or D goals
    ax.scatter(goals[:, 0], goals[:, 1], marker='*', s=180,
               c='gold', edgecolors='k', label='goal', zorder=5)
  if beam_position is not None:
    ax.scatter(*np.asarray(beam_position).reshape(2), marker='x', s=100,
               c='tab:green', label='beam', zorder=5)
  ax.set_xlim(0, 1)
  ax.set_ylim(0, 1)
  ax.set_aspect('equal')


def plot_material_frame(
    ax,
    positions: np.ndarray,
    atomic_numbers: np.ndarray,
    fov=None,
    goal_position: Optional[np.ndarray] = None,
    beam_position: Optional[np.ndarray] = None,
) -> None:
  """Plots an angstrom material-frame scene (reference :121-142)."""
  plot_atoms(ax, positions, atomic_numbers)
  if goal_position is not None:
    goals = np.asarray(goal_position).reshape(-1, 2)  # one or D goals
    ax.scatter(goals[:, 0], goals[:, 1], marker='*', s=180,
               c='gold', edgecolors='k', label='goal', zorder=5)
  if beam_position is not None:
    ax.scatter(*np.asarray(beam_position).reshape(2), marker='x', s=100,
               c='tab:green', label='beam', zorder=5)
  if fov is not None:
    ll = np.asarray(fov.lower_left).reshape(-1)[:2]
    width = float(np.asarray(fov.width).reshape(-1)[0])
    height = float(np.asarray(fov.height).reshape(-1)[0])
    import matplotlib.patches as patches

    ax.add_patch(
        patches.Rectangle(ll, width, height, fill=False, ls='--', ec='k')
    )
  ax.set_aspect('equal')


def render_env_frame(env, state) -> np.ndarray:
  """Renders one env (batch element 0) to an RGB array (dm_env render)."""
  import jax

  from putting_dune_tpu import lattice as lattice_lib

  plt = _plt()
  fig = plt.figure(figsize=[5, 5])
  ax = fig.subplots()

  material = state.sim.material
  world = np.asarray(
      lattice_lib.world_positions(env.lattice, material.offset,
                                  material.theta)
  )[0]
  numbers = np.full(world.shape[0], constants.CARBON)
  numbers[int(np.asarray(material.si_index)[0])] = constants.SILICON
  goal = np.asarray(state.goal.position_material)[0]
  plot_material_frame(ax, world, numbers, fov=None, goal_position=goal)
  ll = np.asarray(state.sim.fov.lower_left)[0]
  ur = np.asarray(state.sim.fov.upper_right)[0]
  ax.set_xlim(ll[0], ur[0])
  ax.set_ylim(ll[1], ur[1])

  fig.canvas.draw()
  img = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
  img = img.reshape(fig.canvas.get_width_height()[::-1] + (4,))[..., :3]
  plt.close(fig)
  return img.copy()


def generate_video_from_trajectory(
    positions_sequence: Sequence[np.ndarray],
    atomic_numbers_sequence: Sequence[np.ndarray],
    goal_position: Optional[np.ndarray] = None,
    beam_positions: Optional[Sequence[np.ndarray]] = None,
    interval_ms: int = 200,
):
  """Builds a matplotlib FuncAnimation of an episode (reference :156-260).

  Inputs are per-step material-frame snapshots; save with anim.save(path).
  """
  plt = _plt()
  from matplotlib import animation

  fig, ax = plt.subplots(figsize=[5, 5])

  def draw(i):
    ax.clear()
    plot_material_frame(
        ax,
        positions_sequence[i],
        atomic_numbers_sequence[i],
        goal_position=goal_position,
        beam_position=(
            beam_positions[i] if beam_positions is not None else None
        ),
    )
    ax.set_title(f'step {i}')

  anim = animation.FuncAnimation(
      fig, draw, frames=len(positions_sequence), interval=interval_ms
  )
  return anim


# --- rate-function visualization ----------------------------------------------


def visualize_rates(
    save_path: Optional[str],
    predict_rates: Callable[[np.ndarray], np.ndarray],
    grid_range: float = 1.5,
    num_points: int = 40_000,
    fixed_context: Optional[np.ndarray] = None,
):
  """Contour plots of predicted per-neighbor rates over beam positions.

  Parity: reference learn_rates.py:975-1047. predict_rates maps (N, D)
  inputs (optionally prefixed with fixed_context) to (N, 3) rates.
  """
  plt = _plt()
  side = int(np.sqrt(num_points))
  xs = np.linspace(-grid_range, grid_range, side, dtype=np.float32)
  xx, yy = np.meshgrid(xs, xs)
  points = np.stack([xx.ravel(), yy.ravel()], axis=-1)
  if fixed_context is not None and np.size(fixed_context):
    ctx = np.tile(
        np.asarray(fixed_context, np.float32)[None], (points.shape[0], 1)
    )
    inputs = np.concatenate([ctx, points], axis=-1)
  else:
    inputs = points
  rates = np.asarray(predict_rates(inputs))
  num_states = rates.shape[-1]

  fig, axes = plt.subplots(
      1, num_states + 1, figsize=[5 * (num_states + 1), 5]
  )
  for k in range(num_states):
    axes[k].contourf(xx, yy, rates[:, k].reshape(side, side), levels=20)
    axes[k].set_title(f'rate -> neighbor {k}')
    axes[k].set_aspect('equal')
  axes[-1].contourf(
      xx, yy, rates.sum(-1).reshape(side, side), levels=20
  )
  axes[-1].set_title('total rate')
  axes[-1].set_aspect('equal')
  if save_path:
    fig.savefig(save_path, bbox_inches='tight')
    plt.close(fig)
    return None
  return fig


def plot_rate_function3(
    rate_fn: Callable[[np.ndarray], np.ndarray],
    grid_range: float = 3.0,
    resolution: int = 100,
    save_path: Optional[str] = None,
):
  """3-panel per-neighbor rate map for a batched simulator rate function.

  Parity: reference plotting_utils.py:276-360 — evaluates rates for a
  canonical silicon at the origin with neighbors at 90/210/330 degrees.
  rate_fn has the framework's (si, neighbors, beam) -> (B, 3) signature.
  """
  import jax.numpy as jnp

  plt = _plt()
  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  angles = np.deg2rad([90.0, 210.0, 330.0])
  neighbors = bond * np.stack(
      [np.cos(angles), np.sin(angles)], axis=-1
  )

  xs = np.linspace(-grid_range, grid_range, resolution, dtype=np.float32)
  xx, yy = np.meshgrid(xs, xs)
  beams = np.stack([xx.ravel(), yy.ravel()], axis=-1)
  batch = beams.shape[0]
  si = jnp.zeros((batch, 2))
  nbr = jnp.tile(jnp.asarray(neighbors, jnp.float32)[None], (batch, 1, 1))
  rates = np.asarray(rate_fn(si, nbr, jnp.asarray(beams)))

  fig, axes = plt.subplots(1, 3, figsize=[15, 5])
  for k in range(3):
    axes[k].contourf(xx, yy, rates[:, k].reshape(resolution, resolution),
                     levels=20)
    axes[k].scatter(neighbors[:, 0], neighbors[:, 1], c='w', s=20)
    axes[k].scatter([0], [0], c='r', s=30)
    axes[k].set_title(f'neighbor {k}')
    axes[k].set_aspect('equal')
  if save_path:
    fig.savefig(save_path, bbox_inches='tight')
    plt.close(fig)
    return None
  return fig


def plot_rate_along_neighbor_vector3(
    rate_fn,
    max_distance: float = 3.0,
    resolution: int = 200,
    save_path: Optional[str] = None,
):
  """Rates along the silicon->neighbor-0 ray (reference :364-420)."""
  import jax.numpy as jnp

  plt = _plt()
  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  angles = np.deg2rad([0.0, 120.0, 240.0])
  neighbors = bond * np.stack([np.cos(angles), np.sin(angles)], axis=-1)
  ts = np.linspace(0.0, max_distance, resolution, dtype=np.float32)
  beams = np.stack([ts, np.zeros_like(ts)], axis=-1)
  si = jnp.zeros((resolution, 2))
  nbr = jnp.tile(jnp.asarray(neighbors, jnp.float32)[None],
                 (resolution, 1, 1))
  rates = np.asarray(rate_fn(si, nbr, jnp.asarray(beams)))

  fig, ax = plt.subplots(figsize=[7, 5])
  for k in range(3):
    ax.plot(ts, rates[:, k], label=f'neighbor {k}')
  ax.axvline(bond, ls='--', c='gray')
  ax.set_xlabel('beam distance along neighbor-0 ray (angstroms)')
  ax.set_ylabel('rate (1/s)')
  ax.legend()
  if save_path:
    fig.savefig(save_path, bbox_inches='tight')
    plt.close(fig)
    return None
  return fig


def plot_rate_along_arc3(
    rate_fn,
    radius: float = 0.85 * constants.CARBON_BOND_DISTANCE_ANGSTROMS,
    resolution: int = 360,
    save_path: Optional[str] = None,
):
  """Rates along a circle of given radius around the silicon (ref :424-486)."""
  import jax.numpy as jnp

  plt = _plt()
  bond = constants.CARBON_BOND_DISTANCE_ANGSTROMS
  angles3 = np.deg2rad([0.0, 120.0, 240.0])
  neighbors = bond * np.stack([np.cos(angles3), np.sin(angles3)], axis=-1)
  thetas = np.linspace(0, 2 * np.pi, resolution, dtype=np.float32)
  beams = radius * np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)
  si = jnp.zeros((resolution, 2))
  nbr = jnp.tile(jnp.asarray(neighbors, jnp.float32)[None],
                 (resolution, 1, 1))
  rates = np.asarray(rate_fn(si, nbr, jnp.asarray(beams)))

  fig, ax = plt.subplots(figsize=[7, 5])
  for k in range(3):
    ax.plot(np.rad2deg(thetas), rates[:, k], label=f'neighbor {k}')
  for a in np.rad2deg(angles3):
    ax.axvline(a, ls='--', c='gray', alpha=0.5)
  ax.set_xlabel('beam angle (degrees)')
  ax.set_ylabel('rate (1/s)')
  ax.legend()
  if save_path:
    fig.savefig(save_path, bbox_inches='tight')
    plt.close(fig)
    return None
  return fig
