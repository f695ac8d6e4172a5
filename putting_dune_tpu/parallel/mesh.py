"""Mesh construction and sharding helpers.

The framework's scaling axes:
  * `data`: environment batch / training batch (embarrassingly parallel; the
    KMC hot loop needs NO cross-device communication — gradients and metric
    reductions ride ICI psums inserted by GSPMD).
  * `model`: ensemble axis for rate-learning bootstrap training (50 models
    trained in one vmap; sharding that axis is this domain's model
    parallelism — each device trains its slice of the ensemble).

This replaces the reference's 1-D data mesh utilities
(/root/reference/putting_dune/atom_detection/train.py:128-148) and its
multi-host global-array plumbing (image_alignment/train.py:369-391) with
plain NamedSharding over an explicit Mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ('data',),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
  """Builds a Mesh over the available devices.

  Args:
    axis_sizes: per-axis sizes; default puts all devices on the first axis.
    axis_names: mesh axis names, default 1-D ('data',).
    devices: devices to use (default jax.devices()).
  """
  devices = list(devices if devices is not None else jax.devices())
  if axis_sizes is None:
    axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
  mesh_devices = mesh_utils.create_device_mesh(
      tuple(axis_sizes), devices=devices
  )
  return Mesh(mesh_devices, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
  """Sharding that splits the leading (batch) dim over `axis`."""
  return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = 'data'):
  """Places a pytree with leading batch dims onto the mesh, batch-sharded.

  Scalars/0-d leaves — and leaves whose batch dim does not divide the mesh
  axis — are replicated instead.
  """
  batch = batch_sharding(mesh, axis)
  replicated = replicated_sharding(mesh)
  axis_size = mesh.shape[axis]

  def put(x):
    x = jax.numpy.asarray(x)
    shardable = x.ndim >= 1 and x.shape[0] % axis_size == 0
    return jax.device_put(x, batch if shardable else replicated)

  return jax.tree_util.tree_map(put, tree)
