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


def parse_mesh_spec(spec: Optional[str]) -> Optional[Mesh]:
  """Parses a CLI mesh spec into a Mesh: '' / None -> None (single
  device program, no sharding), 'data' -> 1-D mesh over ALL devices,
  'data:N' -> 1-D mesh over the first N devices.

  The CLI surface for data-parallel training/eval (train_ppo --mesh,
  eval --mesh); richer layouts (ensemble 'model' axis) are built
  programmatically with make_mesh.
  """
  if not spec:
    return None
  name, _, size = spec.partition(':')
  if name != 'data':
    raise ValueError(
        f"Unknown mesh axis {name!r} in spec {spec!r}; the CLI supports "
        "'data' or 'data:N'."
    )
  if not size:
    return make_mesh()
  n = int(size)
  devices = jax.devices()
  if n < 1 or n > len(devices):
    raise ValueError(
        f'mesh spec {spec!r} wants {n} devices; {len(devices)} available'
    )
  return make_mesh([n], ('data',), devices=devices[:n])


# --- multi-process (multi-host) support --------------------------------------
#
# On a TPU pod slice JAX runs one process per host, each owning its local
# chips; `jax.distributed.initialize` wires them into one logical runtime.
# The reference's equivalents: per-process dataset shards
# (grain.ShardByJaxProcess, atom_detection/dataset.py:100,111;
# image_alignment/dataset.py:127,144-147) and host-local -> global array
# assembly (multihost_utils.host_local_array_to_global_array,
# image_alignment/train.py:384-391). This framework generates training data
# on device, so "dataset sharding" is RNG-stream sharding: each process
# folds its process_index into the data key and generates
# global_batch // process_count examples.


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
  """Entry hook for multi-process runs (one call per train CLI, before any
  device use).

  With explicit args, wires this process into the multi-process runtime.
  With no args it defers to environment autodetection (TPU pod metadata /
  cluster env vars) and is a silent no-op when none is present or when the
  runtime is already initialized — so single-host invocations need no
  special-casing.
  """
  try:
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
  except (ValueError, RuntimeError) as e:
    if coordinator_address or num_processes or process_id:
      raise
    # No cluster environment detected / already initialized: single-process.
    del e


def process_local_batch_size(global_batch_size: int) -> int:
  """This process's share of a global batch (reference per-process grain
  shards, image_alignment/dataset.py:144-147)."""
  count = jax.process_count()
  if global_batch_size % count:
    raise ValueError(
        f'global batch {global_batch_size} not divisible by '
        f'process count {count}'
    )
  return global_batch_size // count


def process_data_seed(seed: int) -> int:
  """Derives a per-process data seed for disjoint generated-data streams.

  Single-process returns `seed` unchanged (bit-for-bit identical streams to
  the non-distributed path); multi-process folds the process index in.
  """
  if jax.process_count() == 1:
    return seed
  folded = jax.random.fold_in(
      jax.random.PRNGKey(seed), jax.process_index()
  )
  return int(np.asarray(jax.random.key_data(folded))[0])


def global_batch(tree, mesh: Mesh, axis: str = 'data'):
  """Assembles a process-local batch into global batch-sharded arrays.

  Each process passes its local (local_batch, ...) arrays; the result is a
  logical (global_batch, ...) array sharded over `axis`, exactly what the
  jitted train step consumes. Single-process this is identical to
  `shard_batch`. Mirrors multihost_utils.host_local_array_to_global_array
  in the reference (image_alignment/train.py:384-391).
  """
  if jax.process_count() == 1:
    return shard_batch(tree, mesh, axis)
  return global_batch_multihost(tree, mesh, axis)


def global_batch_multihost(tree, mesh: Mesh, axis: str = 'data'):
  """The multihost_utils assembly path of `global_batch`, unconditionally.

  Exposed separately so single-process tests can assert it is numerically
  identical to `shard_batch` (with process_count==1 the host-local batch IS
  the global batch).
  """
  from jax.experimental import multihost_utils

  axis_size = mesh.shape[axis]

  def spec_for(x):
    x = np.asarray(x)
    local = x.ndim >= 1 and (x.shape[0] * jax.process_count()) % axis_size == 0
    return P(axis) if local else P()

  specs = jax.tree_util.tree_map(spec_for, tree)
  return multihost_utils.host_local_array_to_global_array(tree, mesh, specs)
