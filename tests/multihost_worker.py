"""Worker process for the REAL multi-host test (test_parallel.py).

Launched twice by test_multihost_two_process_training with
`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4`,
forming a 2-process x 4-device cluster (8 global devices) — the first
execution of parallel/mesh.py's process_index-dependent branches with
`jax.process_count() > 1`. Mirrors the reference's multi-host surface:
per-process data shards (image_alignment/dataset.py:144-147) and
host-local -> global assembly (image_alignment/train.py:384-391).

Usage: python tests/multihost_worker.py <process_id> <coordinator_port>
Prints one `RESULT {json}` line on success.
"""

import json
import pathlib
import sys

PROCESS_ID = int(sys.argv[1])
PORT = sys.argv[2]
NUM_PROCESSES = 2
GLOBAL_BATCH = 16

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

try:  # default on modern jax; keep explicit for clarity
  jax.config.update('jax_cpu_collectives_implementation', 'gloo')
except Exception:  # noqa: BLE001 — config name varies across versions
  pass

from putting_dune_tpu.parallel import mesh as mesh_lib  # noqa: E402

mesh_lib.initialize_distributed(
    coordinator_address=f'127.0.0.1:{PORT}',
    num_processes=NUM_PROCESSES,
    process_id=PROCESS_ID,
)

import numpy as np  # noqa: E402

from putting_dune_tpu.atom_detection import train as det_train  # noqa: E402

out = {
    'pid': PROCESS_ID,
    'process_count': jax.process_count(),
    'device_count': jax.device_count(),
    'local_device_count': jax.local_device_count(),
    'data_seed': mesh_lib.process_data_seed(7),
    'local_batch': mesh_lib.process_local_batch_size(GLOBAL_BATCH),
}

mesh = mesh_lib.make_mesh()

# The same deterministic global batch the single-process twin builds
# in-process (test_parallel.py); THIS process materializes only its shard.
image = np.asarray(
    jax.random.uniform(jax.random.PRNGKey(0), (GLOBAL_BATCH, 32, 32, 1)),
    np.float32,
)
mask = np.asarray(
    jax.nn.one_hot(
        jax.random.randint(
            jax.random.PRNGKey(1), (GLOBAL_BATCH, 32, 32), 0, 3
        ),
        3,
    ),
    np.float32,
)
lo = PROCESS_ID * out['local_batch']
hi = lo + out['local_batch']
local = {'image': image[lo:hi], 'mask': mask[lo:hi]}
batch = mesh_lib.global_batch(local, mesh)

# Cross-process reduction over the assembled global arrays.
global_sum = jax.jit(
    lambda t: t['image'].sum() + t['mask'].sum(),
    out_shardings=mesh_lib.replicated_sharding(mesh),
)(batch)
out['global_sum'] = float(jax.device_get(global_sum))

config = det_train.Config(
    workdir='/tmp/unused', image_size=32, features=(4, 8),
    batch_size=GLOBAL_BATCH,
)
state = det_train.create_state(config, mesh)
losses = []
for _ in range(3):
  state, metrics = det_train.train_step(state, batch)
  losses.append(float(jax.device_get(metrics['loss'])))
out['losses'] = losses

print('RESULT ' + json.dumps(out))
