"""Multi-process data-parallel plumbing (parallel/mesh.py).

Runs single-process on the 8-device virtual CPU mesh (conftest). The
multihost assembly path (host_local_array_to_global_array) is exercised
directly and asserted numerically identical to the plain shard_batch path,
matching the reference's multi-host pattern
(image_alignment/train.py:384-391, dataset.py:127,144-147).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putting_dune_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope='module')
def mesh():
  return mesh_lib.make_mesh()


def test_initialize_distributed_is_noop_single_process():
  # No cluster environment: must not raise, must leave process_count at 1.
  mesh_lib.initialize_distributed()
  assert jax.process_count() == 1


def test_process_local_batch_size_single_process():
  assert mesh_lib.process_local_batch_size(32) == 32


def test_process_data_seed_identity_single_process():
  # Bit-for-bit identical data streams to the non-distributed path.
  assert mesh_lib.process_data_seed(7) == 7
  assert mesh_lib.process_data_seed(0) == 0


def test_global_batch_matches_shard_batch(mesh):
  batch = {
      'image': np.arange(16 * 4 * 4, dtype=np.float32).reshape(16, 4, 4),
      'label': np.arange(16, dtype=np.int32),
      'scalar': np.float32(3.0),
  }
  a = mesh_lib.shard_batch(batch, mesh)
  b = mesh_lib.global_batch(batch, mesh)
  c = mesh_lib.global_batch_multihost(batch, mesh)
  for k in batch:
    np.testing.assert_array_equal(jax.device_get(a[k]), jax.device_get(b[k]))
    np.testing.assert_array_equal(jax.device_get(a[k]), jax.device_get(c[k]))
  # Batch-dim leaves end up sharded over 'data'; scalars replicated.
  assert not c['image'].sharding.is_fully_replicated
  assert c['scalar'].sharding.is_fully_replicated


def test_train_step_losses_identical_via_both_paths(mesh):
  """The global-array path must produce identical losses to shard_batch."""
  from putting_dune_tpu.atom_detection import train as det_train

  config = det_train.Config(
      workdir='/tmp/unused', image_size=32, features=(4, 8), batch_size=16
  )
  key = jax.random.PRNGKey(0)
  batch_np = {
      'image': np.asarray(
          jax.random.uniform(key, (16, 32, 32, 1)), np.float32
      ),
      'mask': np.asarray(
          jax.nn.one_hot(
              jax.random.randint(jax.random.PRNGKey(1), (16, 32, 32), 0, 3),
              3,
          ),
          np.float32,
      ),
  }

  losses = []
  for put in (mesh_lib.shard_batch, mesh_lib.global_batch_multihost):
    state = det_train.create_state(config, mesh)
    for _ in range(3):
      state, metrics = det_train.train_step(state, put(batch_np, mesh))
    losses.append(float(jax.device_get(metrics['loss'])))
  np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_perception_loops_use_local_batch_and_global_assembly(mesh, tmp_path):
  """One tiny epoch of each perception train loop through the new path."""
  from putting_dune_tpu.atom_detection import train as det_train

  config = det_train.Config(
      workdir=str(tmp_path / 'det'),
      image_size=32,
      features=(4, 8),
      batch_size=8,
      epochs=1,
      steps_per_epoch=2,
      eval_steps=1,
      grid_columns=10,
  )
  state = det_train.train(config, mesh=mesh)
  assert state.step == 2


def test_ppo_mesh_training_matches_single_controller(mesh):
  """Data-parallel PPO (env batch sharded over 'data', replicated params)
  produces the same losses as the unsharded single-controller path —
  sharding is a placement decision, not a semantic one."""
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu.agents import ppo
  from putting_dune_tpu.env import env as env_lib

  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(10), batch_size=16
  )
  config = ppo.PPOConfig(
      num_updates=3, rollout_length=4, num_minibatches=2,
      num_epochs=1, hidden=(16,),
  )

  losses = []
  for m in (None, mesh):
    init_carry, run_updates, _ = ppo.make_train_fns(env, config, mesh=m)
    carry, metrics = jax.jit(run_updates, static_argnums=(1,))(
        init_carry(jax.random.PRNGKey(3)), 3
    )
    losses.append(np.asarray(metrics['loss']))
  np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4, atol=1e-6)


def test_ppo_dryrun_mesh_training_step(mesh):
  from putting_dune_tpu.agents import ppo

  ppo.dryrun_mesh_training_step(list(mesh.devices.flat))


def test_parse_mesh_spec(mesh):
  del mesh
  assert mesh_lib.parse_mesh_spec('') is None
  assert mesh_lib.parse_mesh_spec(None) is None
  full = mesh_lib.parse_mesh_spec('data')
  assert full.shape['data'] == len(jax.devices())
  small = mesh_lib.parse_mesh_spec('data:2')
  assert small.shape['data'] == 2
  with pytest.raises(ValueError, match='data'):
    mesh_lib.parse_mesh_spec('model:2')
  with pytest.raises(ValueError, match='devices'):
    mesh_lib.parse_mesh_spec('data:4096')


def test_evaluate_batched_sharded_matches_unsharded(mesh):
  """evaluate_batched(mesh=...) shards the suite over 'data' and must
  return the SAME per-seed results as the single-device program (the
  rollout math is batch-parallel; sharding only changes placement)."""
  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu import rates
  from putting_dune_tpu.env import env as env_lib

  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(20),
      batch_size=16,
      rate_fn=rates.simple_canonical_rates,
  )
  seeds = list(range(16))

  def policy(key, obs):
    del key
    # Deterministic goal-seeking: move toward the goal delta (the
    # trailing two features), so some episodes terminate.
    return jnp.clip(obs[..., -2:], -1.0, 1.0)

  sharded = eval_lib.evaluate_batched(env, policy, seeds, mesh=mesh)
  unsharded = eval_lib.evaluate_batched(env, policy, seeds)
  assert len(sharded) == len(unsharded) == 16
  for s, u in zip(sharded, unsharded):
    assert s.seed == u.seed
    assert s.reached_goal == u.reached_goal
    assert s.num_actions_taken == u.num_actions_taken
    np.testing.assert_allclose(
        s.total_reward, u.total_reward, rtol=1e-5, atol=1e-6
    )

  with pytest.raises(ValueError, match='video'):
    eval_lib.evaluate_batched(
        env, policy, seeds, mesh=mesh, video_save_dir='/tmp/x'
    )


def test_evaluate_batched_image_env_sharded_matches_unsharded(mesh):
  """IMAGE-observation env under the mesh: the heaviest per-step kernels
  (MXU splat + noise chain + CLAHE) run under GSPMD with the batch
  sharded over 'data'; per-seed results must equal the single-device
  program."""
  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu import simulator as simulator_lib
  from putting_dune_tpu.env import env as env_lib
  from putting_dune_tpu.env import features as features_lib

  batch = len(jax.devices())
  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(20),
      features=features_lib.ImageFeatures(image_size=32),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(
              grid_columns=20, image_size=64
          ),
          step_limit=3,
      ),
      batch_size=batch,
  )

  def policy(key, obs):
    del key
    return jnp.clip(obs['goal_delta_angstroms'], -1.0, 1.0)

  seeds = list(range(batch))
  sharded = eval_lib.evaluate_batched(env, policy, seeds, mesh=mesh)
  unsharded = eval_lib.evaluate_batched(env, policy, seeds)
  assert len(sharded) == len(unsharded) == batch
  for s, u in zip(sharded, unsharded):
    assert s.seed == u.seed
    assert s.reached_goal == u.reached_goal
    assert s.num_actions_taken == u.num_actions_taken
    np.testing.assert_allclose(
        s.total_reward, u.total_reward, rtol=1e-5, atol=1e-6
    )


def test_evaluate_batched_stateful_drift_policy_sharded_matches_unsharded(
    mesh,
):
  """A STATEFUL drift-corrected policy (per-env tracker pstate threaded
  through the episode loop) over a drifting image env, sharded vs not."""
  from putting_dune_tpu import eval_lib
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu import simulator as simulator_lib
  from putting_dune_tpu.agents import drift_correction as dc
  from putting_dune_tpu.env import env as env_lib
  from putting_dune_tpu.env import features as features_lib

  batch = len(jax.devices())
  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(20),
      features=features_lib.ImageFeatures(image_size=32, include_fov=True),
      config=env_lib.EnvConfig(
          sim=simulator_lib.SimulatorConfig(
              grid_columns=20, image_size=64,
              drift_per_frame_angstroms=0.5,
          ),
          step_limit=3,
      ),
      batch_size=batch,
  )

  def base(key, obs):
    del key
    return jnp.zeros((obs['image'].shape[0], 2), jnp.float32)

  policy = dc.DriftCorrectedPolicy(base)
  seeds = list(range(batch))
  sharded = eval_lib.evaluate_batched(env, policy, seeds, mesh=mesh)
  unsharded = eval_lib.evaluate_batched(env, policy, seeds)
  for s, u in zip(sharded, unsharded):
    assert s.seed == u.seed
    assert s.num_actions_taken == u.num_actions_taken
    np.testing.assert_allclose(
        s.total_reward, u.total_reward, rtol=1e-5, atol=1e-6
    )


def _single_process_reference_run():
  """The multihost workers' exact workload, run single-process (8 devices)."""
  from putting_dune_tpu.atom_detection import train as det_train

  mesh = mesh_lib.make_mesh()
  image = np.asarray(
      jax.random.uniform(jax.random.PRNGKey(0), (16, 32, 32, 1)), np.float32
  )
  mask = np.asarray(
      jax.nn.one_hot(
          jax.random.randint(jax.random.PRNGKey(1), (16, 32, 32), 0, 3), 3
      ),
      np.float32,
  )
  batch = mesh_lib.global_batch({'image': image, 'mask': mask}, mesh)
  global_sum = float(image.sum() + mask.sum())
  config = det_train.Config(
      workdir='/tmp/unused', image_size=32, features=(4, 8), batch_size=16
  )
  state = det_train.create_state(config, mesh)
  losses = []
  for _ in range(3):
    state, metrics = det_train.train_step(state, batch)
    losses.append(float(jax.device_get(metrics['loss'])))
  return global_sum, losses


def test_multihost_two_process_training():
  """The multi-host path ACTUALLY running with jax.process_count() == 2.

  Two subprocesses (tests/multihost_worker.py) form a 2-process x
  4-virtual-CPU-device cluster via jax.distributed.initialize and exercise
  every process_index-dependent branch in parallel/mesh.py for real:
  per-process data seeds differ, process_local_batch_size splits the
  global batch, global_batch assembles host-local shards into one global
  array (verified by a cross-process reduction), and three UNet train
  steps produce losses identical to the single-process 8-device run.
  Mirrors the reference's multi-host surface
  (image_alignment/train.py:384-391, dataset.py:144-147), which the
  reference itself never tests.
  """
  import json
  import os
  import pathlib
  import socket
  import subprocess
  import sys

  worker = pathlib.Path(__file__).resolve().parent / 'multihost_worker.py'
  with socket.socket() as s:
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]

  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
  # Strip any axon PJRT site hook: workers must be pure-CPU.
  env.pop('PYTHONPATH', None)

  procs = [
      subprocess.Popen(
          [sys.executable, str(worker), str(i), str(port)],
          stdout=subprocess.PIPE,
          stderr=subprocess.STDOUT,
          text=True,
          env=env,
      )
      for i in range(2)
  ]
  outputs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=300)
      outputs.append(out)
  except subprocess.TimeoutExpired:
    for p in procs:
      p.kill()
    pytest.skip('multihost workers timed out (contended host)')

  results = {}
  for out in outputs:
    lines = [l for l in out.splitlines() if l.startswith('RESULT ')]
    assert lines, f'worker produced no RESULT:\n{out[-3000:]}'
    r = json.loads(lines[-1][len('RESULT '):])
    results[r['pid']] = r
  r0, r1 = results[0], results[1]

  # The cluster actually formed.
  assert r0['process_count'] == 2 and r1['process_count'] == 2
  assert r0['device_count'] == 8
  assert r0['local_device_count'] == 4

  # Disjoint per-process data streams; correct local batch sizing.
  assert r0['data_seed'] != r1['data_seed']
  assert r0['local_batch'] == r1['local_batch'] == 8

  # Both processes see the SAME correctly-assembled global array.
  expected_sum, expected_losses = _single_process_reference_run()
  np.testing.assert_allclose(r0['global_sum'], expected_sum, rtol=1e-5)
  np.testing.assert_allclose(r1['global_sum'], expected_sum, rtol=1e-5)

  # Training over the 2-process cluster == single-process 8-device run.
  np.testing.assert_allclose(r0['losses'], r1['losses'], rtol=1e-6)
  np.testing.assert_allclose(
      r0['losses'], expected_losses, rtol=1e-5, atol=1e-7
  )


def test_train_and_save_mesh_smoke(mesh, tmp_path):
  """train_ppo's --mesh path: a tiny data-parallel train_and_save run
  produces a loadable checkpoint (sharded-vs-single equivalence of the
  underlying step is covered by test_ppo_mesh_training_matches_...)."""
  from putting_dune_tpu import lattice as lattice_lib
  from putting_dune_tpu.agents import ppo
  from putting_dune_tpu.env import env as env_lib

  env = env_lib.PuttingDuneEnv(
      lattice=lattice_lib.make_lattice(10), batch_size=16
  )
  config = ppo.PPOConfig(
      num_updates=2, rollout_length=4, num_epochs=1, num_minibatches=2,
      hidden=(16,),
  )
  agent, metrics = ppo.train_and_save(
      env, str(tmp_path / 'policy'), config=config, mesh=mesh
  )
  assert np.isfinite(metrics['loss']).all()
  from putting_dune_tpu.agents import eval_agent as eval_agent_lib

  loaded = eval_agent_lib.EvalAgent.load(str(tmp_path / 'policy'))
  assert loaded is not None
