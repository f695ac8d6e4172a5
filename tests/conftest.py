"""Test configuration: force a virtual 8-device CPU mesh.

Tests never use the real TPU. The environment boots every interpreter with
an `axon` PJRT plugin (sitecustomize imports jax and registers it before any
user code runs), so setting JAX_PLATFORMS here is too late — instead we
switch platforms through jax.config before any backend is instantiated.
XLA_FLAGS is read lazily at CPU-backend creation, so forcing 8 host devices
here still works; sharding tests rely on it to compile and execute
multi-chip layouts on CPU.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8'
  ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Shared persistent compilation cache: the suite runs one fresh
# interpreter per file (run_tests.py) and many files jit near-identical
# programs; a warm on-disk cache cuts the serial suite from ~18-30 min to
# well under 10 (e.g. test_env.py alone: 95 s cold -> 18 s warm). The
# cache only changes compile time, never results; writes are atomic, so
# concurrent -j runs are safe. Override the location with
# JAX_COMPILATION_CACHE_DIR; set PDT_NO_COMPILE_CACHE=1 to disable.
if not os.environ.get('PDT_NO_COMPILE_CACHE'):
  _cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR') or os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      '.jax_cache',
  )
  jax.config.update('jax_compilation_cache_dir', _cache_dir)
  jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.4)
