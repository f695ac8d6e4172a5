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
