"""Dataclass-driven CLI helper for the training entry points.

The reference parses every entry point's Args dataclass with absl +
`eapp.make_flags_parser` (reference eval.py:31-37,90-91) or
simple_parsing (atom_detection/train.py:53-67). Here one argparse-backed
helper covers the same pattern, plus the multi-process flags every train
CLI needs on a TPU pod slice (`--coordinator_address`, `--num_processes`,
`--process_id` -> jax.distributed.initialize via
parallel.mesh.initialize_distributed).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any, Callable


def _add_field_arg(parser: argparse.ArgumentParser, field) -> None:
  name = f'--{field.name}'
  default = (
      field.default
      if field.default is not dataclasses.MISSING
      else (
          field.default_factory()
          if field.default_factory is not dataclasses.MISSING
          else dataclasses.MISSING
      )
  )
  if isinstance(default, bool):
    parser.add_argument(
        name, action=argparse.BooleanOptionalAction, default=default
    )
  elif isinstance(default, tuple):
    elem = type(default[0]) if default else float
    parser.add_argument(
        name,
        type=lambda s, elem=elem: tuple(elem(v) for v in s.split(',')),
        default=default,
        help='comma-separated',
    )
  elif default is dataclasses.MISSING:
    parser.add_argument(name, required=True)
  elif default is None:
    if 'tuple' in str(field.type).lower():
      parser.add_argument(
          name,
          type=lambda s: tuple(float(v) for v in s.split(',')),
          default=None,
          help='comma-separated',
      )
    else:
      parser.add_argument(name, default=None)
  else:
    parser.add_argument(name, type=type(default), default=default)


def run_train_cli(
    config_cls: type,
    train_fn: Callable[..., Any],
    description: str,
) -> None:
  """Parses `config_cls` fields as flags and runs `train_fn(config)`.

  Adds multi-process flags; when any is given (or a cluster environment is
  autodetected), the process joins the distributed runtime before touching
  devices, so the mesh spans every host's chips.
  """
  parser = argparse.ArgumentParser(description=description)
  for field in dataclasses.fields(config_cls):
    _add_field_arg(parser, field)
  parser.add_argument('--coordinator_address', default=None)
  parser.add_argument('--num_processes', type=int, default=None)
  parser.add_argument('--process_id', type=int, default=None)
  ns = vars(parser.parse_args())

  coordinator = ns.pop('coordinator_address')
  num_processes = ns.pop('num_processes')
  process_id = ns.pop('process_id')

  # Join the multi-process runtime BEFORE any jax device use.
  from putting_dune_tpu.parallel import mesh as mesh_lib

  mesh_lib.initialize_distributed(
      coordinator_address=coordinator,
      num_processes=num_processes,
      process_id=process_id,
  )

  import jax

  config = config_cls(**ns)

  def progress(epoch, summary):
    if jax.process_index() == 0:
      items = ' '.join(f'{k}={v:.5f}' for k, v in summary.items())
      print(f'epoch {epoch}: {items}', flush=True)

  train_fn(config, progress=progress)
