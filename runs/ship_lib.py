"""Shared ship-tool helpers (bf16 probe + ship/prune).

Used by runs/ship_detector.py and runs/ship_aligner.py so the probe gate
and ship/prune sequence can't drift apart between the two head-to-head
tools (that drift already produced one arch-resolution bug).
"""

import os
import shutil

import jax


def bf16_cast(params):
  """Casts every array leaf of a params pytree to bfloat16."""
  return jax.tree_util.tree_map(
      lambda x: x.astype('bfloat16') if hasattr(x, 'astype') else x, params
  )


def probe_bf16(params, candidate_dir, save_fn, eval_fn):
  """Saves a bf16 cast of params to a temp workdir and evals it there.

  Returns (bf16_params, bf16_metric). The caller owns the adoption
  decision (metric direction and tolerance differ per domain); the temp
  probe dir is always cleaned up.
  """
  bf16 = bf16_cast(params)
  tmp = os.path.join(candidate_dir, '_bf16_probe')
  os.makedirs(tmp, exist_ok=True)
  try:
    save_fn(bf16, tmp)
    metric = eval_fn(tmp)
  finally:
    shutil.rmtree(tmp, ignore_errors=True)
  return bf16, metric


def ship(params, incumbent_dir, save_fn):
  """Replaces the incumbent artifact with params and prunes checkpoints.

  save_fn(params, workdir) must write params.msgpack (+ arch.json when
  given a config — the caller binds that via functools.partial).
  Returns the written artifact path.
  """
  stale = os.path.join(incumbent_dir, 'params.msgpack')
  if os.path.exists(stale):
    os.remove(stale)
  path = save_fn(params, incumbent_dir)
  shutil.rmtree(
      os.path.join(incumbent_dir, 'checkpoints'), ignore_errors=True
  )
  return path
