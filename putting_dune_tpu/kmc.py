"""Batched kinetic-Monte-Carlo engine for dopant transitions.

TPU-first rewrite of the reference KMC inner loop
(/root/reference/putting_dune/graphene.py:646-694). The reference runs a
Python while-loop per control, materializing three successor AtomicGrids and
re-fitting an sklearn kNN on every iteration. Here the whole batch of
environments advances inside ONE ``jax.lax.while_loop``:

  * state is just the silicon site index (transitions relabel a site);
  * neighbor lookup is a static-table gather (O(1));
  * waiting times are sampled as Exp(1)/total_rate, clipped at 3600 s;
  * the successor neighbor is a categorical draw over the 3 rates;
  * environments that exhaust their dwell time are masked out, and the loop
    exits when every lane is done.

Because the loop body is batched, a learned neural rate function evaluates as
one (B, features) matmul per KMC event round — MXU-friendly — instead of B
separate tiny inferences.

Statistical semantics preserved exactly (same waiting-time law, same
transition acceptance rule elapsed + dt <= dwell, same clip): distributions
match the reference, not bitstreams.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from putting_dune_tpu import constants
from putting_dune_tpu import lattice as lattice_lib
from putting_dune_tpu import rates as rates_lib


class KMCResult(NamedTuple):
  """Outcome of applying one beam control to a batch of materials.

  Attributes:
    si_index: (B,) int32 final silicon site per environment.
    num_transitions: (B,) int32 events that fired during the dwell.
    event_times: (E, B) float32 times of the first E events (inf = no event);
      only populated when record_events > 0, else a (0, B) array.
    event_sites: (E, B) int32 site after each recorded event (-1 = none).
    truncated: (B,) bool — True where the env hit the max_events safety
      cap with dwell time still remaining (its physics was cut short; a
      well-behaved rate function never trips this).
  """

  si_index: jnp.ndarray
  num_transitions: jnp.ndarray
  event_times: jnp.ndarray
  event_sites: jnp.ndarray
  truncated: jnp.ndarray


def apply_control(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    offset: jnp.ndarray,
    theta: jnp.ndarray,
    si_index: jnp.ndarray,
    beam_position: jnp.ndarray,
    dwell_seconds: jnp.ndarray,
    rate_fn: rates_lib.RateFunction,
    *,
    record_events: int = 0,
    max_events: int | None = None,
) -> KMCResult:
  """Simulates one beam exposure on a batch of B environments.

  Args:
    key: PRNG key (consumed).
    lattice: static lattice (positions + neighbor table).
    offset: (B, 2) per-env lattice offset (material frame, angstroms).
    theta: (B,) per-env lattice rotation.
    si_index: (B,) int32 current silicon site.
    beam_position: (B, 2) beam position in the MATERIAL frame (angstroms).
    dwell_seconds: (B,) exposure duration.
    rate_fn: batched rate function (si_pos, neighbor_pos, beam_pos)->(B, 3).
    record_events: if > 0, record up to this many events per env (functional
      replacement for the reference observer hook observe_transition,
      simulator observers in microscope_utils.py:503-535).
    max_events: optional PER-ENV hard cap on KMC events (safety bound, the
      same intent as the reference's 3600 s waiting-time clip,
      graphene.py:667-668): an env that fires this many events during one
      dwell stops simulating and is flagged truncated. Bounds the batched
      while-loop against adversarial learned rate functions (huge rates
      would otherwise spin ~rate*dwell iterations for the whole batch).

  Returns:
    KMCResult with final silicon sites and event bookkeeping.
  """
  batch = si_index.shape[0]
  num_record = max(int(record_events), 0)

  event_times0 = jnp.full((num_record, batch), jnp.inf, dtype=jnp.float32)
  event_sites0 = jnp.full((num_record, batch), -1, dtype=jnp.int32)

  def cond(carry):
    _, _, _, active, _, _, _, _ = carry
    return jnp.any(active)

  # Loop-invariant pose trig, hoisted out of the while body.
  cos_t = jnp.cos(theta)
  sin_t = jnp.sin(theta)

  def body(carry):
    key, si, elapsed, active, count, trunc, ev_t, ev_s = carry
    key, k_draw = jax.random.split(key)

    # One fused gather+rotate for the silicon and its 3 neighbors.
    nbr_idx = lattice.neighbors[si]  # (B, 3)
    idx4 = jnp.concatenate([si[:, None], nbr_idx], axis=-1)  # (B, 4)
    canon = lattice.positions[idx4] + offset[:, None, :]  # (B, 4, 2)
    cx, cy = canon[..., 0], canon[..., 1]
    world = jnp.stack(
        [
            cx * cos_t[:, None] - cy * sin_t[:, None],
            cx * sin_t[:, None] + cy * cos_t[:, None],
        ],
        axis=-1,
    )
    si_pos, nbr_pos = world[:, 0, :], world[:, 1:, :]

    rates = rate_fn(si_pos, nbr_pos, beam_position)  # (B, 3)
    cum = jnp.cumsum(rates, axis=-1)  # (B, 3)
    total_rate = cum[:, -1]

    # One (B, 2) uniform block supplies both draws: the waiting time
    # -log(1-u0)/lambda ~ Exp(lambda) (same law as jax.random.exponential)
    # and the successor via inverse-CDF on the cumulative rates (exact
    # categorical; the reference draws rng.choice(p=rates/total),
    # graphene.py:679-688 — distribution parity, not stream parity).
    u = jax.random.uniform(k_draw, (batch, 2))
    dt = -jnp.log1p(-u[:, 0]) / total_rate
    dt = jnp.minimum(dt, constants.MAX_WAITING_TIME_SECONDS)
    new_elapsed = elapsed + dt

    # A transition fires if it lands within the dwell window
    # (reference graphene.py:677: elapsed_time <= control.dwell_time).
    fired = jnp.logical_and(active, new_elapsed <= dwell_seconds)

    choice = jnp.sum(
        (u[:, 1:] * total_rate[:, None]) >= cum[:, :2], axis=-1
    )
    new_si_candidate = jnp.take_along_axis(
        nbr_idx, choice[:, None], axis=-1
    )[:, 0]
    new_si = jnp.where(fired, new_si_candidate, si)
    new_count = count + fired.astype(jnp.int32)

    if num_record > 0:
      # Event k (0-based count before this transition) lands in slot k;
      # events beyond capacity are dropped (no slot matches).
      onehot = (
          jax.lax.broadcasted_iota(jnp.int32, (num_record, batch), 0)
          == count[None, :]
      )
      write = jnp.logical_and(onehot, fired[None, :])
      ev_t = jnp.where(write, new_elapsed[None, :], ev_t)
      ev_s = jnp.where(write, new_si[None, :], ev_s)

    # Keep looping only while strictly inside the dwell window
    # (reference graphene.py:658: while elapsed < dwell).
    new_active = jnp.logical_and(active, new_elapsed < dwell_seconds)
    if max_events is not None:
      # Per-lane safety cap: a lane that hit the cap with dwell remaining
      # stops simulating (flagged truncated) WITHOUT holding the rest of
      # the batch in the loop.
      hit_cap = new_count >= max_events
      trunc = jnp.logical_or(trunc, jnp.logical_and(new_active, hit_cap))
      new_active = jnp.logical_and(new_active, jnp.logical_not(hit_cap))
    elapsed = jnp.where(active, new_elapsed, elapsed)
    return key, new_si, elapsed, new_active, new_count, trunc, ev_t, ev_s

  init = (
      key,
      si_index,
      jnp.zeros((batch,), dtype=jnp.float32),
      dwell_seconds > 0.0,
      jnp.zeros((batch,), dtype=jnp.int32),
      jnp.zeros((batch,), dtype=bool),
      event_times0,
      event_sites0,
  )
  _, si_final, _, _, count, trunc, ev_t, ev_s = jax.lax.while_loop(
      cond, body, init
  )
  return KMCResult(
      si_index=si_final,
      num_transitions=count,
      event_times=ev_t,
      event_sites=ev_s,
      truncated=trunc,
  )


class MultiDopantKMCResult(NamedTuple):
  """Outcome for multi-dopant exposures.

  Attributes:
    si_indices: (B, D) int32 final dopant sites.
    num_transitions: (B,) int32 total events across all dopants.
    truncated: (B,) bool — True where the env hit the max_events safety
      cap with dwell time still remaining.
  """

  si_indices: jnp.ndarray
  num_transitions: jnp.ndarray
  truncated: jnp.ndarray


def apply_control_multi(
    key: jax.Array,
    lattice: lattice_lib.Lattice,
    offset: jnp.ndarray,
    theta: jnp.ndarray,
    si_indices: jnp.ndarray,
    beam_position: jnp.ndarray,
    dwell_seconds: jnp.ndarray,
    rate_fn: rates_lib.RateFunction,
    *,
    max_events: int | None = None,
) -> MultiDopantKMCResult:
  """KMC over D dopants per environment (stress-fidelity extension).

  The reference simulates exactly one dopant (PristineSingleDopedGraphene);
  this extends the same waiting-time law to D dopants: each KMC round
  evaluates all D dopants' neighbor rates, draws ONE exponential waiting
  time from the summed rate, and moves one (dopant, neighbor) pair chosen
  categorically — the standard multi-channel KMC. Moves onto sites
  occupied by another dopant are masked out (rate 0).

  Args:
    si_indices: (B, D) int32 current dopant sites.
    max_events: optional PER-ENV cap on total KMC events during the dwell
      (same safety semantics as apply_control): a lane that hits it stops
      simulating and is flagged truncated.
    Everything else as apply_control; beam_position (B, 2) material frame.

  Returns:
    MultiDopantKMCResult.
  """
  batch, num_dopants = si_indices.shape

  def cond(carry):
    _, _, _, active, _, _ = carry
    return jnp.any(active)

  def body(carry):
    key, si, elapsed, active, count, trunc = carry
    key, k_wait, k_choice = jax.random.split(key, 3)

    nbr_idx = lattice.neighbors[si]  # (B, D, 3)
    si_pos = lattice_lib.site_position(lattice, si, offset, theta)
    nbr_pos = lattice_lib.site_position(lattice, nbr_idx, offset, theta)

    def rates_for_dopant(si_pos_d, nbr_pos_d):
      return rate_fn(si_pos_d, nbr_pos_d, beam_position)

    rates = jax.vmap(
        rates_for_dopant, in_axes=(1, 1), out_axes=1
    )(si_pos, nbr_pos)  # (B, D, 3)

    # Mask moves onto occupied sites.
    occupied = (
        nbr_idx[..., None] == si[:, None, None, :]
    ).any(-1)  # (B, D, 3)
    rates = jnp.where(occupied, 0.0, rates)

    flat_rates = rates.reshape(batch, num_dopants * 3)
    total = jnp.sum(flat_rates, axis=-1)
    dt = jax.random.exponential(k_wait, (batch,)) / jnp.maximum(
        total, 1e-30
    )
    dt = jnp.minimum(dt, constants.MAX_WAITING_TIME_SECONDS)
    new_elapsed = elapsed + dt
    fired = jnp.logical_and(active, new_elapsed <= dwell_seconds)

    choice = jax.random.categorical(
        k_choice, jnp.log(jnp.maximum(flat_rates, 1e-30)), axis=-1
    )
    dopant = choice // 3
    neighbor = choice % 3
    target = jnp.take_along_axis(
        nbr_idx.reshape(batch, -1), choice[:, None], axis=-1
    )[:, 0]
    moved = jnp.where(
        (jnp.arange(num_dopants)[None, :] == dopant[:, None])
        & fired[:, None],
        target[:, None],
        si,
    )
    count = count + fired.astype(jnp.int32)
    active = jnp.logical_and(active, new_elapsed < dwell_seconds)
    if max_events is not None:
      hit_cap = count >= max_events
      trunc = jnp.logical_or(trunc, jnp.logical_and(active, hit_cap))
      active = jnp.logical_and(active, jnp.logical_not(hit_cap))
    elapsed = jnp.where(active | fired, new_elapsed, elapsed)
    return key, moved, elapsed, active, count, trunc

  init = (
      key,
      si_indices,
      jnp.zeros((batch,), jnp.float32),
      dwell_seconds > 0.0,
      jnp.zeros((batch,), jnp.int32),
      jnp.zeros((batch,), bool),
  )
  _, si_final, _, _, count, trunc = jax.lax.while_loop(cond, body, init)
  return MultiDopantKMCResult(
      si_indices=si_final, num_transitions=count, truncated=trunc
  )
