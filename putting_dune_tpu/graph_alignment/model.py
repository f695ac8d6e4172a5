"""GNN drift aligner over multi-frame atom point clouds.

Capability parity with the reference graph aligner
(graph_alignment/model.py:44-364): a message-passing graph network over
point clouds (the reference composes jraph GraphNetwork blocks over jax-md
sparse neighbor lists) with a global drift head and a per-node local head.
Neither jraph nor jax-md is a dependency here; the network is native flax
with STATIC shapes — fixed node capacity + mask and a fixed k-NN edge
table built with top_k — so it jits cleanly on TPU.

Input: a stack of T frames of (possibly drifted) atom positions forming one
graph; frames are distinguished by a one-hot frame feature. Outputs:
  * global: (T, 2) estimated drift of each frame relative to the last;
  * local: (N, 2) per-node residual displacement (jitter).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def knn_edges(
    positions: jnp.ndarray, mask: jnp.ndarray, k: int
) -> jnp.ndarray:
  """Static k-NN edge table: (N, k) int32 neighbor indices.

  Invalid nodes connect to themselves (their messages are masked out).
  """
  n = positions.shape[0]
  d2 = jnp.sum(
      jnp.square(positions[:, None, :] - positions[None, :, :]), axis=-1
  )
  d2 = d2 + jnp.where(mask[None, :], 0.0, jnp.inf)
  d2 = d2 + jnp.eye(n) * 1e9  # exclude self
  _, idx = jax.lax.top_k(-d2, k)
  return idx


class _MLP(nn.Module):
  widths: Sequence[int]

  @nn.compact
  def __call__(self, x):
    for i, w in enumerate(self.widths):
      x = nn.Dense(w)(x)
      if i + 1 < len(self.widths):
        x = nn.silu(x)
    return x


class MessagePassingLayer(nn.Module):
  """One edge->node message-passing round with residual + LayerNorm."""

  width: int = 64
  k: int = 8

  @nn.compact
  def __call__(self, nodes, positions, edge_idx, mask):
    n, k = edge_idx.shape
    senders = nodes[edge_idx]  # (N, k, F)
    rel = positions[edge_idx] - positions[:, None, :]  # (N, k, 2)
    dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    receivers = jnp.broadcast_to(nodes[:, None, :], senders.shape)
    edge_in = jnp.concatenate([senders, receivers, rel, dist], axis=-1)
    messages = _MLP([self.width, self.width])(edge_in)  # (N, k, W)

    valid = mask[edge_idx] & mask[:, None]  # (N, k)
    messages = jnp.where(valid[..., None], messages, 0.0)
    agg = messages.sum(axis=1) / jnp.maximum(
        valid.sum(axis=1, keepdims=True), 1.0
    )

    update = _MLP([self.width, self.width])(
        jnp.concatenate([nodes, agg], axis=-1)
    )
    out = nn.LayerNorm()(update)
    if nodes.shape[-1] == out.shape[-1]:
      out = out + nodes
    return out


class AlignmentGraphNetwork(nn.Module):
  """Stacked message passing + global drift / local jitter heads."""

  num_frames: int = 2
  width: int = 64
  num_layers: int = 3
  k: int = 8

  @nn.compact
  def __call__(
      self,
      positions: jnp.ndarray,  # (N, 2) all frames' atoms, angstroms
      frame_ids: jnp.ndarray,  # (N,) int32 frame index per node
      atomic_numbers: jnp.ndarray,  # (N,) int32
      mask: jnp.ndarray,  # (N,) bool
  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    centered = positions - jnp.where(
        mask[:, None], positions, 0.0
    ).sum(0) / jnp.maximum(mask.sum(), 1.0)

    frame_onehot = jax.nn.one_hot(frame_ids, self.num_frames)
    z = (atomic_numbers.astype(jnp.float32) / 14.0)[:, None]
    nodes = _MLP([self.width])(
        jnp.concatenate([centered, frame_onehot, z], axis=-1)
    )

    edge_idx = knn_edges(positions, mask, self.k)
    for _ in range(self.num_layers):
      nodes = MessagePassingLayer(width=self.width, k=self.k)(
          nodes, positions, edge_idx, mask
      )

    # Global head: per-frame masked mean pooling -> per-frame drift.
    frame_mask = (
        frame_onehot * mask[:, None].astype(jnp.float32)
    )  # (N, T)
    pooled = jnp.einsum('nf,nt->tf', nodes, frame_mask) / jnp.maximum(
        frame_mask.sum(0)[:, None], 1.0
    )  # (T, W)
    global_out = _MLP([self.width, 2])(pooled)  # (T, 2)

    # Local head: per-node residual displacement.
    local_out = _MLP([self.width, 2])(nodes)  # (N, 2)
    return global_out, local_out


def batched_apply(module: AlignmentGraphNetwork, params, batch):
  """vmapped apply over a batch dict of stacked graphs."""

  def single(positions, frame_ids, atomic_numbers, mask):
    return module.apply(
        {'params': params}, positions, frame_ids, atomic_numbers, mask
    )

  return jax.vmap(single)(
      batch['positions'], batch['frame_ids'], batch['atomic_numbers'],
      batch['mask'],
  )
