"""Collective helpers for custom shard_map sections.

Most cross-chip communication in this framework is implicit: the train step
runs under jit with GSPMD shardings, so gradient psums over ``data`` and any
resharding collectives are inserted by XLA (this replaces the reference's
NCCL allreduce under Lightning DDP, train_lce.py:89-91). Explicit collectives
are only needed inside shard_map bodies; these helpers cover the recurring
patterns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pacednegatives_tpu.parallel.mesh import DATA_AXIS


def gather_batch(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """(local_B, ...) -> (global_B, ...): concatenate per-chip batch shards.

    Used for cross-chip pool union — e.g. sharing per-chip mined negative
    doc ids so every query can sample from the n_chips-times-larger pool
    ("large effective in-batch pools" over ICI, SURVEY.md §2.6)."""
    g = jax.lax.all_gather(x, axis_name)  # (n_chips, local_B, ...)
    return g.reshape((-1,) + x.shape[1:])


def global_mean(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """Mean over all chips' values (per-step metric aggregation)."""
    return jax.lax.pmean(x, axis_name)


def global_sum(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    return jax.lax.psum(x, axis_name)


def merge_topk(
    local_scores: jax.Array,  # (B, k) this chip's candidates
    local_idx: jax.Array,  # (B, k) global doc indices
    k: int,
    axis_name: str = DATA_AXIS,
) -> tuple[jax.Array, jax.Array]:
    """All-gather per-chip top-k candidates and take the global top-k.

    The k*n_chips candidate merge is tiny next to the N-dimensional scoring,
    so the ICI cost is negligible (index/dense.py uses this pattern)."""
    n = jax.lax.axis_size(axis_name)
    vs = jax.lax.all_gather(local_scores, axis_name)  # (n, B, k)
    is_ = jax.lax.all_gather(local_idx, axis_name)
    B = local_scores.shape[0]
    vs = jnp.moveaxis(vs, 0, 1).reshape(B, n * local_scores.shape[1])
    is_ = jnp.moveaxis(is_, 0, 1).reshape(B, n * local_idx.shape[1])
    v, pos = jax.lax.top_k(vs, k)
    return v, jnp.take_along_axis(is_, pos, axis=1)
