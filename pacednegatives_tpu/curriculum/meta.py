"""Bilevel meta-learned per-example weight table.

Parity: ``Weights`` (reference weights.py:80-94) + StdWrapper / NewWrapper
(pairwrapper.py:91-284). A (num_batches, batch_size) table of example
weights, initialized to 1. Each step, the weights v for batch j are updated
by one SGD step on

    sum(pce*v)/B + sum(nce*v)/B - sum(v)

evaluated either on the frozen model (NewWrapper, pairwrapper.py:219-239 —
closed form: dL/dv = (pce+nce)/B - 1) or through a *virtual* model update
(StdWrapper, pairwrapper.py:102-151 — gradient flows through
theta' = theta - lr * d/dtheta[weighted CE]). The updated raw value is
squashed by sigmoid before being stored (weights.py:86-88).

The virtual-update gradient needs model applies, so it lives in
train/step.py (make_meta_train_step); this module owns the table state.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MetaState(NamedTuple):
    table: jax.Array  # (num_batches, batch_size) fp32


@dataclasses.dataclass(frozen=True)
class MetaWeightTable:
    num_batches: int
    batch_size: int

    def init(self) -> MetaState:
        return MetaState(
            table=jnp.ones((self.num_batches, self.batch_size), jnp.float32)
        )

    def lookup(self, state: MetaState, j: jax.Array) -> jax.Array:
        """Weights v for batch j: (batch_size,)."""
        return jax.lax.dynamic_index_in_dim(
            state.table, j, axis=0, keepdims=False
        )

    def store(self, state: MetaState, j: jax.Array, raw_v: jax.Array) -> MetaState:
        """Store sigmoid(raw_v) at row j (reference set_weight applies
        sigmoid, weights.py:86-88)."""
        new = jax.nn.sigmoid(raw_v)
        table = jax.lax.dynamic_update_index_in_dim(
            state.table, new, j, axis=0
        )
        return MetaState(table=table)

    @staticmethod
    def cheap_update(
        v: jax.Array, pce: jax.Array, nce: jax.Array, lr: jax.Array
    ) -> jax.Array:
        """NewWrapper update (pairwrapper.py:219-239): one explicit-gradient
        SGD step on the frozen-model weighted objective.

        d/dv [sum(pce*v)/B + sum(nce*v)/B - sum(v)] = (pce+nce)/B - 1
        """
        B = v.shape[0]
        grad = (pce + nce) / B - 1.0
        return v - lr * grad

    def metrics(self, state: MetaState, j: jax.Array) -> dict[str, jax.Array]:
        return {"avg_weight": jnp.mean(self.lookup(state, j))}
