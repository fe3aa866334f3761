"""Fixed-schedule (interpolated) pacing.

Parity: InterpWrapper (reference old/interp.py:10-18,84) — difficulty is a
linear ramp from ``start`` to ``end`` over ``num_steps`` *examples* (the
reference passes ``i * batch_size``), capped at ``end`` afterwards. No
feedback from training signals.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum.base import StepSignals


class InterpState(NamedTuple):
    step: jax.Array  # int32 scalar


@dataclasses.dataclass(frozen=True)
class InterpController:
    start: float = 0.0
    end: float = 1.0
    num_steps: int = 10_000  # in examples, to match reference i*batch_size
    batch_size: int = 1

    def init(self) -> InterpState:
        return InterpState(step=jnp.zeros((), jnp.int32))

    def difficulty(self, state: InterpState) -> jax.Array:
        pos = (state.step * self.batch_size).astype(jnp.float32)
        frac = pos / max(self.num_steps, 1)
        val = self.start + (self.end - self.start) * frac
        lo, hi = sorted((self.start, self.end))
        return jnp.clip(val, lo, hi)

    def update(self, state: InterpState, signals: StepSignals) -> InterpState:
        del signals
        return InterpState(step=state.step + 1)

    def metrics(self, state: InterpState) -> dict[str, jax.Array]:
        return {"difficulty": self.difficulty(state)}
