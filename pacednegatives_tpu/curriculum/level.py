"""Heuristic-level pacing: bump difficulty when the success rate clears a
threshold.

Parity: LevelWrapper (reference old/levels.py:61-98) — every
``check_every`` steps, if the mean success rate accumulated since the last
check exceeds ``threshold``, difficulty += 1/n_neg (capped at 1.0) and the
accumulator resets. Success = P_true(pos) > P_true(neg) via the verbalizer
softmax (old/levels.py:35-39).

The reference checks *before* the step using rates accumulated from previous
steps and skips the bump while the accumulator is empty (``len(...) > 0``);
this update runs *after* each step with the same effect: the k-th check sees
exactly the k-th window of rates.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum.base import StepSignals


class LevelState(NamedTuple):
    difficulty: jax.Array  # fp32 scalar
    success_sum: jax.Array  # fp32 scalar
    success_count: jax.Array  # int32 scalar
    step: jax.Array  # int32 scalar


@dataclasses.dataclass(frozen=True)
class LevelController:
    n_neg: int
    threshold: float = 0.5
    check_every: int = 1000
    start: float = 0.0

    def init(self) -> LevelState:
        return LevelState(
            difficulty=jnp.asarray(self.start, jnp.float32),
            success_sum=jnp.zeros((), jnp.float32),
            success_count=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int32),
        )

    def difficulty(self, state: LevelState) -> jax.Array:
        return state.difficulty

    def update(self, state: LevelState, signals: StepSignals) -> LevelState:
        s_sum = state.success_sum + jnp.mean(signals.success)
        s_cnt = state.success_count + 1
        step = state.step + 1

        check = (step % self.check_every == 0) & (s_cnt > 0)
        rate = s_sum / jnp.maximum(s_cnt, 1).astype(jnp.float32)
        bump = check & (rate > self.threshold)

        difficulty = jnp.where(
            bump,
            jnp.minimum(1.0, state.difficulty + 1.0 / self.n_neg),
            state.difficulty,
        )
        s_sum = jnp.where(check, 0.0, s_sum)
        s_cnt = jnp.where(check, 0, s_cnt)
        return LevelState(difficulty, s_sum, s_cnt, step)

    def metrics(self, state: LevelState) -> dict[str, jax.Array]:
        # windowed accumulator (resets at each check) — named distinctly so
        # it cannot clobber the per-batch success_rate in the step metrics
        rate = state.success_sum / jnp.maximum(state.success_count, 1).astype(
            jnp.float32
        )
        return {"difficulty": state.difficulty, "success_rate_window": rate}
