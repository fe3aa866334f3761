"""Pacing controllers as pure state machines.

The reference implements each curriculum as a trainer subclass that mutates
``self.difficulty`` on the host every step (old/eta_bound.py:164,
old/levels.py:74-78, old/interp.py:84, lceT5.py:77-80 ChangeDifficulty). Here
a controller is a triple of pure functions over a pytree state so the whole
feedback loop lives inside the jitted train step — difficulty never syncs
the MXU to the host (SURVEY.md §7 hard-part 3):

    state  = ctrl.init()
    diff   = ctrl.difficulty(state)      # traced scalar in [0, 1]
    state' = ctrl.update(state, signals) # after each step

``StepSignals`` carries the per-step training signals every controller may
consume; unused fields cost nothing under jit (dead-code elimination).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Protocol

import jax


class StepSignals(NamedTuple):
    """Per-step signals produced by the train step.

    pce / nce: positive / negative CE — per label TOKEN, (B*L_label,), for
        the pair curricula (the reference flattens logits to (B*L, V) before
        CrossEntropyLoss, so eta weighting runs over tokens,
        old/eta_bound.py:69-78); per example, (B,), for LCE.
    ce: combined CE the self-paced weights act on — (pce + nce) / 2 in
        the eta wrapper (old/eta_bound.py:73-76), pce + agg(nce) for LCE.
    success: (B,) float 0/1 — P_true(pos) > P_true(neg) per example
        (old/levels.py:35-39).
    """

    pce: jax.Array
    nce: jax.Array
    ce: jax.Array
    success: jax.Array


class Controller(Protocol):
    def init(self) -> Any: ...

    def difficulty(self, state: Any) -> jax.Array: ...

    def update(self, state: Any, signals: StepSignals) -> Any: ...

    def metrics(self, state: Any) -> dict[str, jax.Array]:
        """Scalars to log each step (eta, difficulty, ...)."""
        ...
