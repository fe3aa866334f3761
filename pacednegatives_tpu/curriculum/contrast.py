"""Combined controller: learnable eta AND success-rate difficulty bumps.

Parity with the reference's MetaContrastWrapper (old/meta_contrast copy.py:
22-178, the 13-arg wrapper train/meta.py:72-84 actually invokes): eta is
learned on the self-paced objective exactly like EtaWrapper, while the
*difficulty* is a separate state bumped by +1/n_neg whenever the windowed
success rate clears a threshold (rate bump at old/meta_contrast copy.py:
166-170) — i.e. unlike EtaWrapper, difficulty does NOT track eta.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax

from pacednegatives_tpu.curriculum.base import StepSignals
from pacednegatives_tpu.curriculum.eta import EtaController, EtaState
from pacednegatives_tpu.curriculum.level import LevelController, LevelState


class ContrastState(NamedTuple):
    eta: EtaState
    level: LevelState


@dataclasses.dataclass(frozen=True)
class ContrastController:
    """EtaController for the weight threshold + LevelController for pacing."""

    eta0: float = 0.5
    meta_lr: float = 1e-3
    warmup_steps: int = 1000
    total_steps: int = 100_000
    eta_min: float = 1e-10
    eta_max: float = 1.0
    n_neg: int = 1000
    threshold: float = 0.5
    rate_check: int = 1000

    def _eta(self) -> EtaController:
        return EtaController(
            eta0=self.eta0, meta_lr=self.meta_lr,
            warmup_steps=self.warmup_steps, total_steps=self.total_steps,
            eta_min=self.eta_min, eta_max=self.eta_max,
        )

    def _level(self) -> LevelController:
        return LevelController(
            n_neg=self.n_neg, threshold=self.threshold,
            check_every=self.rate_check,
        )

    def init(self) -> ContrastState:
        return ContrastState(eta=self._eta().init(), level=self._level().init())

    def difficulty(self, state: ContrastState) -> jax.Array:
        return state.level.difficulty

    def update(self, state: ContrastState, signals: StepSignals) -> ContrastState:
        return ContrastState(
            eta=self._eta().update(state.eta, signals),
            level=self._level().update(state.level, signals),
        )

    def meta_loss(self, state: ContrastState, signals: StepSignals) -> jax.Array:
        return self._eta().meta_loss(state.eta, signals)

    def metrics(self, state: ContrastState) -> dict[str, jax.Array]:
        return {
            "eta": state.eta.eta,
            "difficulty": state.level.difficulty,
            **{
                k: v
                for k, v in self._level().metrics(state.level).items()
                if k != "difficulty"
            },
        }
