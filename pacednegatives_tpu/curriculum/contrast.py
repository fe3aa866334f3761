"""Combined controller: learnable eta AND success-rate difficulty bumps.

Parity with the reference's MetaContrastWrapper (old/meta_contrast copy.py:
22-178, the 13-arg wrapper train/meta.py:72-84 actually invokes): eta is
learned on the self-paced objective exactly like EtaWrapper, while the
*difficulty* is a separate state bumped by +1/n_neg whenever the windowed
success rate clears a threshold (rate bump at old/meta_contrast copy.py:
166-170) — i.e. unlike EtaWrapper, difficulty does NOT track eta.

NOTE the bump signal: in MetaContrastWrapper the windowed rate is
``mean(ce < eta)`` (check_success_rate, old/meta_contrast copy.py:63-64,
called from main_loop:117) — NOT the pairwise P_true(pos) > P_true(neg)
probe that LevelWrapper uses. The eta used in the comparison is the
post-meta-step eta of the same step (meta_loop runs before main_loop).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

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
    ce_scale: float = 1.0
    milestones: tuple = ()

    def _eta(self) -> EtaController:
        return EtaController(
            eta0=self.eta0, meta_lr=self.meta_lr,
            warmup_steps=self.warmup_steps, total_steps=self.total_steps,
            eta_min=self.eta_min, eta_max=self.eta_max,
            ce_scale=self.ce_scale, milestones=self.milestones,
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
        # eta first, then the level bump driven by the ce < (new) eta rate —
        # reference step order: meta_loop updates eta, main_loop accumulates
        # check_success_rate(ce) against it, the windowed mean gates the bump
        # (old/meta_contrast copy.py:63-64,117,163-170).
        eta_ctrl = self._eta()
        eta = eta_ctrl.update(state.eta, signals)
        below = (signals.ce / self.ce_scale < eta.eta).astype(jnp.float32)
        level_signals = signals._replace(success=below)
        return ContrastState(
            eta=eta,
            level=self._level().update(state.level, level_signals),
        )

    def meta_loss(self, state: ContrastState, signals: StepSignals) -> jax.Array:
        return self._eta().meta_loss(state.eta, signals)

    def success_rate(self, state: ContrastState, signals: StepSignals) -> jax.Array:
        return self._eta().success_rate(state.eta, signals)

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
