"""Learnable self-paced threshold eta.

Two reference variants, selected by ``kind`` / ``objective``:

- kind="eta", objective="self_paced": EtaWrapper (old/eta_bound.py:60-93).
  v = EtaWeights(ce) with ce = (pce+nce)/2; eta minimizes
  mean(pce*v) + mean(nce*v) - sum(v) by its own Adam with a linear
  warmup-decay schedule; eta clamped to [eta_min, eta_max]; difficulty = eta.

- kind="lce", objective="weighted_ce": LCEModel meta step (lceT5.py:137-143).
  v = LCEWeights(ce) with ce = LCE per-example CE; eta minimizes
  mean(v * ce) by AdamW + linear schedule; difficulty = min(1-1e-10, eta)
  (ChangeDifficulty callback, lceT5.py:77-80).

In both, the meta update consumes the CE values only — the gradient of the
objective wrt eta is a closed form over (ce, eta) — so no extra model forward
is ever needed. The reference pays two no-grad forwards per step for this
(lceT5.py:131-135); we reuse the main-pass CE under ``stop_gradient``
(SURVEY.md §7 item 6).

CE scale (``ce_scale``): the reference always starts from pretrained t5-base,
where verbalizer CE is O(1) — the same scale as eta in (0,1) — so
``difficulty = eta`` traverses the pool as the model's losses cross the
threshold. From RANDOM init, CE sits at ~log(vocab) ≈ 10, every example is
above any eta in (0,1), and the feedback saturates (difficulty pinned).
``ce_scale`` divides all CE signals before the weight function/objective so
random-init runs live in the reference's operating regime; ``ce_scale=1``
(default) is reference-exact for pretrained checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from pacednegatives_tpu.curriculum.base import StepSignals
from pacednegatives_tpu.ops.losses import eta_weight, self_paced_objective


class EtaState(NamedTuple):
    eta: jax.Array  # fp32 scalar parameter
    opt_state: optax.OptState
    step: jax.Array


def linear_warmup_decay(peak_lr: float, warmup_steps: int, total_steps: int):
    """HF get_linear_schedule_with_warmup parity (used by every reference
    trainer): linear 0->peak over warmup, then linear decay to 0 at total."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps
        decay = jnp.maximum(
            0.0,
            (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1),
        )
        return peak_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def milestone_decay(base_schedule, milestones: dict[int, float]):
    """Multiply a schedule by a factor from each milestone step onward.

    Parity with the reference HF-fork's epoch-wise meta-LR decay (x0.1 at
    1/4 and 1/2 of training, utilities/trainer.py:528):
    ``milestone_decay(sched, {total//4: 0.1, total//2: 0.1})``.
    """

    def schedule(step):
        lr = base_schedule(step)
        s = jnp.asarray(step, jnp.float32)
        for at, factor in sorted(milestones.items()):
            lr = lr * jnp.where(s >= at, factor, 1.0)
        return lr

    return schedule


@dataclasses.dataclass(frozen=True)
class EtaController:
    eta0: float = 0.5
    meta_lr: float = 1e-3
    warmup_steps: int = 1000
    total_steps: int = 100_000
    kind: str = "eta"  # weight function: "eta" | "lce"
    objective: str = "self_paced"  # "self_paced" | "weighted_ce"
    eta_min: float = 1e-10
    eta_max: float = 1.0
    clamp: bool = True
    optimizer: str = "adam"  # "adam" (EtaWrapper) | "adamw" (LCEModel)
    # divide CE signals by this before the weight fn/objective (see module
    # docstring); 1.0 = reference-exact pretrained scale
    ce_scale: float = 1.0
    # ((step, factor), ...) meta-LR milestone decay — parity with the HF
    # fork's epoch-wise x0.1 at 1/4 and 1/2 of training
    # (utilities/trainer.py:528); empty = plain linear schedule
    milestones: tuple = ()

    def _tx(self) -> optax.GradientTransformation:
        schedule = linear_warmup_decay(
            self.meta_lr, self.warmup_steps, self.total_steps
        )
        if self.milestones:
            schedule = milestone_decay(schedule, dict(self.milestones))
        if self.optimizer == "adamw":
            # the legacy transformers.AdamW the reference imports
            # (lceT5.py:5,171): eps=1e-6, weight_decay=0.0
            return optax.adamw(schedule, eps=1e-6, weight_decay=0.0)
        return optax.adam(schedule)

    def init(self) -> EtaState:
        eta = jnp.asarray(self.eta0, jnp.float32)
        return EtaState(
            eta=eta,
            opt_state=self._tx().init(eta),
            step=jnp.zeros((), jnp.int32),
        )

    def difficulty(self, state: EtaState) -> jax.Array:
        if self.kind == "eta":
            # EtaWrapper: difficulty = eta exactly (can reach 1.0 — the
            # clamp is [eta_min, 1.0], old/eta_bound.py:35); the train loop
            # starts at difficulty 0.0 and only assigns difficulty = eta
            # AFTER the first step (old/eta_bound.py:125,164).
            return jnp.where(state.step == 0, 0.0, jnp.clip(state.eta, 0.0, 1.0))
        # LCE: ChangeDifficulty caps at 1-1e-10 (lceT5.py:79). In the
        # reference's float64 host math the cap keeps floor(d * (P-1)) at
        # P-2, i.e. the capped regime never reaches the single hardest pool
        # slot. 1-1e-10 is NOT fp32-representable (rounds to exactly 1.0,
        # which WOULD reach slot P-1), so we cap at 1-1e-6 — the fp32-safe
        # value with the same floor semantics for every pool size < ~300k.
        return jnp.clip(state.eta, 0.0, 1.0 - 1e-6)

    def _objective(self, eta, signals: StepSignals) -> jax.Array:
        s = 1.0 / self.ce_scale
        v = eta_weight(signals.ce * s, eta, self.kind)
        if self.objective == "self_paced":
            return self_paced_objective(signals.pce * s, signals.nce * s, v)
        return jnp.mean(v * signals.ce * s)

    def update(self, state: EtaState, signals: StepSignals) -> EtaState:
        signals = jax.tree_util.tree_map(jax.lax.stop_gradient, signals)
        grad = jax.grad(self._objective)(state.eta, signals)
        updates, opt_state = self._tx().update(
            grad, state.opt_state, state.eta
        )
        eta = optax.apply_updates(state.eta, updates)
        if self.clamp:
            eta = jnp.clip(eta, self.eta_min, self.eta_max)
        return EtaState(eta=eta, opt_state=opt_state, step=state.step + 1)

    def meta_loss(self, state: EtaState, signals: StepSignals) -> jax.Array:
        return self._objective(state.eta, signals)

    def success_rate(self, state: EtaState, signals: StepSignals) -> jax.Array:
        """Reference semantics: fraction of examples whose (scaled) CE is
        below the current eta (old/eta_bound.py:57-58 check_success_rate,
        compared against the post-meta-step eta)."""
        return jnp.mean((signals.ce / self.ce_scale < state.eta).astype(jnp.float32))

    def metrics(self, state: EtaState) -> dict[str, jax.Array]:
        return {"eta": state.eta, "difficulty": self.difficulty(state)}
