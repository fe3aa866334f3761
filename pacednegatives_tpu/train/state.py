"""Training state and optimizers.

Optimizer parity with the reference: AdamW + HF linear warmup-decay schedule
on every trainer (pairwrapper.py:54, old/eta_bound.py:130-135,
lceT5.py:170-182). Warmup default total//100 matches the reference fallback.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pacednegatives_tpu.curriculum.eta import linear_warmup_decay


class TrainState(NamedTuple):
    params: Any
    opt_state: optax.OptState
    curriculum: Any
    step: jax.Array
    key: jax.Array


def make_optimizer(
    lr: float,
    total_steps: int,
    warmup_steps: int | None = None,
    weight_decay: float = 0.0,
    eps: float = 1e-6,
    grad_clip: float | None = 1.0,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW + linear warmup-decay (+ optional global-norm clipping and
    gradient accumulation — the HF-fork features the reference inherits at
    utilities/trainer.py:575,598-628).

    Defaults match the LEGACY transformers.AdamW every reference trainer
    imports (pairwrapper.py:11, lceT5.py:5): eps=1e-6, weight_decay=0.0 —
    NOT torch.optim.AdamW's (1e-8, 0.01)."""
    if warmup_steps is None:
        warmup_steps = max(total_steps // 100, 1)
    if grad_accum_steps > 1:
        # MultiSteps advances the inner schedule once per APPLIED update
        # (every k micro-steps), so the schedule must be expressed in
        # applied-update units or warmup/decay stretch by k
        total_steps = max(total_steps // grad_accum_steps, 1)
        warmup_steps = max(warmup_steps // grad_accum_steps, 1)
    schedule = linear_warmup_decay(lr, warmup_steps, total_steps)
    tx = optax.adamw(schedule, eps=eps, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def init_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    curriculum_state: Any,
    seed: int = 42,
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        curriculum=curriculum_state,
        step=jnp.zeros((), jnp.int32),
        key=jax.random.key(seed),
    )
