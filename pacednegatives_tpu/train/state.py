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


class FactoredAdamState(NamedTuple):
    count: jax.Array
    mu: Any        # bf16 first moment, full shape
    nu_row: Any    # fp32 row EMA of g^2 (last axis reduced); full nu for <2D
    nu_col: Any    # fp32 col EMA of g^2 (2nd-to-last axis reduced); None <2D


def scale_by_adam_factored(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
) -> optax.GradientTransformation:
    """Adam with a memory/bandwidth-reduced state: bf16 first moment and an
    Adafactor-style factored fp32 second moment (Shazeer & Stern 2018) for
    params with >= 2 dims (full fp32 nu for 1D/scalars).

    Rationale (v5e, t5-base): the fp32 AdamW update is HBM-bound at
    ~8.7 ms/step — 28 bytes/param of read+write traffic. Factoring nu and
    storing mu in bf16 cuts that to ~14 bytes/param. The factored nu is
    exact when g^2 is rank-1 and an upper-bias approximation otherwise; mu
    in bf16 is safe because b1=0.9 increments are ~25x its ulp (unlike nu,
    whose (1-b2)=1e-3 increments would vanish in bf16 — hence factored fp32
    rather than bf16 for the second moment).

    NOT bit-identical to AdamW: reference-parity paths (trajectory tests,
    reference-style baseline) keep make_optimizer(..., moments="fp32").
    """

    def factors(p):
        return p.ndim >= 2

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16), params
        )
        nu_row = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:-1], jnp.float32)
            if factors(p) else jnp.zeros_like(p, dtype=jnp.float32),
            params,
        )
        nu_col = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
            if factors(p) else None,
            params,
            is_leaf=lambda x: x is None,
        )
        return FactoredAdamState(
            count=jnp.zeros((), jnp.int32), mu=mu, nu_row=nu_row, nu_col=nu_col
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd_mu(g, m):
            return (b1 * m.astype(jnp.float32) + (1 - b1) * g).astype(
                jnp.bfloat16
            )

        mu = jax.tree_util.tree_map(upd_mu, grads, state.mu)

        def upd_row(g, r):
            g2 = jnp.square(g)
            red = g2.mean(axis=-1) if g.ndim >= 2 else g2
            return b2 * r + (1 - b2) * red

        def upd_col(g, c):
            if c is None:
                return None
            return b2 * c + (1 - b2) * jnp.square(g).mean(axis=-2)

        nu_row = jax.tree_util.tree_map(upd_row, grads, state.nu_row)
        nu_col = jax.tree_util.tree_map(
            upd_col, grads, state.nu_col,
            is_leaf=lambda x: x is None,
        )

        def direction(g, m, r, c):
            m_hat = m.astype(jnp.float32) / c1
            if c is None:
                v_hat = r / c2
            else:
                # v_ij ~= R_i * C_j / mean_i(R): exact for rank-1 g^2
                denom = jnp.maximum(r.mean(axis=-1, keepdims=True), 1e-30)
                v_hat = (
                    (r / denom)[..., :, None] * c[..., None, :]
                ) / c2
            return m_hat / (jnp.sqrt(v_hat) + eps)

        updates = jax.tree_util.tree_map(
            direction, grads, mu, nu_row, nu_col,
            is_leaf=lambda x: x is None,
        )
        return updates, FactoredAdamState(
            count=count, mu=mu, nu_row=nu_row, nu_col=nu_col
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float,
    total_steps: int,
    warmup_steps: int | None = None,
    weight_decay: float = 0.0,
    eps: float = 1e-6,
    grad_clip: float | None = 1.0,
    grad_accum_steps: int = 1,
    moments: str = "fp32",
) -> optax.GradientTransformation:
    """AdamW + linear warmup-decay (+ optional global-norm clipping and
    gradient accumulation — the HF-fork features the reference inherits at
    utilities/trainer.py:575,598-628).

    Defaults match the LEGACY transformers.AdamW every reference trainer
    imports (pairwrapper.py:11, lceT5.py:5): eps=1e-6, weight_decay=0.0 —
    NOT torch.optim.AdamW's (1e-8, 0.01).

    moments: "fp32" (exact AdamW, reference parity), "bf16_mu" (AdamW with
    bf16 first moment), or "factored" (bf16 mu + Adafactor-style factored
    fp32 nu; see scale_by_adam_factored — fastest update, not bit-AdamW)."""
    if warmup_steps is None:
        warmup_steps = max(total_steps // 100, 1)
    if grad_accum_steps > 1:
        # MultiSteps advances the inner schedule once per APPLIED update
        # (every k micro-steps), so the schedule must be expressed in
        # applied-update units or warmup/decay stretch by k
        total_steps = max(total_steps // grad_accum_steps, 1)
        warmup_steps = max(warmup_steps // grad_accum_steps, 1)
    if moments not in ("fp32", "bf16_mu", "factored"):
        # a typo silently running exact fp32 AdamW would mislabel an A/B
        # measurement — fail loudly like the sibling knobs do
        raise ValueError(
            f"moments must be 'fp32', 'bf16_mu', or 'factored', got {moments!r}"
        )
    schedule = linear_warmup_decay(lr, warmup_steps, total_steps)
    if moments == "factored":
        tx = optax.chain(
            scale_by_adam_factored(eps=eps),
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        mu_dtype = jnp.bfloat16 if moments == "bf16_mu" else None
        tx = optax.adamw(
            schedule, eps=eps, weight_decay=weight_decay, mu_dtype=mu_dtype
        )
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
