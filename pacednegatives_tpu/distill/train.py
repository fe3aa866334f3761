"""Distillation train steps.

- MarginMSE (reference distill/train_t5.py:52-70 + loss.py): student = monoT5
  log P(true) per prompt; loss = mean over teachers of MSE between student
  and teacher (pos - neg) margins.
- Baseline CE (reference distill/train_baseline.py): plain seq2seq CE on the
  alternating true/false labels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.monot5 import relevance_log_probs
from pacednegatives_tpu.ops.losses import margin_mse, token_ce


class DistillState(NamedTuple):
    params: object
    opt_state: optax.OptState
    step: jax.Array


def init_distill_state(params, tx) -> DistillState:
    return DistillState(params=params, opt_state=tx.init(params),
                        step=jnp.zeros((), jnp.int32))


def make_distill_step(
    model_cfg: t5.T5Config,
    tx: optax.GradientTransformation,
    objective: str = "margin_mse",  # "margin_mse" | "ce"
    rel_id: int = 3,
    nrel_id: int = 4,
):
    def step(state: DistillState, batch):
        def loss_fn(params):
            logits = t5.forward_logits(
                params, model_cfg, batch["ids"], batch["labels"], batch["mask"]
            )
            if objective == "margin_mse":
                student = relevance_log_probs(logits[:, 0, :], rel_id, nrel_id)
                return margin_mse(student, batch["teachers"])
            return jnp.mean(token_ce(logits, batch["labels"]))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            DistillState(params, opt_state, state.step + 1),
            {"loss": loss},
        )

    return step
