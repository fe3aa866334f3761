"""Training losses: pairwise CE, LCE, self-paced eta-weighting, MarginMSE.

All functions are pure, jittable, and batched; CE reductions are per-example
(mean over non-ignored label tokens) so curriculum weights apply per example.

Reference parity notes:
- pairwise CE: ``mean(pce) + mean(nce)`` (reference old/levels.py:52,
  old/eta_bound.py:110).
- LCE: ``ce_i = pce_i + agg_j nce_ij`` with agg = mean or sum over the n
  negatives (reference utilities/loss.py:9-12, lceT5.py:116-123).
- eta weighting: below-threshold examples get ``1 - ce/eta`` (EtaWeights,
  reference weights.py:18,36-45) or ``ce/eta`` (LCEWeights, weights.py:54);
  above-threshold examples get weight 0 (mask). Gradients wrt eta flow only
  through the active branch — identical to the reference where the masked
  branch is ``loss * 0 * eta``.
- self-paced objective: ``mean(pce*v) + mean(nce*v) - sum(v)`` (reference
  old/eta_bound.py:78).
- MarginMSE: student margin vs per-teacher margins, MSE averaged over
  teachers (reference distill/loss.py:4-9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def token_ce_per_token(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """Per-token cross entropy: (B, L, V) logits, (B, L) labels -> (B, L)
    CE with ignored positions zeroed (the reference's flat
    ``CrossEntropyLoss(reduction='none')`` over (B*L, V), reshaped)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    tok = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, tok, 0.0)


def token_ce(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """Per-example cross entropy.

    logits: (B, L, V) fp32; labels: (B, L) int. Returns (B,) mean CE over
    non-ignored tokens. The reference computes flat per-token CE and then
    means over everything (utilities/loss.py:6-8); per-example token means
    are equivalent under the final batch mean when label lengths are equal
    (they always are: the verbalizer is a fixed 1-2 token sequence).
    """
    valid = labels != ignore_index
    tok = token_ce_per_token(logits, labels, ignore_index)
    count = jnp.maximum(valid.sum(axis=-1), 1)
    return tok.sum(axis=-1) / count


def pairwise_ce_loss(pce: jax.Array, nce: jax.Array) -> jax.Array:
    """mean(pce) + mean(nce) — the plain main loss of every wrapper."""
    return jnp.mean(pce) + jnp.mean(nce)


def lce_ce(pce: jax.Array, nce: jax.Array, n: int, use_mean: bool = True) -> jax.Array:
    """LCE per-example CE: pce (B,) + agg over n negatives of nce (B*n,).

    Returns (B,). ``use_mean`` selects mean/sum over the negative group
    (reference utilities/loss.py:9-12).
    """
    grouped = nce.reshape(-1, n)
    agg = jnp.mean(grouped, axis=1) if use_mean else jnp.sum(grouped, axis=1)
    return pce + agg


def lce_ce_flat_tokens(
    pce_tok: jax.Array, nce_tok: jax.Array, n: int, use_mean: bool = True
) -> jax.Array:
    """LCE CE with the reference's VERBATIM flat-token regrouping.

    The reference flattens per-token CEs in (example, negative, token) memory
    order and then groups CONSECUTIVE n tokens into "negative groups"
    (``nce.view(-1, n)``, lceT5.py:119).  With L_label == 1 that grouping is
    per-example-over-negatives; with L_label > 1 it mixes tokens across
    negatives and yields a (B*L_label,) "per-example" vector whose entry
    (b, l) pairs positive token l with a token-interleaved slice of example
    b's negatives.  We treat this as a reference quirk — the default LCE path
    (``lce_ce``) groups per example — but reproduce it here exactly so the
    divergence is tested rather than asserted (VERDICT r2 item 9).

    pce_tok: (B, L) per-token CE of the positives (ignored slots zeroed).
    nce_tok: (B*n, L) per-token CE of the negatives, row order (b, neg).
    Returns (B*L,): flat positive token CE + agg over quirk-grouped rows.
    Requires positive and negative label lengths to match (they do: the
    verbalizer label is the same fixed token sequence for both).
    """
    grouped = nce_tok.reshape(-1, n)  # rows of n CONSECUTIVE (b, neg, l) slots
    agg = jnp.mean(grouped, axis=1) if use_mean else jnp.sum(grouped, axis=1)
    return pce_tok.reshape(-1) + agg


def eta_weight(ce: jax.Array, eta: jax.Array, kind: str = "eta") -> jax.Array:
    """Self-paced weight v(ce; eta).

    kind='eta' (EtaWeights): v = 1 - ce/eta where ce <= eta, else 0.
    kind='lce' (LCEWeights): v = ce/eta     where ce <= eta, else 0.
    """
    eta = jnp.asarray(eta)
    below = ce <= eta
    if kind == "eta":
        active = 1.0 - ce / eta
    elif kind == "lce":
        active = ce / eta
    else:
        raise ValueError(f"unknown eta weight kind: {kind}")
    return jnp.where(below, active, 0.0)


def self_paced_objective(pce: jax.Array, nce: jax.Array, v: jax.Array) -> jax.Array:
    """mean(pce*v) + mean(nce*v) - sum(v); minimized wrt eta (through v)."""
    return jnp.mean(pce * v) + jnp.mean(nce * v) - jnp.sum(v)


def margin_mse(student: jax.Array, teachers: jax.Array) -> jax.Array:
    """Multi-teacher MarginMSE.

    student: (2B,) scores in interleaved (pos, neg) order; teachers: (2B, T)
    per-teacher scores in the same order. loss = mean_t MSE(student_margin,
    teacher_margin_t).
    """
    s_margin = student[::2] - student[1::2]
    t_margin = teachers[::2, :] - teachers[1::2, :]  # (B, T)
    per_teacher = jnp.mean((s_margin[:, None] - t_margin) ** 2, axis=0)
    return jnp.mean(per_teacher)
