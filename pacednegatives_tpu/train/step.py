"""Fused jitted train steps.

The reference pays FOUR model forwards + one backward per step in its
meta-trainers: two no-grad forwards for the eta update, then two fresh
grad forwards for the main loss (lceT5.py:131-157, old/eta_bound.py:60-118).
The eta objective only needs the per-example CE *values*, so here a single
gradient pass produces both the main loss and (under stop_gradient) the
curriculum signals: 2 forwards + 1 backward total, with XLA free to fuse
batch assembly, both passes and both optimizer updates into one program.

Step families (mirroring the reference trainers):
- ``make_train_step(loss="pair")``  — Interp/Level/Eta wrappers (1 negative)
- ``make_train_step(loss="lce")``   — LCEModel (n sampled negatives)
- ``make_meta_train_step``          — bilevel per-example weights
  (StdWrapper via virtual SGD step, NewWrapper via closed form)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from pacednegatives_tpu.curriculum.base import StepSignals
from pacednegatives_tpu.curriculum.meta import MetaWeightTable
from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.monot5 import relevance_probs
from pacednegatives_tpu.ops.losses import (
    lce_ce,
    lce_ce_flat_tokens,
    token_ce,
    token_ce_per_token,
)
from pacednegatives_tpu.train.state import TrainState

Batch = dict[str, jax.Array]


def _fold_rel_bias_grad(grads: dict, stack_key: str, g: jax.Array) -> dict:
    """Add ``g`` into the rel_bias leaf of ``grads[stack_key]`` (either the
    native stacked layout's top-level ``rel_bias`` or the legacy
    ``block_0.self_attn.rel_bias``), functionally."""
    stack = dict(grads[stack_key])
    if "rel_bias" in stack:
        stack["rel_bias"] = stack["rel_bias"] + g
    else:
        b0 = dict(stack["block_0"])
        sa = dict(b0["self_attn"])
        sa["rel_bias"] = sa["rel_bias"] + g
        b0["self_attn"] = sa
        stack["block_0"] = b0
    return {**grads, stack_key: stack}


def _ce_and_first_logits(params, cfg, ids, mask, labels, dropout_key=None,
                         pos_biases=None):
    logits = t5.forward_logits(
        params, cfg, ids, labels, mask,
        deterministic=dropout_key is None, dropout_key=dropout_key,
        pos_biases=pos_biases,
    )
    return token_ce(logits, labels), logits[:, 0, :]


def _ce_with_tokens(params, cfg, ids, mask, labels, dropout_key=None,
                    pos_biases=None):
    """Per-example CE, per-TOKEN CE matrix, and first decode-step logits.

    The pair-curriculum meta objective needs per-token CE: the reference
    flattens logits to (B*L_label, V) before CrossEntropyLoss, so EtaWeights
    thresholding and the -sum(v) regularizer run over label TOKENS (2 per
    example: verbalizer + eos), not examples (old/eta_bound.py:69-78)."""
    logits = t5.forward_logits(
        params, cfg, ids, labels, mask,
        deterministic=dropout_key is None, dropout_key=dropout_key,
        pos_biases=pos_biases,
    )
    per_tok = token_ce_per_token(logits, labels)
    valid = labels != -100
    count = jnp.maximum(valid.sum(axis=-1), 1)
    per_ex = per_tok.sum(axis=-1) / count
    return per_ex, per_tok, logits[:, 0, :]


def make_train_step(
    model_cfg: t5.T5Config,
    controller,
    tx: optax.GradientTransformation,
    loss: str = "pair",
    n_neg_per_example: int = 1,
    use_mean: bool = True,
    # "per_example" (default): LCE groups negative CEs per example.
    # "flat_tokens": the reference's verbatim ``nce.view(-1, n)`` regrouping
    # (lceT5.py:119), which token-interleaves across negatives when
    # L_label > 1 — kept reproducible so the divergence is tested, not
    # asserted (ops/losses.lce_ce_flat_tokens).
    label_grouping: str = "per_example",
    rel_id: int = 3,
    nrel_id: int = 4,
    dropout: bool = False,
    microbatches: int = 1,
    # unroll the grad-accumulation scan: lets XLA fuse each microbatch's
    # dW into the accumulator in place instead of copying the full fp32
    # grad pytree through the loop carry (measurable at t5-base scale)
    microbatch_unroll: bool = False,
    # dtype of the grad-accumulation scan CARRY. "fp32" (default) is exact;
    # "bf16" halves the carry's HBM traffic — at t5-base the fp32 grad
    # pytree is ~0.9 GB and the scan reads+writes it every microbatch
    # (~7.2 GB/step at k=4 ≈ 9 ms, the bulk of the step's unattributed
    # copy-done time in the round-3 profile). Cost: one bf16 rounding per
    # add; the per-microbatch g/k scaling is exact when k is a power of
    # two. Opt-in because it perturbs the update numerically (bounded in
    # tests/test_microbatch.py::test_bf16_grad_accum_close).
    grad_accum_dtype: str = "fp32",
) -> Callable[[TrainState, Batch], tuple[TrainState, dict]]:
    """Build step(state, batch) -> (state, metrics).

    loss="pair": main = mean(pce) + mean(nce); curriculum signals are
    per-TOKEN CE vectors of length B*L_label and ce = (pce+nce)/2 — the
    reference flattens to (B*L_label, V) before CrossEntropyLoss, so the
    eta weighting/objective/success-rate all run over label tokens
    (old/eta_bound.py:69-78; labels are [verbalizer, eos] so L_label=2).
    Labels on this path must not contain ignore_index (every in-repo
    assembly emits fully-valid 2-token labels).
    loss="lce": main = mean(pce + agg_n nce); curriculum ce = the same
    per-example vector (lceT5.py:116-123,131-135).

    microbatches=k>1 splits the batch into k equal example slices and
    lax.scan's fwd+bwd over them, accumulating gradients — one optimizer
    update and one curriculum update per step, mathematically identical to
    k=1 (equal slice sizes make mean-of-means exact), but with activation
    memory divided by k. This is the TPU-native alternative to per-block
    rematerialization at long sequence lengths: grad-accum trades HBM for
    *zero* recompute FLOPs where remat trades it for an extra forward.
    """
    if loss not in ("pair", "lce"):
        raise ValueError(loss)
    if label_grouping not in ("per_example", "flat_tokens"):
        raise ValueError(
            f"label_grouping must be 'per_example' or 'flat_tokens', "
            f"got {label_grouping!r}"
        )
    if grad_accum_dtype not in ("fp32", "bf16"):
        raise ValueError(
            f"grad_accum_dtype must be 'fp32' or 'bf16', "
            f"got {grad_accum_dtype!r}"
        )
    if grad_accum_dtype != "fp32" and microbatches <= 1:
        # there is no accumulation carry without microbatching; silently
        # ignoring the knob would mislabel an A/B experiment
        raise ValueError(
            "grad_accum_dtype='bf16' requires microbatches > 1 "
            "(no accumulation carry exists at microbatches=1)"
        )
    n = n_neg_per_example
    k = microbatches
    acc_dt = jnp.float32 if grad_accum_dtype == "fp32" else jnp.bfloat16

    def step(state: TrainState, batch: Batch) -> tuple[TrainState, dict]:
        key, new_key = jax.random.split(state.key)
        B = batch["pos_ids"].shape[0]

        # Position biases once per STEP, not per microbatch forward: the
        # bucket gather is loop-invariant but XLA won't hoist it out of the
        # grad-accumulation scan (~21 ms/step at t5-base L=512). The bias
        # cotangent accumulated below folds back into the rel_bias table
        # gradients through this vjp — numerically the reference gradient.
        rb = {
            "enc": t5._rel_bias(state.params["encoder"]),
            "dec": t5._rel_bias(state.params["decoder"]),
        }
        bias_fn = lambda rb: t5.position_bias_from_tables(
            rb["enc"], rb["dec"], model_cfg,
            batch["pos_ids"].shape[1], batch["pos_labels"].shape[1],
        )
        biases, bias_vjp = jax.vjp(bias_fn, rb)

        # Cast the big matmul weights to the compute dtype ONCE per step:
        # the per-use .astype(dt) inside the model is loop-invariant across
        # microbatches but not hoisted by XLA (~1.3 GB of cast traffic per
        # microbatch at t5-base). Differentiation runs against the cast
        # tree; gradients upcast to fp32 before accumulation/optimizer.
        # 1-D scales and the (buckets, H) rel_bias tables stay fp32.
        def _pre(p):
            if p.ndim >= 2 and p.shape[-1] >= 128 and p.dtype == jnp.float32:
                return p.astype(model_cfg.dtype)
            return p

        # fused_qkv: concatenate projection weights ONCE per step so the
        # model runs wide attention GEMMs (t5.fuse_attention_params); the
        # gradients are split back to the q/k/v layout below.
        src_params = (
            t5.fuse_attention_params(state.params)
            if model_cfg.fused_qkv else state.params
        )
        params_c = jax.tree_util.tree_map(_pre, src_params)

        def loss_fn(params, biases, pos_ids, pos_mask, pos_labels, neg_ids,
                    neg_mask, neg_labels, dkey):
            # ONE forward over [positives; negatives] — prompts share their
            # shape, so concatenation turns two half-utilized encoder passes
            # (B and B*n rows) into a single (B*(1+n), L) pass that tiles the
            # MXU better and halves kernel-launch overhead.
            b = pos_ids.shape[0]
            ids = jnp.concatenate([pos_ids, neg_ids])
            mask = jnp.concatenate([pos_mask, neg_mask])
            labels = jnp.concatenate([pos_labels, neg_labels])
            ce_all, ce_tok, first = _ce_with_tokens(
                params, model_cfg, ids, mask, labels,
                dkey if dropout else None, pos_biases=biases,
            )
            pce, nce = ce_all[:b], ce_all[b:]
            p_first, n_first = first[:b], first[b:]
            if loss == "pair":
                main = jnp.mean(pce) + jnp.mean(nce)
                # per-token curriculum signals (see docstring)
                sig_p = ce_tok[:b].reshape(-1)
                sig_n = ce_tok[b:].reshape(-1)
                sig_ce = (sig_p + sig_n) / 2.0
            elif label_grouping == "flat_tokens":
                sig_ce = lce_ce_flat_tokens(
                    ce_tok[:b], ce_tok[b:], n, use_mean
                )
                main = jnp.mean(sig_ce)
                sig_p, sig_n = pce, nce
            else:
                sig_ce = lce_ce(pce, nce, n, use_mean)
                main = jnp.mean(sig_ce)
                sig_p, sig_n = pce, nce
            return main, (pce, nce, sig_p, sig_n, sig_ce, p_first, n_first)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        f32 = lambda t: jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), t
        )
        if k <= 1:
            (main_loss, aux), (grads, gbias) = grad_fn(
                params_c, biases, batch["pos_ids"], batch["pos_mask"],
                batch["pos_labels"], batch["neg_ids"], batch["neg_mask"],
                batch["neg_labels"], key,
            )
            grads = f32(grads)
            gbias = f32(gbias)
        else:
            if B % k:
                raise ValueError(f"batch {B} not divisible by microbatches {k}")
            m = B // k

            def split(x, rows):  # (B*rows, ...) -> (k, m*rows, ...)
                return x.reshape((k, m * rows) + x.shape[1:])

            chunks = (
                split(batch["pos_ids"], 1), split(batch["pos_mask"], 1),
                split(batch["pos_labels"], 1), split(batch["neg_ids"], n),
                split(batch["neg_mask"], n), split(batch["neg_labels"], n),
                jax.random.split(key, k),
            )

            def accum(carry, chunk):
                loss_acc, grads_acc, gbias_acc = carry
                (l_i, aux_i), (g_i, gb_i) = grad_fn(params_c, biases, *chunk)
                carry = (
                    loss_acc + l_i / k,
                    jax.tree_util.tree_map(
                        lambda a, g: a + (g / k).astype(acc_dt), grads_acc, g_i
                    ),
                    jax.tree_util.tree_map(
                        lambda a, g: a + (g / k).astype(acc_dt), gbias_acc, gb_i
                    ),
                )
                return carry, aux_i

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, acc_dt), params_c
            )
            zero_gbias = jax.tree_util.tree_map(
                lambda b: jnp.zeros(b.shape, acc_dt), biases
            )
            (main_loss, grads, gbias), aux_stack = jax.lax.scan(
                accum, (jnp.zeros((), jnp.float32), zero_grads, zero_gbias),
                chunks, unroll=microbatch_unroll,
            )
            # (k, m*rows) signal stacks -> flat full-batch vectors, restoring
            # the original example order
            aux = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), aux_stack
            )
        pce, nce, sig_p, sig_n, sig_ce, p_first, n_first = aux

        if acc_dt != jnp.float32:
            # the optimizer/bias-fold math stays fp32; only the scan carry
            # was reduced-precision
            grads = f32(grads)
            gbias = f32(gbias)

        if model_cfg.fused_qkv:
            grads = t5.split_attention_grads(grads)

        # fold the accumulated bias cotangent back into the two rel_bias
        # table grads (see position_bias_cache)
        grb = bias_vjp(gbias)[0]
        grads = _fold_rel_bias_grad(grads, "encoder", grb["enc"])
        grads = _fold_rel_bias_grad(grads, "decoder", grb["dec"])

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # Curriculum signals from the same pass (stop_gradient inside
        # controller.update). success compares each positive against the
        # FIRST of its negatives (the reference's single-neg probe,
        # old/levels.py:35-39; for LCE it takes negative j=0).
        p_prob = relevance_probs(p_first, rel_id, nrel_id)
        n_prob = relevance_probs(n_first, rel_id, nrel_id)
        n_prob_first = n_prob.reshape(-1, n)[:, 0] if n > 1 else n_prob
        signals = StepSignals(
            pce=sig_p,
            nce=sig_n if loss == "pair" else jnp.mean(nce.reshape(-1, n), axis=1),
            ce=sig_ce,
            success=(p_prob > n_prob_first).astype(jnp.float32),
        )
        curriculum = controller.update(state.curriculum, signals)

        # Reference log schema (old/eta_bound.py:142-150, old/levels.py:84):
        # probs        = pairwise accuracy P_true(pos) > P_true(neg)
        # success_rate = mean(ce < eta) for eta-family controllers (compared
        #                against the post-update eta), else pairwise accuracy
        #                (LevelWrapper's check_success)
        # p_true       = mean P_true over positives (ours, kept for round-1
        #                curve continuity)
        pair_acc = jnp.mean(signals.success)
        metrics = {
            "loss": main_loss,
            "probs": pair_acc,
            "p_true": jnp.mean(p_prob),
            **controller.metrics(curriculum),
        }
        if hasattr(controller, "success_rate"):
            metrics["success_rate"] = controller.success_rate(curriculum, signals)
        else:
            metrics["success_rate"] = pair_acc
        if "neg_rank" in batch:
            # mean sampled pool position in [0,1] — direct evidence that the
            # curriculum's difficulty actually shifts which negatives train
            metrics["neg_rank"] = jnp.mean(batch["neg_rank"])
        if hasattr(controller, "meta_loss"):
            metrics["meta_loss"] = controller.meta_loss(state.curriculum, signals)

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            curriculum=curriculum,
            step=state.step + 1,
            key=new_key,
        )
        return new_state, metrics

    return step


def make_fused_step(
    corpus,  # DeviceCorpus
    step_fn,
    controller,
    loss: str = "pair",
    n_neg_per_example: int = 1,
    negative_parallel: bool = False,
):
    """Fuse on-device batch assembly with the train step.

    fused(state, pair_idx) runs: difficulty -> sample negatives -> gather
    prompts -> step. Scan-compatible: the whole training run can be a single
    lax.scan over pair-index chunks with zero host round trips.

    negative_parallel=True shards the assembled batch ROWS over the combined
    (data, seq) mesh axes via sharding constraints, wiring the reserved
    ``seq`` axis (parallel/mesh.py) to LCE negative parallelism: at n
    negatives per pair the negative rows are n/(n+1) of the forward, so a
    dp x seq x tp mesh splits them dp*seq ways while parameters stay sharded
    only over ``model``.  Requires the batch row counts (B and B*n) to be
    divisible by dp*seq; only meaningful inside a mesh context whose ``seq``
    axis is > 1 (it is a no-op constraint otherwise).
    """

    default_corpus = corpus

    def _constrain_rows(batch):
        # single shared row-layout definition: parallel/mesh.constrain_rows
        from pacednegatives_tpu.parallel.mesh import constrain_rows

        return {k: constrain_rows(v) for k, v in batch.items()}

    def fused(state: TrainState, pair_idx: jax.Array, corpus=None):
        # corpus may be threaded in as a jit ARGUMENT (DeviceCorpus pytree
        # note) — the default capture keeps small-corpus call sites working.
        corpus = default_corpus if corpus is None else corpus
        difficulty = controller.difficulty(state.curriculum)
        key = jax.random.fold_in(state.key, state.step)
        if loss == "lce":
            batch = corpus.lce_batch(key, pair_idx, difficulty, n_neg_per_example)
        else:
            batch = corpus.pair_batch(pair_idx, difficulty)
        if negative_parallel:
            batch = _constrain_rows(batch)
        return step_fn(state, batch)

    return fused


# ---------------------------------------------------------------------------
# Bilevel per-example weights (StdWrapper / NewWrapper)
# ---------------------------------------------------------------------------


def make_meta_train_step(
    model_cfg: t5.T5Config,
    table: MetaWeightTable,
    tx: optax.GradientTransformation,
    meta_lr_schedule: Callable[[jax.Array], jax.Array],
    variant: str = "cheap",  # "cheap" (NewWrapper) | "std" (StdWrapper)
    rel_id: int = 3,
    nrel_id: int = 4,
):
    """step(state, batch, batch_idx) with per-example weight-table curriculum.

    cheap (reference NewWrapper, pairwrapper.py:219-284): frozen-model CE
    drives a closed-form weight update; main loss is unweighted.

    std (reference StdWrapper, pairwrapper.py:102-206): gradient flows
    through a virtual SGD update theta' = theta - lr * d/dtheta[weighted CE],
    then d/dv[weighted CE(theta') - sum(v)] updates v; the main loss is
    weighted by the updated v. In JAX the create_graph machinery
    (pairwrapper.py:69-74 update_params) is plain jax.grad composition.
    """

    def per_example(params, batch):
        pce, _ = _ce_and_first_logits(
            params, model_cfg, batch["pos_ids"], batch["pos_mask"],
            batch["pos_labels"],
        )
        nce, _ = _ce_and_first_logits(
            params, model_cfg, batch["neg_ids"], batch["neg_mask"],
            batch["neg_labels"],
        )
        return pce, nce

    def weighted(pce, nce, v):
        B = v.shape[0]
        return jnp.sum(pce * v) / B + jnp.sum(nce * v) / B

    def step(state: TrainState, batch: Batch, batch_idx: jax.Array):
        lr = meta_lr_schedule(state.step)
        v = table.lookup(state.curriculum, batch_idx)

        if variant == "cheap":
            pce0, nce0 = per_example(state.params, batch)
            raw = table.cheap_update(
                v, jax.lax.stop_gradient(pce0), jax.lax.stop_gradient(nce0), lr
            )
            curriculum = table.store(state.curriculum, batch_idx, raw)
            v_main = None  # unweighted main (pairwrapper.py:241-257)
        else:

            def outer(v_):
                grads = jax.grad(
                    lambda p: weighted(*per_example(p, batch), v_)
                )(state.params)
                params_virtual = jax.tree_util.tree_map(
                    lambda p, g: p - lr * g, state.params, grads
                )
                pce_v, nce_v = per_example(params_virtual, batch)
                return weighted(pce_v, nce_v, v_) - jnp.sum(v_)

            gv = jax.grad(outer)(v)
            raw = v - lr * gv
            curriculum = table.store(state.curriculum, batch_idx, raw)
            v_main = table.lookup(curriculum, batch_idx)

        def main_loss_fn(params):
            pce, nce = per_example(params, batch)
            if v_main is None:
                return jnp.mean(pce) + jnp.mean(nce), (pce, nce)
            w = jax.lax.stop_gradient(v_main)
            return (
                jnp.sum(pce * w) / w.shape[0] + jnp.sum(nce * w) / w.shape[0],
                (pce, nce),
            )

        (loss, (pce, nce)), grads = jax.value_and_grad(
            main_loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss": loss,
            "avg_weight": jnp.mean(table.lookup(curriculum, batch_idx)),
        }
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            curriculum=curriculum,
            step=state.step + 1,
            key=state.key,
        )
        return new_state, metrics

    return step
