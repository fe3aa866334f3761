"""Model-in-the-loop negative selection: score a candidate pool with the
cross-encoder (no-grad) every step, then curriculum-sample the training
negatives from the MODEL-ordered candidates.

Reference parity anchor: ``adhocRestructure`` (reference util.py:9-18)
re-orders a query's negative pool by the model's own relevance scores — but
offline, once, on the host, with a frozen model. Here the same operation
runs ON-DEVICE INSIDE THE TRAIN STEP, so the difficulty axis tracks the
*current* model instead of a static BM25 ordering (the staleness the static
pools accumulate over a run is exactly what ANCE-style hard-negative mining
exists to fix). The reference cannot afford this: its step already pays 4
host-dispatched forwards (lceT5.py:131-157); scoring a 64-candidate pool
per query would multiply its step cost ~10x. A fused single-dispatch step
where the no-grad scoring pass rides the same compiled program makes it a
bounded, measurable increment instead.

Semantics per step (B pairs, C candidates, n trained negatives):

1. subsample C slots from each pair's static pool, evenly spaced over the
   retrieval-ordered pool (reference ``get_balanced_idx``, util.py:34-40) —
   the static order is only used to pick a REPRESENTATIVE candidate subset,
   not the training order;
2. score the C candidates with the cross-encoder, no-grad, in the model's
   compute dtype (bf16): ``P(true) - P(false)`` log-odds per candidate, the
   exact quantity monoT5 ranks by at eval time (distill/wrapper.py:34-38);
3. order candidates easiest -> hardest by that score (a LOW relevance score
   means the model already separates the negative from the positive — easy;
   a HIGH score means maximally confusable — hard);
4. draw n distinct positions from the same paced binomial PMF the static
   path uses (ops/sampling.py; reference dataloader.py:134-151), indexed
   into the model order instead of the retrieval order;
5. run the ordinary fused train step on the selected negatives.

The no-grad pass costs B*C forward rows against the train pass's
3x B*(1+n) forward-equivalents; at the flagship config (B=16, n=7, C=64)
that is ~2.7x the per-step FLOPs for ~9x the negatives *scored* per step —
the headline metric this framework is benched on (BASELINE.md north star).
The counting is honest: every one of the B*C candidates gets a full
cross-encoder relevance score each step, the same work the reference's
train-time scoring performs per negative, and the score is CONSUMED (it
decides what trains). docs/north_star.md carries the full accounting.

``metrics["neg_scored"]`` reports B*C + B*n (candidates + the trained
negatives' gradient-pass scores); ``neg_rank_static`` maps the selected
negatives back to their static-pool position for drift observability.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.monot5 import score_batch
from pacednegatives_tpu.ops.sampling import sample_pool_indices_batch
from pacednegatives_tpu.train.state import TrainState


def _row_constrain(v: jax.Array) -> jax.Array:
    """Shard leading (row) axis over the combined ("data", "seq") mesh axes
    (no-op outside a mesh with those axes — the make_fused_step convention;
    single shared definition in parallel/mesh.constrain_rows)."""
    from pacednegatives_tpu.parallel.mesh import constrain_rows

    return constrain_rows(v)


def balanced_slots(n_pool: int, c: int) -> np.ndarray:
    """C evenly-spaced slots over [0, n_pool): the candidate subsample keeps
    the static pool's difficulty span without biasing toward either end
    (reference get_balanced_idx, util.py:34-40)."""
    if not 0 < c <= n_pool:
        raise ValueError(f"candidates must be in (0, {n_pool}], got {c}")
    return np.unique(
        np.round(np.linspace(0, n_pool - 1, c)).astype(np.int32)
    )


def make_scored_pool_step(
    corpus,  # DeviceCorpus
    step_fn,
    controller,
    model_cfg: t5.T5Config,
    *,
    n_neg_per_example: int,
    candidates: int = 64,
    rel_id: int,
    nrel_id: int,
    # "compute": score in the model's compute dtype (bf16 on TPU).
    # "int8": dynamic W8A8 scoring (models/quant.py) — quantizes the live
    # params inside the step (pure jnp, ~1 ms of HBM traffic at t5-base)
    # and runs the candidate forward on the MXU's 2x int8 path; rank
    # fidelity pinned in tests/test_quant.py. The lever that clears the
    # >=10x north star (docs/north_star.md §2).
    # "int8_bf16": same, with the inter-layer residual stream in bf16
    # instead of fp32 — halves the scoring pass's activation HBM traffic.
    score_dtype: str = "compute",
    # shard the (B*C, L) candidate-scoring rows and the assembled train
    # batch over the combined ("data", "seq") mesh axes — the scoring pass
    # is C/(n+1) times the train forward's rows, so at scale it is the
    # part that most wants the negative-parallel axis (same convention as
    # train.step.make_fused_step)
    negative_parallel: bool = False,
    # upper bound on rows per scoring forward: B*C rows in one call OOMs
    # once B*C*L activations outgrow HBM (measured: 4096 L=188 rows at
    # t5-base kills a 16 GB v5e; 1024 fits). Chunks run under lax.map —
    # one compiled body, constant shapes, O(chunk) activation memory.
    score_chunk_rows: int = 1024,
    # length-bucketed scoring: ascending static encoder widths. The B*C
    # scoring rows are sorted by true prompt length, chunked, and each
    # chunk runs at the SMALLEST bucket width covering its max row length
    # (lax.switch over per-width forwards — static shapes, one compile per
    # width). Scores are EXACT — a masked T5 forward is padding-invariant,
    # so a row scored at width 96 produces the same relevance score it
    # would at the full width; the bucket only drops pad FLOPs. Requires a
    # front-compacted corpus (DeviceCorpus.packed=True) so a [:, :W] slice
    # keeps every real token; the full width is appended automatically.
    # Win scales with the corpus's true-length distribution vs its padded
    # max (MS MARCO passages: mean ~70 prompt tokens vs a 188 budget; the
    # reference pads every row to the budget, lceT5.py:40-53). Smaller
    # score_chunk_rows => finer length granularity => bigger win.
    score_buckets: tuple = (),
):
    """Build fused(state, pair_idx[, corpus]) -> (state, metrics) with
    model-scored candidate pools (see module docstring).

    Drop-in for train.step.make_fused_step(loss="lce"): same signature,
    same scan-compatibility (difficulty/sampling/scoring/step all live in
    one jittable program with zero host round trips).
    """
    n = n_neg_per_example
    if candidates < n:
        raise ValueError(
            f"candidates ({candidates}) must be >= n_neg_per_example ({n})"
        )
    if score_dtype not in ("compute", "int8", "int8_bf16"):
        raise ValueError(
            f"score_dtype must be 'compute', 'int8' or 'int8_bf16', "
            f"got {score_dtype!r}"
        )
    default_corpus = corpus
    slots_np = balanced_slots(int(corpus.n_neg), candidates)
    C = int(slots_np.shape[0])
    buckets = tuple(sorted({int(b) for b in score_buckets}))
    if buckets and buckets[0] <= 0:
        raise ValueError(f"score_buckets must be positive, got {buckets}")

    def fused(state: TrainState, pair_idx: jax.Array, corpus=None):
        corpus = default_corpus if corpus is None else corpus
        B = pair_idx.shape[0]
        difficulty = controller.difficulty(state.curriculum)
        key = jax.random.fold_in(state.key, state.step)

        q = corpus.query_rows[pair_idx]
        pos_d = corpus.pos_rows[pair_idx]
        cand_d = corpus.pools[pair_idx][:, jnp.asarray(slots_np)]  # (B, C)

        # --- no-grad candidate scoring (the lever): a fused forward over
        # (B*C, L) rows, chunked to score_chunk_rows rows per call (lax.map
        # keeps it one compiled body). stop_gradient is structural (scores
        # only pick integer indices) but keeps the intent explicit.
        ids, mask = corpus.assemble(jnp.repeat(q, C), cand_d.reshape(-1))
        if score_dtype in ("int8", "int8_bf16"):
            from pacednegatives_tpu.models.quant import (
                quantize_scoring_params,
                score_batch_int8,
            )

            sd = jnp.bfloat16 if score_dtype == "int8_bf16" else jnp.float32
            # quantize the live params ONCE per step, outside the chunk loop
            qp = quantize_scoring_params(state.params, model_cfg)
            score_fn = lambda i, m: score_batch_int8(
                qp, model_cfg, i, m, rel_id=rel_id, nrel_id=nrel_id,
                stream_dtype=sd)
        else:
            score_fn = lambda i, m: score_batch(
                state.params, model_cfg, i, m, rel_id=rel_id, nrel_id=nrel_id)

        rows = B * C
        chunk = min(int(score_chunk_rows), rows)
        while rows % chunk:  # constant chunk shape => one compile
            chunk -= 1

        L = ids.shape[1]
        # bucket widths that matter: strictly below L, plus L itself (a
        # chunk whose max length exceeds every configured bucket runs at
        # the full width — correctness never depends on the bucket list)
        widths = tuple(b for b in buckets if b < L) + (L,)
        use_buckets = len(widths) > 1
        if use_buckets:
            if not corpus.packed:
                raise ValueError(
                    "score_buckets requires a front-compacted corpus "
                    "(DeviceCorpus.build(..., packed=True)): the segment "
                    "layout interleaves pads, so a [:, :W] slice would "
                    "drop real tokens"
                )
            # sort scoring rows by true length so consecutive chunks hold
            # similar lengths and short chunks get narrow widths
            lengths = mask.sum(axis=1)
            perm = jnp.argsort(lengths)
            ids, mask = ids[perm], mask[perm]
            widths_arr = jnp.asarray(widths, jnp.int32)

        def score_rows(i, m):
            if not use_buckets:
                if negative_parallel:
                    i, m = _row_constrain(i), _row_constrain(m)
                return score_fn(i, m)
            wmax = m.sum(axis=1).max().astype(jnp.int32)
            bidx = jnp.searchsorted(widths_arr, wmax)  # first width >= wmax

            def at_width(W):
                def branch(ii, mm):
                    ii, mm = ii[:, :W], mm[:, :W]
                    if negative_parallel:
                        ii, mm = _row_constrain(ii), _row_constrain(mm)
                    return score_fn(ii, mm)
                return branch

            return jax.lax.switch(bidx, [at_width(W) for W in widths], i, m)

        if chunk == rows:
            raw = score_rows(ids, mask)
        else:
            raw = jax.lax.map(lambda im: score_rows(*im), (
                ids.reshape(rows // chunk, chunk, -1),
                mask.reshape(rows // chunk, chunk, -1),
            )).reshape(-1)
        if use_buckets:
            # undo the length sort so scores land back in (B, C) row order
            raw = jnp.zeros_like(raw).at[perm].set(raw)
        scores = jax.lax.stop_gradient(raw).reshape(B, C)

        # easiest (lowest relevance) -> hardest (highest), per pair
        order = jnp.argsort(scores, axis=1)  # (B, C)

        # paced binomial over MODEL-ordered positions (same PMF family as
        # the static path, so the curriculum controllers are unchanged)
        sel = sample_pool_indices_batch(
            key, C, jnp.broadcast_to(difficulty, (B,)), n
        )  # (B, n) positions into the model order
        picked = jnp.take_along_axis(order, sel, axis=1)  # (B, n) cand cols
        neg_d = jnp.take_along_axis(cand_d, picked, axis=1)  # (B, n) doc rows

        pos_ids, pos_mask = corpus.assemble(q, pos_d)
        neg_ids, neg_mask = corpus.assemble(
            jnp.repeat(q, n), neg_d.reshape(-1)
        )
        if negative_parallel:
            pos_ids, pos_mask = _row_constrain(pos_ids), _row_constrain(pos_mask)
            neg_ids, neg_mask = _row_constrain(neg_ids), _row_constrain(neg_mask)
        static_pos = jnp.asarray(slots_np, jnp.float32)[picked.reshape(-1)]
        batch = {
            "pos_ids": pos_ids,
            "pos_mask": pos_mask,
            "pos_labels": corpus.labels(B, True),
            "neg_ids": neg_ids,
            "neg_mask": neg_mask,
            "neg_labels": corpus.labels(B * n, False),
            # model-order position of the drawn negatives (0 = easiest for
            # the CURRENT model) — the pacing observability signal
            "neg_rank": (sel.astype(jnp.float32) / max(C - 1, 1)).reshape(-1),
        }
        new_state, metrics = step_fn(state, batch)
        metrics = {
            **metrics,
            # candidates scored this step + the trained negatives' scores
            # produced by the gradient pass itself (B*n)
            "neg_scored": jnp.float32(B * C + B * n),
            # where the model-selected negatives sit in the STATIC retrieval
            # order, normalized — divergence from neg_rank measures how far
            # the current model's difficulty judgment has drifted from BM25
            "neg_rank_static": jnp.mean(
                static_pos / max(corpus.n_neg - 1, 1)
            ),
            "pool_score_spread": jnp.mean(
                scores.max(axis=1) - scores.min(axis=1)
            ),
        }
        return new_state, metrics

    return fused
