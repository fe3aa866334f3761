"""int8 (W8A8) rank-fidelity probe at the REAL configuration.

tests/test_quant.py pins the Spearman/top-k contract on tiny synthetic
shapes; this probe measures it on hardware at the flagship config the
north-star claim rides on (docs/north_star.md §2): t5-base, 32k vocab,
L=188 prompts, C=256 candidates per query — scored once in bf16
(models/monot5.score_batch) and once through the W8A8 dynamic-quant
forward (models/quant.score_batch_int8), on the SAME batch with the SAME
params. The params are first advanced by a short fused training run
(identical program shapes to bench.py's fused phase, so the persistent
compile cache applies) — rank fidelity on random-init activations is not
representative of a live scoring pass.

What the scored-pool selector consumes is the RANKING (train/scored_pool.py
orders candidates by score and indexes the paced binomial into that
order), so the contract is rank-level:
  - spearman_mean / spearman_min : per-query Spearman rho, mean and worst
  - top8_overlap / top32_overlap : |top-k(bf16) ∩ top-k(int8)| / k
  - pair_flip_rate               : fraction of candidate pairs whose order
                                   disagrees (all C*(C-1)/2 pairs/query)
  - mean_abs_delta               : |Δ log P(true|{true,false})|, absolute

Prints ONE JSON line (queue contract: scripts/tpu_experiment_queue_r5.sh
wraps it with an "exp" key and persists to docs/experiments_r5.jsonl).

Candidate construction: rank fidelity is only meaningful where the bf16
scores have real spread. A random (q, d) candidate set on the synthetic
corpus is near-uniformly irrelevant — after a short training run the bf16
spread was measured at 0.0038 log-odds, so every rank metric was
noise-vs-noise (the r5 queue's first probe record). Candidates are instead
a relevance MIXTURE per query: the planted on-topic docs (TextCorpus.
synthetic puts query q's topic words in docs with row % num_queries == q),
plus random off-topic fill — the regime a live scored-pool pass actually
discriminates in. `norm_delta` (= mean |Δscore| / mean bf16 spread) is the
scale-free headline: quant error as a fraction of the signal it must not
drown.

Env: PROBE_BATCH (16), PROBE_CANDIDATES (256), PROBE_TRAIN_STEPS (100),
plus the BENCH_* step-config knobs bench.build/bench_fused honor.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (configures the persistent compile cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    B = int(os.environ.get("PROBE_BATCH", "16"))
    C = int(os.environ.get("PROBE_CANDIDATES", "256"))
    train_steps = int(os.environ.get("PROBE_TRAIN_STEPS", "100"))
    n = int(os.environ.get("BENCH_NEGS", "7"))

    log = lambda m: print(f"[probe] {m}", file=sys.stderr, flush=True)
    t_all = time.perf_counter()
    cfg, tok, corpus, store, triples, dc, params = bench.build(
        os.environ.get("BENCH_MODEL", "base"))

    # --- short fused training run: same construction as bench.bench_fused
    # (chunk=10 matches the default BENCH_STEPS=20 bench program, so a
    # cache-warm box pays no compile here)
    from pacednegatives_tpu.curriculum import EtaController
    from pacednegatives_tpu.train import (
        init_train_state,
        make_fused_step,
        make_optimizer,
        make_train_step,
    )

    ctrl = EtaController(eta0=0.5, meta_lr=1e-3, warmup_steps=10,
                         total_steps=train_steps * 3,
                         ce_scale=2.0 * float(np.log(cfg.vocab_size)))
    tx = make_optimizer(lr=1e-3, total_steps=train_steps * 3,
                        moments=os.environ.get("BENCH_OPT_MOMENTS", "fp32"))
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=n,
        rel_id=tok.true_id, nrel_id=tok.false_id,
        microbatches=int(os.environ.get("BENCH_MICROBATCH", "1")),
    )
    fused = make_fused_step(dc, step, ctrl, loss="lce", n_neg_per_example=n)
    state = init_train_state(params, tx, ctrl.init())
    chunk_jit = jax.jit(
        lambda s, idx: jax.lax.scan(fused, s, idx), donate_argnums=0)
    rng = np.random.default_rng(0)
    chunk = 10
    t0 = time.perf_counter()
    for _ in range(max(train_steps // chunk, 1)):
        idx = jnp.asarray(rng.integers(
            0, dc.num_pairs, size=(chunk, B)).astype(np.int32))
        state, m = chunk_jit(state, idx)
    float(np.asarray(m["loss"])[-1])  # fetch-sync (axon pitfall)
    log(f"trained {train_steps} steps in {time.perf_counter() - t0:.0f}s")

    # --- one candidate batch at the scored-pool shapes: B queries x C doc
    # rows, built as a relevance MIXTURE (docstring: random candidates are
    # uniformly irrelevant and give the rank metrics nothing to rank). The
    # synthetic corpus plants query q's topic words in docs whose
    # row % num_queries == q (data/corpus.py TextCorpus.synthetic).
    nq = dc.q_tokens.shape[0]
    nd = dc.d_tokens.shape[0]
    q_idx = rng.integers(0, nq, size=B)
    cand = np.empty((B, C), np.int32)
    for b, q in enumerate(q_idx):
        on_topic = np.arange(q, nd, nq, dtype=np.int64)  # planted relevants
        fill = rng.integers(0, nd, size=C)
        row = np.concatenate([on_topic, fill])[:C]
        rng.shuffle(row)
        cand[b] = row.astype(np.int32)
    q_rows = jnp.asarray(np.repeat(q_idx, C).astype(np.int32))
    d_rows = jnp.asarray(cand.reshape(-1))

    from pacednegatives_tpu.models.monot5 import score_batch
    from pacednegatives_tpu.models.quant import (
        quantize_scoring_params,
        score_batch_int8,
    )

    @jax.jit
    def score_bf16(params, q_rows, d_rows):
        ids, mask = dc.assemble(q_rows, d_rows)
        return score_batch(params, cfg, ids, mask,
                           rel_id=tok.true_id, nrel_id=tok.false_id)

    @jax.jit
    def score_int8(params, q_rows, d_rows):
        ids, mask = dc.assemble(q_rows, d_rows)
        qp = quantize_scoring_params(params, cfg)
        return score_batch_int8(qp, cfg, ids, mask,
                                rel_id=tok.true_id, nrel_id=tok.false_id)

    @jax.jit
    def score_int8_bf16(params, q_rows, d_rows):
        ids, mask = dc.assemble(q_rows, d_rows)
        qp = quantize_scoring_params(params, cfg)
        return score_batch_int8(qp, cfg, ids, mask,
                                rel_id=tok.true_id, nrel_id=tok.false_id,
                                stream_dtype=jnp.bfloat16)

    # Score in fixed-size row chunks: B*C rows of L=188 through t5-base in
    # one call OOMs a 16 GB chip (attention scores alone are ~20 GB at
    # 4096 rows); constant chunk shape = one compile, host-level loop.
    rows = B * C
    chunk_rows = min(int(os.environ.get("PROBE_CHUNK", "512")), rows)
    while rows % chunk_rows:
        chunk_rows -= 1

    def scored(fn, name):
        t0 = time.perf_counter()
        out = np.concatenate([
            np.asarray(fn(state.params, q_rows[i:i + chunk_rows],
                          d_rows[i:i + chunk_rows]), np.float64)
            for i in range(0, rows, chunk_rows)
        ])
        log(f"{name} scoring (incl compile): {time.perf_counter() - t0:.0f}s")
        return out.reshape(B, C)

    s_bf = scored(score_bf16, "bf16")
    s_i8 = scored(score_int8, "int8")
    s_i8b = scored(score_int8_bf16, "int8_bf16stream")

    # --- rank-level fidelity, per query row
    import scipy.stats

    def fidelity(s_q):
        rho = np.array([
            scipy.stats.spearmanr(s_bf[b], s_q[b]).statistic
            for b in range(B)
        ])

        def topk_overlap(k):
            k = min(k, C)
            o = [
                len(np.intersect1d(np.argsort(s_bf[b])[-k:],
                                   np.argsort(s_q[b])[-k:])) / k
                for b in range(B)
            ]
            return float(np.mean(o))

        # pairwise order agreement over all C*(C-1)/2 pairs per query
        iu = np.triu_indices(C, k=1)
        flips = np.array([
            np.mean(np.sign(s_bf[b][:, None] - s_bf[b][None, :])[iu]
                    != np.sign(s_q[b][:, None] - s_q[b][None, :])[iu])
            for b in range(B)
        ])
        return rho, topk_overlap, flips

    rho, topk_overlap, flips = fidelity(s_i8)
    rho_b, topk_b, flips_b = fidelity(s_i8b)

    rec = {
        "probe": "int8_fidelity",
        "model": os.environ.get("BENCH_MODEL", "base"),
        "prompt_len": int(dc.prefix.shape[0] + dc.q_tokens.shape[1]
                          + dc.mid.shape[0] + dc.d_tokens.shape[1]
                          + dc.suffix.shape[0]),
        "batch": B,
        "candidates": C,
        "train_steps": train_steps,
        "spearman_mean": round(float(rho.mean()), 4),
        "spearman_min": round(float(rho.min()), 4),
        "top8_overlap": round(topk_overlap(8), 4),
        "top32_overlap": round(topk_overlap(32), 4),
        "pair_flip_rate": round(float(flips.mean()), 5),
        "mean_abs_delta": round(float(np.abs(s_bf - s_i8).mean()), 5),
        "bf16_score_spread": round(float((s_bf.max(1) - s_bf.min(1)).mean()), 4),
        # quant error as a fraction of the signal (scale-free headline)
        "norm_delta": round(
            float(np.abs(s_bf - s_i8).mean()
                  / max((s_bf.max(1) - s_bf.min(1)).mean(), 1e-9)), 5),
        # the bf16-residual-stream variant (stream_dtype=bf16): same
        # contract vs the same bf16 reference scores
        "bf16stream_spearman_mean": round(float(rho_b.mean()), 4),
        "bf16stream_spearman_min": round(float(rho_b.min()), 4),
        "bf16stream_top8_overlap": round(topk_b(8), 4),
        "bf16stream_top32_overlap": round(topk_b(32), 4),
        "bf16stream_pair_flip_rate": round(float(flips_b.mean()), 5),
        "bf16stream_mean_abs_delta": round(float(np.abs(s_bf - s_i8b).mean()),
                                           5),
        "bf16stream_norm_delta": round(
            float(np.abs(s_bf - s_i8b).mean()
                  / max((s_bf.max(1) - s_bf.min(1)).mean(), 1e-9)), 5),
        "wall_s": round(time.perf_counter() - t_all, 1),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
