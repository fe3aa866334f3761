"""Eval tests: golden metric values, experiment comparison, reranker flow."""

import numpy as np
import pytest

import jax

from pacednegatives_tpu.data import HashTokenizer, TextCorpus, TokenizedStore
from pacednegatives_tpu.eval import (
    Reranker,
    average_precision,
    evaluate_run,
    experiment,
    ndcg_at_k,
    reciprocal_rank,
    recall_at_k,
)
from pacednegatives_tpu.models import T5Config, init_params


QRELS = {"q1": {"d1": 1, "d3": 2}, "q2": {"d2": 1}}


def test_reciprocal_rank_golden():
    assert reciprocal_rank(["d9", "d1", "d2"], QRELS["q1"]) == 0.5
    assert reciprocal_rank(["d9", "d8"], QRELS["q1"]) == 0.0
    assert reciprocal_rank(["d3"], QRELS["q1"]) == 1.0


def test_average_precision_golden():
    # relevant at ranks 1 and 3, 2 total relevant: (1/1 + 2/3)/2
    got = average_precision(["d1", "dx", "d3"], QRELS["q1"])
    assert abs(got - (1.0 + 2 / 3) / 2) < 1e-9
    # missing one relevant divides by TOTAL relevant
    got = average_precision(["d1"], QRELS["q1"])
    assert abs(got - 0.5) < 1e-9


def test_ndcg_golden():
    # ranked: rel 2 at rank 1, rel 1 at rank 2 == ideal -> 1.0
    assert abs(ndcg_at_k(["d3", "d1"], QRELS["q1"], 10) - 1.0) < 1e-9
    # swapped order, LINEAR gain (trec_eval): dcg = 1/log2(2) + 2/log2(3)
    dcg = 1.0 + 2 / np.log2(3)
    idcg = 2.0 + 1 / np.log2(3)
    got = ndcg_at_k(["d1", "d3"], QRELS["q1"], 10)
    assert abs(got - dcg / idcg) < 1e-9


def test_graded_relevance_metrics():
    from pacednegatives_tpu.eval.metrics import _parse

    qrels = {"d1": 1, "d3": 2}
    # map_rel2: only d3 counts as relevant
    fn = _parse("map_rel2")
    assert fn(["d3", "d1"], qrels) == 1.0
    assert fn(["d1", "d3"], qrels) == 0.5
    # P_rel2_2
    fn = _parse("P_rel2_2")
    assert fn(["d3", "d1"], qrels) == 0.5
    fn = _parse("P_1")  # plain precision still parses
    assert fn(["d1"], qrels) == 1.0


def test_recall_and_run_eval():
    assert recall_at_k(["d1", "dx"], QRELS["q1"], 2) == 0.5
    run = {"q1": ["d3", "d1"], "q2": ["dx", "d2"], "q_no_qrels": ["d1"]}
    res = evaluate_run(run, QRELS, ["recip_rank", "map", "ndcg_cut_10"])
    assert set(res["map"]) == {"q1", "q2"}  # unjudged query skipped
    assert res["recip_rank"]["q2"] == 0.5


def test_experiment_paired_comparison():
    runs = {
        "baseline": {"q1": ["dx", "d1"], "q2": ["dx", "d2"]},
        "better": {"q1": ["d3", "d1"], "q2": ["d2"]},
    }
    rows = experiment(runs, QRELS, metrics=("recip_rank",), baseline="baseline")
    by = {r["name"]: r for r in rows}
    assert by["better"]["recip_rank"] > by["baseline"]["recip_rank"]
    assert 0.0 <= by["better"]["recip_rank_pvalue"] <= 1.0
    assert "recip_rank_pvalue" not in by["baseline"]


def test_reranker_orders_by_model_score():
    corpus = TextCorpus.synthetic(num_docs=24, num_queries=4, seed=0)
    tok = HashTokenizer(vocab_size=256)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=24)
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    rr = Reranker(
        params, cfg, store, corpus, rel_id=tok.true_id, nrel_id=tok.false_id,
        batch_size=8,
    )
    run = {"q0": [f"d{i}" for i in range(10)], "q1": [f"d{i}" for i in range(5, 17)]}
    out = rr.rerank(run)
    assert set(out["q0"]) == set(run["q0"])
    assert len(out["q1"]) == 12
    # scores actually determine the order
    q_rows = np.full(10, corpus.query_index["q0"])
    d_rows = np.array([corpus.doc_index[d] for d in run["q0"]])
    scores = rr.score_pairs(q_rows, d_rows)
    want = [run["q0"][i] for i in np.argsort(-scores, kind="stable")]
    assert out["q0"] == want


def test_reranker_depth_and_ragged_batches():
    corpus = TextCorpus.synthetic(num_docs=16, num_queries=2, seed=0)
    tok = HashTokenizer(vocab_size=256)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=24)
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(1), cfg)
    rr = Reranker(
        params, cfg, store, corpus, rel_id=tok.true_id, nrel_id=tok.false_id,
        batch_size=64,  # bigger than the workload: exercises padding path
    )
    out = rr.rerank({"q0": [f"d{i}" for i in range(7)]}, depth=3)
    assert len(out["q0"]) == 3


def test_trec_run_roundtrip(tmp_path):
    from pacednegatives_tpu.eval import read_trec_run, write_trec_run

    run = {"q1": ["d3", "d1", "d2"], "q2": ["d9"]}
    scores = {"q1": [2.5, 1.0, 0.5], "q2": [7.0]}
    p = str(tmp_path / "a.run")
    write_trec_run(p, run, tag="sys1", scores=scores)
    got_run, got_scores = read_trec_run(p)
    assert got_run == run
    assert got_scores["q1"] == [2.5, 1.0, 0.5]
    # rank-preserving pseudo-scores when none given
    p2 = str(tmp_path / "b.run")
    write_trec_run(p2, run)
    got_run2, _ = read_trec_run(p2)
    assert got_run2 == run
