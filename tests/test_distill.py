"""Distillation subsystem tests: miner, teacher scores, batcher, train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.data import HashTokenizer, TextCorpus, TokenizedStore
from pacednegatives_tpu.distill import (
    EnsembleMiner,
    TeacherBatcher,
    TeacherScores,
    make_distill_step,
    score_teachers,
)
from pacednegatives_tpu.distill.train import init_distill_state
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.train import make_optimizer


@pytest.fixture(scope="module")
def corpus():
    return TextCorpus.synthetic(num_docs=40, num_queries=6, seed=0)


@pytest.fixture(scope="module")
def miner(corpus):
    m = EnsembleMiner.build(corpus, budget=20)
    if not m.index.native:
        pytest.skip("native lexical library unavailable")
    return m


@pytest.fixture(scope="module")
def triples(corpus, miner):
    pairs = [(f"q{i}", f"d{i}") for i in range(6)]
    return miner.mine_triples(corpus, pairs, seed=0)


def test_miner_produces_valid_triples(corpus, triples):
    assert len(triples) == 6
    for t in triples:
        assert t["doc_id_b"] in corpus.doc_index
        assert t["doc_id_b"] != t["doc_id_a"]


def test_fused_ranking_reciprocal_rank_math(miner, corpus):
    ids, scores = miner.fused_ranking(corpus.query_texts[0])
    assert len(ids) > 0
    # descending fused scores; top score <= 1 (mean of 1/(rank+1) <= 1)
    assert np.all(np.diff(scores) <= 1e-12)
    assert scores[0] <= 1.0 + 1e-9


def test_teacher_scores_normalized_and_gt_channel(corpus, triples):
    ts = score_teachers(corpus, triples)
    assert ts.num_teachers == 6  # 5 lexical + ground truth
    # min-max normalized per query: values within [0, 1]
    for table in ts.scores.values():
        for docs in table.values():
            for v in docs.values():
                assert -1e-9 <= v <= 1 + 1e-9
    # ground-truth channel at key len(models)+1 == "6"
    gt = ts.scores["6"]
    t0 = triples[0]
    assert gt[t0["qid"]][t0["doc_id_a"]] == 1.0
    assert gt[t0["qid"]][t0["doc_id_b"]] == 0.0


def test_retrieval_variant_teacher_scoring(corpus, miner):
    from pacednegatives_tpu.distill.teacher import score_teachers_retrieval

    ts = score_teachers_retrieval(
        corpus, corpus.query_ids[:3], index=miner.index, k=10
    )
    assert ts.num_teachers == 5
    for table in ts.scores.values():
        assert set(table) <= set(corpus.query_ids[:3])
        for docs in table.values():
            assert 0 < len(docs) <= 10
            assert all(0.0 <= v <= 1.0 + 1e-9 for v in docs.values())


def test_teacher_lookup_defaults(corpus, triples):
    ts = score_teachers(corpus, triples)
    v = ts.lookup("unknown_q", "unknown_d", neg=False)
    np.testing.assert_allclose(v, 1.0)
    v = ts.lookup("unknown_q", "unknown_d", neg=True)
    np.testing.assert_allclose(v, 0.0)


def test_batcher_interleaves_and_save_load(tmp_path, corpus, triples):
    tok = HashTokenizer(vocab_size=256)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=24)
    ts = score_teachers(corpus, triples)
    p = str(tmp_path / "teacher.json")
    ts.save(p)
    ts2 = TeacherScores.load(p)

    b = TeacherBatcher(triples, corpus, store, ts2, batch_size=3)
    batch = b.get_batch(0)
    assert batch["ids"].shape[0] == 6
    assert batch["teachers"].shape == (6, 6)
    # labels alternate true/false
    assert batch["labels"][0, 0] == tok.true_id
    assert batch["labels"][1, 0] == tok.false_id
    # positives carry gt score 1, negatives 0 in the last channel
    np.testing.assert_allclose(batch["teachers"][0::2, -1], 1.0)
    np.testing.assert_allclose(batch["teachers"][1::2, -1], 0.0)


@pytest.mark.parametrize("objective", ["margin_mse", "ce"])
def test_distill_step_decreases_loss(corpus, triples, objective):
    tok = HashTokenizer(vocab_size=256)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=24)
    ts = score_teachers(corpus, triples)
    b = TeacherBatcher(triples, corpus, store, ts, batch_size=6)
    batch = {k: jnp.asarray(v) for k, v in b.get_batch(0).items()}

    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    tx = make_optimizer(lr=3e-3, total_steps=30)
    step = jax.jit(
        make_distill_step(cfg, tx, objective, rel_id=tok.true_id, nrel_id=tok.false_id)
    )
    state = init_distill_state(params, tx)
    losses = []
    for _ in range(15):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
