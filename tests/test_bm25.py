"""Native lexical index tests: BM25 vs the NumPy oracle, DPH, query
expansion, pair scoring."""

import numpy as np
import pytest

from pacednegatives_tpu.data import TextCorpus
from pacednegatives_tpu.index.bm25 import (
    MODEL_BM25,
    MODEL_DPH,
    QE_BO1,
    QE_KL,
    QE_NONE,
    QE_RM3,
    LexicalIndex,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over sleeping hounds",
    "stock markets rallied as tech shares surged today",
    "the fox is a small omnivorous mammal",
    "dogs are loyal companions and love to play fetch",
    "quarterly earnings beat expectations lifting markets",
]


@pytest.fixture(scope="module")
def native_index():
    ix = LexicalIndex.build(DOCS)
    if not ix.native:
        pytest.skip("native lexical library failed to build")
    return ix


def test_native_builds_and_counts(native_index):
    assert native_index.num_docs == 6


def test_bm25_native_matches_python_oracle(native_index):
    py = LexicalIndex.build(DOCS, use_native=False)
    for q in ["fox", "fox dog", "markets earnings", "quick lazy dog"]:
        ni, ns = native_index.search(q, k=6)
        pi, ps = py.search(q, k=6)
        np.testing.assert_array_equal(ni, pi)
        np.testing.assert_allclose(ns, ps, rtol=1e-9)


def test_bm25_ranks_fox_docs_first(native_index):
    ids, scores = native_index.search("fox", k=6)
    assert set(ids[:3]) == {0, 1, 3}
    assert np.all(np.diff(scores) <= 1e-12)


def test_dph_runs_and_prefers_topical(native_index):
    ids, scores = native_index.search("markets", k=6, model=MODEL_DPH)
    assert ids[0] in (2, 5)
    assert len(ids) >= 2


@pytest.mark.parametrize("qe", [QE_BO1, QE_KL, QE_RM3])
def test_query_expansion_recalls_related_doc(native_index, qe):
    # 'quick brown' only matches doc 0 directly; expansion over doc 0's terms
    # (fox, dog, ...) should pull in docs 1/3/4.
    base_ids, _ = native_index.search("quick brown", k=6, qe=QE_NONE)
    exp_ids, _ = native_index.search(
        "quick brown", k=6, qe=qe, fb_docs=2, fb_terms=10
    )
    assert len(exp_ids) > len(base_ids)


def test_score_pair_consistent_with_search(native_index):
    ids, scores = native_index.search("fox dog", k=6)
    for i, d in enumerate(ids):
        got = native_index.score_pair("fox dog", int(d))
        np.testing.assert_allclose(got, scores[i], rtol=1e-9)
    # non-matching doc scores 0
    assert native_index.score_pair("fox", 2) == 0.0


def test_pool_building_parity_shape():
    """compute_all_bm25-equivalent: top-k then reverse = easiest-first pool
    (reference compute_all_bm25.py:42-44)."""
    corpus = TextCorpus.synthetic(num_docs=64, num_queries=4, seed=0)
    ix = LexicalIndex.build(corpus.doc_texts)
    pools = []
    for q in corpus.query_texts:
        ids, _ = ix.search(q, k=16)
        pools.append(ids[::-1])  # easiest first
    assert all(len(p) > 0 for p in pools)
    # hardest (last) is the rank-1 BM25 hit
    ids0, _ = ix.search(corpus.query_texts[0], k=16)
    assert pools[0][-1] == ids0[0]
