"""SPLADE learned-sparse retrieval: vocab-space activations, the quantized
impact index, and end-to-end pool building (compute_all_splade parity —
reference utilities/compute_all_splade.py:28-30)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.index.sparse import SparseIndex
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.models.splade import (
    encode_corpus_sparse,
    splade_activations,
    splade_topk,
)


@pytest.fixture(scope="module")
def model():
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    return params, cfg


def _ids(shape, seed=0, vocab=256):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, vocab, size=shape).astype(np.int32)
    mask = np.ones(shape, np.int32)
    mask[:, shape[1] // 2:] = 0  # half the positions padded
    ids[mask == 0] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def test_activations_nonneg_and_chunk_invariant(model):
    params, cfg = model
    ids, mask = _ids((4, 16))
    a_full = splade_activations(params, cfg, ids, mask, pos_chunk=16)
    a_chunk = splade_activations(params, cfg, ids, mask, pos_chunk=4)
    assert a_full.shape == (4, 256)
    assert float(jnp.min(a_full)) >= 0.0
    np.testing.assert_allclose(
        np.asarray(a_full), np.asarray(a_chunk), rtol=1e-5, atol=1e-6
    )
    # ReLU gates some terms fully off even at random init (true sparsity
    # comes from training + top-k sparsification, not init)
    assert float(jnp.mean(a_full == 0.0)) > 0.01


def test_masked_positions_do_not_contribute(model):
    params, cfg = model
    ids, mask = _ids((2, 12), seed=1)
    a1 = splade_activations(params, cfg, ids, mask)
    # change PADDED token ids -> activations must not move
    ids2 = np.asarray(ids).copy()
    ids2[np.asarray(mask) == 0] = 0  # already 0; perturb mask-consistent pad
    a2 = splade_activations(params, cfg, jnp.asarray(ids2), mask)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)


def test_topk_matches_dense_activations(model):
    params, cfg = model
    ids, mask = _ids((3, 10), seed=2)
    act = np.asarray(splade_activations(params, cfg, ids, mask))
    w, t = splade_topk(params, cfg, ids, mask, k=8)
    w, t = np.asarray(w), np.asarray(t)
    for b in range(3):
        np.testing.assert_allclose(
            np.sort(w[b])[::-1], np.sort(act[b])[::-1][:8], rtol=1e-6
        )
        assert len(set(t[b].tolist())) == 8  # distinct terms


def test_sparse_index_exact_matches_bruteforce():
    rng = np.random.default_rng(3)
    N, V, k = 40, 64, 8
    t = np.stack([rng.choice(V, size=k, replace=False) for _ in range(N)])
    w = rng.random((N, k)).astype(np.float32) + 0.1
    ix = SparseIndex.build(t, w, num_terms=V, quantize=False)
    assert ix.nnz == N * k

    dense = np.zeros((N, V), np.float32)
    for i in range(N):
        dense[i, t[i]] = w[i]

    qt = rng.choice(V, size=k, replace=False)
    qw = rng.random(k).astype(np.float32)
    ids, scores = ix.search(qt, qw, k=N)
    qdense = np.zeros(V, np.float32)
    qdense[qt] = qw
    brute = dense @ qdense
    order = sorted(np.nonzero(brute > 0)[0], key=lambda d: (-brute[d], d))
    np.testing.assert_array_equal(ids, order)
    np.testing.assert_allclose(scores, brute[np.asarray(order)], rtol=1e-6)


def test_sparse_index_quantized_close_to_exact():
    rng = np.random.default_rng(4)
    N, V, k = 60, 128, 12
    t = np.stack([rng.choice(V, size=k, replace=False) for _ in range(N)])
    w = rng.random((N, k)).astype(np.float32) + 0.05
    exact = SparseIndex.build(t, w, num_terms=V, quantize=False)
    quant = SparseIndex.build(t, w, num_terms=V, quantize=True)
    assert quant.post_imps.dtype == np.uint8

    qt = rng.choice(V, size=k, replace=False)
    qw = rng.random(k).astype(np.float32)
    ids_e, sc_e = exact.search(qt, qw, k=10)
    ids_q, sc_q = quant.search(qt, qw, k=10)
    # 8-bit impacts: scores within ~1% relative, top set largely overlaps
    overlap = len(set(ids_e.tolist()) & set(ids_q.tolist()))
    assert overlap >= 8
    common = [d for d in ids_e if d in set(ids_q.tolist())]
    e = {d: s for d, s in zip(ids_e, sc_e)}
    q = {d: s for d, s in zip(ids_q, sc_q)}
    for d in common:
        np.testing.assert_allclose(e[d], q[d], rtol=0.05)


def test_encode_corpus_sparse_batches(model):
    params, cfg = model
    rng = np.random.default_rng(5)
    toks = rng.integers(2, 256, size=(10, 8)).astype(np.int32)
    mask = np.ones_like(toks)
    w, t = encode_corpus_sparse(
        params, cfg, jnp.asarray(toks), jnp.asarray(mask), k=16, batch_size=4
    )
    assert w.shape == (10, 16) and t.shape == (10, 16)
    w1, t1 = splade_topk(params, cfg, jnp.asarray(toks), jnp.asarray(mask), k=16)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w1), rtol=1e-5, atol=1e-6)


def test_build_pools_splade_method(tmp_path):
    """End-to-end: trained tiny run -> SPLADE pools over a quantized impact
    index (the reference's compute_all_splade workflow)."""
    from tests.test_cli import TINY

    from pacednegatives_tpu.cli.build_pools import main
    from pacednegatives_tpu.data import TextCorpus, load_triples
    from pacednegatives_tpu.train.runner import RunConfig, run

    cfg = RunConfig(curriculum="interp", out_dir=str(tmp_path / "run"), **TINY)
    run(cfg)
    corpus = TextCorpus.synthetic(num_docs=32, num_queries=8, seed=42)
    docs, queries = str(tmp_path / "docs.tsv"), str(tmp_path / "queries.tsv")
    with open(docs, "w") as f:
        for i, t in zip(corpus.doc_ids, corpus.doc_texts):
            f.write(f"{i}\t{t}\n")
    with open(queries, "w") as f:
        for i, t in zip(corpus.query_ids, corpus.query_texts):
            f.write(f"{i}\t{t}\n")
    out = str(tmp_path / "pools.jsonl")
    main(["--docs", docs, "--queries", queries, "--out", out,
          "--cutoff", "8", "--method", "splade", "--run", str(tmp_path / "run"),
          "--splade_terms", "32", "--encode_batch", "8"])
    recs = load_triples(out)
    assert len(recs) == 8
    assert all(len(r["doc_id_b"]) == 8 for r in recs)
